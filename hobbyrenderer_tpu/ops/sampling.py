"""Monte Carlo sampling helpers: ONB, cosine hemisphere, GGX-VNDF, light sampling.

Reference: src/shaders/PathTracer.hlsl:272-307 (GGX-VNDF specular / cosine diffuse
importance sampling) + CommonLighting.hlsli:716-908 (NEE with cone-sampled soft sun).
Standard published formulas (Heitz 2018 VNDF; Duff et al. 2017 ONB), fresh jnp."""

from __future__ import annotations

import jax.numpy as jnp

from hobbyrenderer_tpu.utils import math as hm


def orthonormal_basis(n):
    """Branchless ONB (Duff et al. 2017). n: (..., 3) unit. Returns (t, b)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], -1)
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], -1)
    return t, bt


def to_world(n, v_local):
    t, b = orthonormal_basis(n)
    return (t * v_local[..., 0:1] + b * v_local[..., 1:2] + n * v_local[..., 2:3])


def to_local(n, v_world):
    t, b = orthonormal_basis(n)
    return jnp.stack([jnp.sum(v_world * t, -1), jnp.sum(v_world * b, -1),
                      jnp.sum(v_world * n, -1)], -1)


def cosine_sample_hemisphere(u1, u2):
    """Local-space cosine-weighted direction. pdf = cos/pi."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    return jnp.stack([x, y, z], -1)


def sample_ggx_vndf(v_local, alpha, u1, u2):
    """Heitz 2018 visible-NDF sampling of the GGX half-vector (local space, n=+z)."""
    vh = hm.normalize(jnp.stack([alpha * v_local[..., 0], alpha * v_local[..., 1],
                                 v_local[..., 2]], -1), xp=jnp)
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12))
    t1 = jnp.where(lensq[..., None] > 1e-9,
                   jnp.stack([-vh[..., 1], vh[..., 0], jnp.zeros_like(inv)], -1) * inv[..., None],
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape))
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    h = hm.normalize(jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                                jnp.maximum(nh[..., 2], 0.0)], -1), xp=jnp)
    return h


def smith_g1(n_dot_x, alpha):
    a2 = alpha * alpha
    return 2.0 * n_dot_x / jnp.maximum(
        n_dot_x + jnp.sqrt(a2 + (1.0 - a2) * n_dot_x * n_dot_x), 1e-8)


def smith_g2_over_g1(n_dot_v, n_dot_l, alpha):
    """G2/G1 for the VNDF estimator weight (separable Smith)."""
    g1v = smith_g1(n_dot_v, alpha)
    g1l = smith_g1(n_dot_l, alpha)
    return g1l * g1v / jnp.maximum(g1v + g1l - g1v * g1l, 1e-8)


def sample_cone(axis, cos_theta_max, u1, u2):
    """Uniform direction in a cone around axis (soft sun, ref sun cone sampling)."""
    cos_t = 1.0 - u1 * (1.0 - cos_theta_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], -1)
    return to_world(axis, local)


def sample_sphere_surface(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def power_heuristic(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-12)


def ggx_ndf(n_dot_h, alpha):
    a2 = alpha * alpha
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-12)


def brdf_mix_pdf(v_loc, l_loc, alpha, p_spec):
    """Solid-angle pdf of the diffuse(cosine)/specular(GGX-VNDF) mixture
    sampler at direction l (local space, n=+z) — the BSDF side of the MIS
    weights for emissive-triangle NEE (ref PathTracer.hlsl MIS)."""
    ndl = jnp.maximum(l_loc[..., 2], 0.0)
    ndv = jnp.maximum(v_loc[..., 2], 1e-5)
    h = hm.normalize(v_loc + l_loc, xp=jnp)
    ndh = jnp.maximum(h[..., 2], 0.0)
    # VNDF pdf: G1(v) * D(h) / (4 ndv)
    pdf_s = smith_g1(ndv, alpha) * ggx_ndf(ndh, alpha) / (4.0 * ndv)
    pdf_d = ndl / jnp.pi
    return p_spec * pdf_s + (1.0 - p_spec) * pdf_d
