"""PBR shading: GGX BRDF + punctual/directional light evaluation.

Reference: src/shaders/CommonLighting.hlsli (1117 LoC) — GGX specular with Smith
visibility, Schlick Fresnel, Lambert diffuse, punctual light falloff/cones, and NEE
helpers (CommonLighting.hlsli:716-908). All formulas are standard PBR; implemented
fresh in jnp, vectorized over pixels (the VPU path — shading is pure elementwise)."""

from __future__ import annotations

import jax.numpy as jnp

from hobbyrenderer_tpu.scene.scene import LIGHT_DIRECTIONAL, LIGHT_POINT, LIGHT_SPOT
from hobbyrenderer_tpu.utils import math as hm

MIN_ROUGHNESS = 0.03
DIELECTRIC_F0 = 0.04


def ggx_d(n_dot_h, alpha):
    a2 = alpha * alpha
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-8)


def smith_v(n_dot_v, n_dot_l, alpha):
    """Height-correlated Smith visibility (G / (4 NdotL NdotV))."""
    a2 = alpha * alpha
    gv = n_dot_l * jnp.sqrt(jnp.maximum(n_dot_v * n_dot_v * (1 - a2) + a2, 1e-8))
    gl = n_dot_v * jnp.sqrt(jnp.maximum(n_dot_l * n_dot_l * (1 - a2) + a2, 1e-8))
    return 0.5 / jnp.maximum(gv + gl, 1e-8)


def fresnel_schlick(v_dot_h, f0, f90=1.0):
    return f0 + (f90 - f0) * jnp.power(jnp.clip(1.0 - v_dot_h, 0.0, 1.0), 5.0)


def brdf_params(albedo, metallic, roughness):
    """Split albedo into diffuse color + specular F0 (metallic workflow)."""
    rough = jnp.clip(roughness, MIN_ROUGHNESS, 1.0)
    alpha = rough * rough
    diffuse = albedo * (1.0 - metallic[..., None])
    f0 = (DIELECTRIC_F0 * (1.0 - metallic[..., None])
          + albedo * metallic[..., None])
    return diffuse, f0, alpha


def eval_brdf(n, v, l, albedo, metallic, roughness):
    """Full BRDF * NdotL (radiance transfer weight). Shapes broadcast over pixels."""
    diffuse, f0, alpha = brdf_params(albedo, metallic, roughness)
    h = hm.normalize(v + l, xp=jnp)
    ndl = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    ndv = jnp.maximum(jnp.sum(n * v, -1), 1e-5)
    ndh = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    vdh = jnp.maximum(jnp.sum(v * h, -1), 0.0)
    F = fresnel_schlick(vdh[..., None], f0)
    spec = (ggx_d(ndh, alpha) * smith_v(ndv, ndl, alpha))[..., None] * F
    kd = (1.0 - F)
    return (kd * diffuse / jnp.pi + spec) * ndl[..., None]


def light_incident(light_type, light_pos, light_dir, light_color, light_range,
                   light_cone, shade_pos):
    """Incident radiance + direction-to-light for one light at shaded points.

    Returns (L (..,3) unit direction to light, radiance (..,3), dist)."""
    is_dir = light_type == LIGHT_DIRECTIONAL  # scalar, or (R,) when lights are
    #                                           per-lane indexed (NEE path)
    is_dir_v = is_dir[..., None] if getattr(is_dir, "ndim", 0) else is_dir
    to_l = jnp.where(is_dir_v, -light_dir, light_pos - shade_pos)
    dist = jnp.linalg.norm(to_l, axis=-1, keepdims=True)
    L = to_l / jnp.maximum(dist, 1e-8)
    dist = dist[..., 0]
    # inverse-square with smooth range window (punctual); directional: no falloff
    atten = jnp.where(is_dir, 1.0,
                      _range_falloff(dist, light_range) / jnp.maximum(dist * dist, 1e-4))
    # spot cone
    cd = jnp.sum(-L * light_dir, -1)
    spot = jnp.clip((cd - light_cone[..., 1]) /
                    jnp.maximum(light_cone[..., 0] - light_cone[..., 1], 1e-4), 0.0, 1.0)
    spot = spot * spot
    atten = jnp.where(light_type == LIGHT_SPOT, atten * spot, atten)
    radiance = light_color * atten[..., None]
    dist = jnp.where(is_dir, jnp.float32(1e9), dist)
    return L, radiance, dist


def _range_falloff(dist, rng):
    x = jnp.clip(dist / jnp.maximum(rng, 1e-4), 0.0, 1.0)
    f = 1.0 - x * x * x * x
    return jnp.clip(f * f, 0.0, 1.0)


def shade_all_lights(gpu, pos, n, v, albedo, metallic, roughness,
                     shadow_fn=None, max_lights: int = None):
    """Accumulate direct lighting over the padded light array (masked by
    light_count). shadow_fn(light_idx, L, dist) -> visibility in [0,1], optional.

    Reference: the light loop in DeferredLighting.hlsl / CommonLighting.hlsli.
    Implemented as lax.fori_loop with a DYNAMIC trip count (the actual light
    count) — the padded capacity is never paid, and the loop body compiles once
    (a 64x unroll made whole-graph XLA optimization time explode)."""
    import jax

    def body(i, total):
        L, rad, dist = light_incident(
            gpu.light_type[i], gpu.light_pos[i], gpu.light_dir[i],
            gpu.light_color[i], gpu.light_range[i], gpu.light_cone[i], pos)
        f = eval_brdf(n, v, L, albedo, metallic, roughness)
        contrib = f * rad
        if shadow_fn is not None:
            vis = shadow_fn(i, L, dist)
            contrib = contrib * vis[..., None]
        return total + contrib

    n_lights = gpu.light_count if max_lights is None else jnp.minimum(
        gpu.light_count, max_lights)
    return jax.lax.fori_loop(0, n_lights, body, jnp.zeros_like(albedo))


def ambient_hemisphere(n, albedo, metallic, roughness, sky_color, ground_color):
    """Cheap hemisphere ambient used before IBL exists (NormalBasic fallback)."""
    t = n[..., 1:2] * 0.5 + 0.5
    irr = ground_color * (1 - t) + sky_color * t
    diffuse = albedo * (1.0 - metallic[..., None])
    return diffuse * irr
