"""Image-based lighting from the environment (sky) — diffuse irradiance +
roughness-aware specular ambient.

Reference: CommonResources' IBL irradiance/radiance cubemaps + BRDF LUT
(src/CommonResources.cpp) consumed by DeferredLighting's IBL term and the IBL
rendering mode (src/Renderer.cpp:1026-1050). The reference ships prebaked DDS
cubemaps; here the environment is the procedural sky, so the irradiance map is
INTEGRATED ON DEVICE EVERY FRAME (a 32x64 lat-long map x 64 cosine samples is
~130k sky evals — microseconds on the VPU), which makes sun direction fully
dynamic. External HDR envmaps can replace the sky once an image loader lands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.ops import sky as skyops
from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

IRR_H, IRR_W = 16, 32
IRR_SAMPLES = 64


def _latlong_dirs(h: int, w: int):
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    theta = vv * jnp.pi          # 0 = +Y (up)
    phi = uu * 2 * jnp.pi
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)], -1)


def build_sky_irradiance(sun_dir, settings):
    """(IRR_H, IRR_W, 3) cosine-weighted irradiance/pi of the sky (no sun disk;
    the sun is handled by direct lighting)."""
    n = _latlong_dirs(IRR_H, IRR_W).reshape(-1, 3)        # (N, 3)
    N = n.shape[0]
    pix = jnp.arange(N, dtype=jnp.uint32)

    def body(c, acc):
        bits = pcg3d(jnp.stack([pix, jnp.full_like(pix, 7), jnp.full_like(pix, c)], -1))
        u1 = uniform_from_bits(bits[..., 0])
        u2 = uniform_from_bits(bits[..., 1])
        d = smp.to_world(n, smp.cosine_sample_hemisphere(u1, u2))
        L = skyops.sky_radiance(d, sun_dir, settings, with_sun_disk=False)
        return acc + L

    acc = jax.lax.fori_loop(0, IRR_SAMPLES, body, jnp.zeros((N, 3)))
    # cosine-weighted MC with pdf cos/pi integrates to irradiance/pi directly
    return (acc / IRR_SAMPLES).reshape(IRR_H, IRR_W, 3)


def sample_irradiance(irr, n):
    """Bilinear lat-long lookup. n (..., 3) unit."""
    theta = jnp.arccos(jnp.clip(n[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(n[..., 2], n[..., 0]) % (2 * jnp.pi)
    y = jnp.clip(theta / jnp.pi * IRR_H - 0.5, 0.0, IRR_H - 1.0)
    x = phi / (2 * jnp.pi) * IRR_W - 0.5
    x0 = jnp.floor(x).astype(jnp.int32) % IRR_W
    x1 = (x0 + 1) % IRR_W
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, IRR_H - 1)
    fx = (x - jnp.floor(x))[..., None]
    fy = (y - y0)[..., None]
    c = (irr[y0, x0] * (1 - fx) + irr[y0, x1] * fx) * (1 - fy) \
        + (irr[y1, x0] * (1 - fx) + irr[y1, x1] * fx) * fy
    return c


def ibl_ambient(irr, n, v, albedo, metallic, roughness, sun_dir, settings,
                intensity=1.0):
    """Diffuse irradiance + roughness-aware specular ambient.

    Specular: reflection-direction sky sample blended toward irradiance with
    roughness (a cheap stand-in for prefiltered radiance mips + BRDF LUT;
    split-sum approximated by the Schlick-roughness Fresnel)."""
    from hobbyrenderer_tpu.ops.shading import brdf_params, fresnel_schlick
    diffuse_c, f0, alpha = brdf_params(albedo, metallic, roughness)
    irr_n = sample_irradiance(irr, n)
    # irr stores irradiance/pi, so Lambert outgoing radiance (albedo/pi)*E
    # is exactly diffuse_c * irr_n — no extra pi factor.
    diffuse = diffuse_c * irr_n

    r = hm.reflect(-v, n, xp=jnp)
    env_r = skyops.sky_radiance(r, sun_dir, settings, with_sun_disk=False)
    rough = jnp.clip(roughness, 0.0, 1.0)[..., None]
    # fully-rough prefiltered radiance ~ E/pi = the stored irradiance quantity
    spec_env = env_r * (1 - rough) + sample_irradiance(irr, r) * rough
    ndv = jnp.maximum(jnp.sum(n * v, -1, keepdims=True), 1e-4)
    # Schlick-roughness environment Fresnel
    f90 = jnp.maximum(1.0 - rough, f0)
    F = f0 + (f90 - f0) * jnp.power(1.0 - ndv, 5.0)
    return (diffuse + spec_env * F) * intensity
