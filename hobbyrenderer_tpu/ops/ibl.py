"""Image-based lighting from the environment (sky) — diffuse irradiance +
roughness-aware specular ambient.

Reference: CommonResources' IBL irradiance/radiance cubemaps + BRDF LUT
(src/CommonResources.cpp) consumed by DeferredLighting's IBL term and the IBL
rendering mode (src/Renderer.cpp:1026-1050). The reference ships prebaked DDS
cubemaps; here the environment is the procedural sky, so irradiance is
REBUILT ON DEVICE EVERY FRAME, which makes sun direction fully dynamic.

TPU-first representation: order-2 SPHERICAL HARMONICS (9 RGB coefficients,
Ramamoorthi & Hanrahan 2001) instead of a lat-long table. The round-1 bilinear
table lookup cost 4 element-gathers per pixel per sample (~8M gathers/frame in
deferred lighting — gathers are the slowest primitive on TPU, ~20 ns/row);
SH evaluation is ~20 FMAs of pure VPU work and is exact for the cosine lobe.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import sky as skyops
from hobbyrenderer_tpu.utils import math as hm

SH_SAMPLES = 256


def _fibonacci_sphere(n: int) -> np.ndarray:
    """Deterministic uniform sphere directions (no RNG; stable under jit)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    y = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    return np.stack([r * np.cos(phi), y, r * np.sin(phi)], -1).astype(np.float32)


def sh_basis(d):
    """Real SH basis Y_00..Y_2m at unit directions d (..., 3) -> (..., 9)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack([
        0.282095 * one,
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z,
        0.546274 * (x * x - y * y),
    ], -1)


# cosine-lobe band weights Â_l / pi (we evaluate irradiance/pi directly).
# numpy (not jnp): this module is imported lazily inside traced pass bodies,
# and a module-level jnp constant would leak a tracer.
_BAND = np.asarray([1.0,
                    2.0 / 3.0, 2.0 / 3.0, 2.0 / 3.0,
                    0.25, 0.25, 0.25, 0.25, 0.25], np.float32)


def build_sky_irradiance(sun_dir, settings):
    """(9, 3) SH projection of sky radiance (no sun disk; the sun is handled by
    direct lighting). Deterministic fibonacci-sphere Monte Carlo."""
    d = jnp.asarray(_fibonacci_sphere(SH_SAMPLES))        # (N, 3)
    L = skyops.sky_radiance(d, sun_dir, settings, with_sun_disk=False)  # (N, 3)
    Y = sh_basis(d)                                       # (N, 9)
    # uniform-sphere MC of the projection integral: 4*pi/N * sum L*Y
    return (4.0 * jnp.pi / SH_SAMPLES) * jnp.einsum("nc,nk->kc", L, Y)


def sample_irradiance(sh, n):
    """Irradiance/pi at normals n (..., 3) from SH coefficients (9, 3)."""
    Y = sh_basis(n)                                       # (..., 9)
    return jnp.einsum("...k,kc->...c", Y * _BAND, sh)


def sample_radiance_sh(sh, d):
    """Raw SH radiance reconstruction along d — the fully-rough prefiltered
    env fallback used by the specular blend."""
    Y = sh_basis(d)
    return jnp.einsum("...k,kc->...c", Y, sh)


def ibl_ambient(sh, n, v, albedo, metallic, roughness, sun_dir, settings,
                intensity=1.0):
    """Diffuse irradiance + roughness-aware specular ambient.

    Specular: reflection-direction sky sample blended toward irradiance with
    roughness (a cheap stand-in for prefiltered radiance mips + BRDF LUT;
    split-sum approximated by the Schlick-roughness Fresnel)."""
    from hobbyrenderer_tpu.ops.shading import brdf_params, fresnel_schlick
    diffuse_c, f0, alpha = brdf_params(albedo, metallic, roughness)
    irr_n = jnp.maximum(sample_irradiance(sh, n), 0.0)
    # sh stores irradiance/pi, so Lambert outgoing radiance (albedo/pi)*E
    # is exactly diffuse_c * irr_n — no extra pi factor.
    diffuse = diffuse_c * irr_n

    r = hm.reflect(-v, n, xp=jnp)
    env_r = skyops.sky_radiance_fast(r, sun_dir, settings,
                                     with_sun_disk=False)
    rough = jnp.clip(roughness, 0.0, 1.0)[..., None]
    # fully-rough prefiltered radiance ~ E/pi = the stored irradiance quantity
    spec_env = (env_r * (1 - rough)
                + jnp.maximum(sample_irradiance(sh, r), 0.0) * rough)
    ndv = jnp.maximum(jnp.sum(n * v, -1, keepdims=True), 1e-4)
    # Schlick-roughness environment Fresnel
    f90 = jnp.maximum(1.0 - rough, f0)
    F = f0 + (f90 - f0) * jnp.power(1.0 - ndv, 5.0)
    return (diffuse + spec_env * F) * intensity
