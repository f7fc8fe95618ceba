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


def build_brdf_lut(res: int = 64, samples: int = 512) -> np.ndarray:
    """Split-sum environment-BRDF LUT (Karis 2013): (res, res, 2) of
    (scale, bias) over (NdotV, roughness), GGX importance-sampled with the
    height-correlated Smith visibility. Host numpy precompute — the
    CommonResources BRDF-LUT analogue (ref src/CommonResources.cpp) and the
    ground truth the hot path's analytic fit is tested against."""
    ndv = (np.arange(res, dtype=np.float64) + 0.5) / res
    rough = (np.arange(res, dtype=np.float64) + 0.5) / res
    NV, RG = np.meshgrid(ndv, rough, indexing="ij")       # (res, res)
    a = np.maximum(RG * RG, 1e-4)
    v = np.stack([np.sqrt(1 - NV * NV), np.zeros_like(NV), NV], -1)  # (r,r,3)

    i = np.arange(samples, dtype=np.float64) + 0.5
    # Hammersley: u1 = i/N, u2 = radical inverse base 2
    u1 = i / samples
    bits = i.astype(np.uint32)
    bits = ((bits << 16) | (bits >> 16)) & 0xFFFFFFFF
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    u2 = bits.astype(np.float64) * 2.3283064365386963e-10

    A = np.zeros_like(NV)
    B = np.zeros_like(NV)
    for k in range(samples):                               # vector over the LUT
        phi = 2.0 * np.pi * u1[k]
        ct = np.sqrt((1.0 - u2[k]) / (1.0 + (a * a - 1.0) * u2[k]))
        st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
        h = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)
        l = 2.0 * np.sum(v * h, -1, keepdims=True) * h - v
        ndl = l[..., 2]
        ndh = np.maximum(h[..., 2], 0.0)
        vdh = np.maximum(np.sum(v * h, -1), 0.0)
        ok = ndl > 0
        a2 = a * a
        gv = NV * np.sqrt(ndl * ndl * (1 - a2) + a2)
        gl = ndl * np.sqrt(NV * NV * (1 - a2) + a2)
        vis = np.where(ok, 0.5 / np.maximum(gv + gl, 1e-8), 0.0)
        # * 4 * VdotH * NdotL / NdotH from the GGX-importance pdf change
        w = np.where(ok, vis * 4.0 * vdh * ndl / np.maximum(ndh, 1e-8), 0.0)
        fc = np.power(1.0 - vdh, 5.0)
        A += (1.0 - fc) * w
        B += fc * w
    return np.stack([A, B], -1).astype(np.float32) / samples


# 32-term least-squares fit of the height-correlated split-sum LUT above
# (64x64 grid, 2048 GGX samples). Mean |err| 0.005 (A) / 0.003 (B), max 0.044.
# The widely-used Lazarov mobile fit was tried first and rejected: it targets
# a Schlick-Smith k=a/2 BRDF and deviates up to 0.17 from OUR analytic-light
# BRDF's height-correlated Smith at high NdotV / mid roughness.
_EB_COEF_A = np.asarray([
    +8.64160800e-01, +6.05938479e+00, -1.13059703e+01, -1.21605450e+01,
    +2.81192555e+01, +1.45689758e+01, -2.38945324e+01, -8.39611313e+00,
    +7.49742039e+00, +1.82001859e+00, -9.44084111e-01, +2.91281397e+01,
    -1.00710299e+02, +8.89154378e+01, -2.05478079e+01, -3.72447428e+01,
    +1.25275893e+02, -1.02986921e+02, +2.02384430e+01, +1.07391214e+01,
    -4.30995281e+01, +2.65484573e+01, +1.64573813e+00, +7.70076959e-01,
    +5.98947753e+00, -1.46560458e+00, -1.56936868e+01, +1.18442740e+01,
    -6.77300008e+00, -1.72224537e+00, +6.13946086e+00, -4.97843579e+00],
    np.float32)
_EB_COEF_B = np.asarray([
    +6.83118269e-01, -7.40111549e+00, +5.04895549e+00, +1.33250468e+01,
    -1.68744769e+01, -1.29349701e+01, +1.71230931e+01, +5.76245963e+00,
    -7.01602635e+00, -8.25181951e-01, +1.14345396e+00, -1.67922285e+00,
    +4.24880504e+01, -4.66825102e+01, +1.19120559e+01, -3.71888365e+00,
    -4.30482209e+01, +4.41703229e+01, -8.04377834e+00, +1.21951704e+01,
    +8.83175995e+00, -1.15271430e+01, -6.12835147e+00, +2.89664271e+00,
    -3.51737449e+00, +1.14596284e+00, +9.55386687e+00, -7.32075062e+00,
    +3.74456670e+00, +1.38560075e+00, -5.52281933e+00, +4.43446563e+00],
    np.float32)


def _env_brdf_basis(x, y, xp=jnp):
    """The fit's 32 basis features at (NdotV=x, roughness=y)."""
    feats = [xp.ones_like(x)]
    for p in range(1, 6):
        feats.append(x ** p)
        feats.append(y ** p)
    for p in range(1, 5):
        for q in range(1, 5):
            if p + q <= 6:
                feats.append((x ** p) * (y ** q))
    g = xp.exp2(-9.28 * x)
    sx = xp.sqrt(x)
    feats += [g, g * y, g * y * y, g * y ** 3, g * (1 - y) ** 2,
              sx, sx * y, sx * y * y]
    return xp.stack(feats, -1)


def env_brdf(ndv, rough):
    """Split-sum environment BRDF (scale, bias) — a validated polynomial fit
    of build_brdf_lut with ZERO gathers (pure VPU math; see _EB_COEF_*)."""
    x = jnp.clip(ndv, 0.0, 1.0)
    y = jnp.clip(rough, 0.0, 1.0)
    F = _env_brdf_basis(x, y)
    A = jnp.einsum("...k,k->...", F, jnp.asarray(_EB_COEF_A))
    B = jnp.einsum("...k,k->...", F, jnp.asarray(_EB_COEF_B))
    return jnp.clip(A, 0.0, 1.0), jnp.clip(B, 0.0, 1.0)


def env_brdf_lut(lut, ndv, rough):
    """Split-sum (scale, bias) from an AUTHORED LUT texture (ref
    CommonResources BRDF LUT / --brdflut): bilinear fetch of a (N, N, 2)
    table indexed (x=NdotV, y=roughness)."""
    N = lut.shape[0]
    x = jnp.clip(ndv[..., 0], 0.0, 1.0) * (N - 1)
    y = jnp.clip(rough[..., 0], 0.0, 1.0) * (N - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, N - 1)
    y1 = jnp.minimum(y0 + 1, N - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    flat = lut.reshape(N * N, 2)
    c00 = flat[y0 * N + x0]
    c01 = flat[y0 * N + x1]
    c10 = flat[y1 * N + x0]
    c11 = flat[y1 * N + x1]
    c = (c00 * (1 - fx) + c01 * fx) * (1 - fy) \
        + (c10 * (1 - fx) + c11 * fx) * fy
    return c[..., 0:1], c[..., 1:2]


def ibl_ambient(sh, n, v, albedo, metallic, roughness, sun_dir, settings,
                intensity=1.0, env_fn=None, spec_suppress=None,
                brdf_lut=None):
    """Diffuse irradiance + roughness-aware specular ambient.

    Specular: reflection-direction environment sample (env_fn when an
    authored environment map exists, else the procedural sky) blended toward
    irradiance with roughness (prefiltered-radiance stand-in), weighted by
    the split-sum environment BRDF (ref CommonResources BRDF LUT — passed as
    brdf_lut when authored via --brdflut, else the validated gather-free
    analytic fit — see env_brdf).

    spec_suppress (H, W) in [0, 1], optional: fraction of the specular term
    REPLACED by traced specular indirect (ops/specular.py) — where reflection
    rays resolve the environment (and geometry) exactly, the split-sum
    approximation must not double count it."""
    from hobbyrenderer_tpu.ops.shading import brdf_params, fresnel_schlick
    diffuse_c, f0, alpha = brdf_params(albedo, metallic, roughness)
    irr_n = jnp.maximum(sample_irradiance(sh, n), 0.0)
    # sh stores irradiance/pi, so Lambert outgoing radiance (albedo/pi)*E
    # is exactly diffuse_c * irr_n — no extra pi factor.
    diffuse = diffuse_c * irr_n

    r = hm.reflect(-v, n, xp=jnp)
    if env_fn is not None:
        env_r = env_fn(r)
    else:
        env_r = skyops.sky_radiance_fast(r, sun_dir, settings,
                                         with_sun_disk=False)
    rough = jnp.clip(roughness, 0.0, 1.0)[..., None]
    # fully-rough prefiltered radiance ~ E/pi = the stored irradiance quantity
    spec_env = (env_r * (1 - rough)
                + jnp.maximum(sample_irradiance(sh, r), 0.0) * rough)
    ndv = jnp.maximum(jnp.sum(n * v, -1, keepdims=True), 1e-4)
    if brdf_lut is not None:
        scale, bias = env_brdf_lut(brdf_lut, ndv, rough)
    else:
        scale, bias = env_brdf(ndv, rough)
    spec = spec_env * (f0 * scale + bias)
    if spec_suppress is not None:
        spec = spec * (1.0 - spec_suppress)[..., None]
    return (diffuse + spec) * intensity
