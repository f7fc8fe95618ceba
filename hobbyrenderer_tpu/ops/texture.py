"""Material texture sampling from the packed texel table.

Reference: SampleBindlessTexture / material sampling in BasePass.hlsl:271-518
and PathTracer hit shading. The hardware samplers (trilinear, wrap) are
replaced by STOCHASTIC TRILINEAR filtering: one jittered nearest fetch per
sample whose expectation equals the trilinear result — TAA / path-tracer
accumulation integrates it. This costs exactly ONE row gather per sample
(gathers are the scarce primitive on TPU), vs 8 for deterministic trilinear.

Texel layout: see scene/textures.py (4 x u32 rows; albedo RGBA sRGB, normal
XY, occlusion, roughness, metallic, emissive RGB sRGB).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits


class TexSample(NamedTuple):
    albedo: jnp.ndarray     # (..., 3) linear
    alpha: jnp.ndarray      # (...,)
    normal_ts: jnp.ndarray  # (..., 3) tangent-space, unit-ish
    occlusion: jnp.ndarray  # (...,)
    roughness: jnp.ndarray  # (...,)
    metallic: jnp.ndarray   # (...,)
    emissive: jnp.ndarray   # (..., 3) linear


def _srgb_to_linear(c):
    return jnp.power(c, 2.2)


def sample_material(gpu, tex_size, tex_base, uv, lod, rng_key3) -> TexSample:
    """Stochastic-trilinear sample of a material's packed texture stack.

    tex_size (...,) f32 top-mip S; tex_base (...,) i32 absolute table row of
    mip 0; uv (..., 2); lod (...,) requested mip (fractional);
    rng_key3 (..., 3) u32 random words (mip select + bilinear jitter)."""
    u0 = uniform_from_bits(rng_key3[..., 0])
    u1 = uniform_from_bits(rng_key3[..., 1])
    u2 = uniform_from_bits(rng_key3[..., 2])

    S = jnp.maximum(tex_size.astype(jnp.int32), 1)
    max_l = jnp.round(jnp.log2(S.astype(jnp.float32))).astype(jnp.int32)
    # stochastic mip: floor(lod + u) rounds to neighbours with tri-linear weight
    l = jnp.clip(jnp.floor(lod + u0).astype(jnp.int32), 0, max_l)
    Sl = jnp.maximum(S >> l, 1)
    Slf = Sl.astype(jnp.float32)
    # mip chain is contiguous: off(l) = base + (4*S^2 - 4*Sl^2) / 3 (exact for
    # power-of-two S)
    off = tex_base + (4 * S * S - 4 * Sl * Sl) // 3

    # stochastic bilinear: jitter within the texel footprint (wrap addressing)
    tx = uv[..., 0] * Slf - 0.5 + u1
    ty = uv[..., 1] * Slf - 0.5 + u2
    xi = jnp.floor(tx).astype(jnp.int32) % Sl
    yi = jnp.floor(ty).astype(jnp.int32) % Sl
    idx = off + yi * Sl + xi
    rows = gpu.tex_table[jnp.clip(idx, 0, gpu.tex_table.shape[0] - 1)]  # (...,4) u32

    def u8(word, byte):
        return ((rows[..., word] >> (8 * byte)) & 0xFF).astype(jnp.float32) / 255.0

    base = jnp.stack([u8(0, 0), u8(0, 1), u8(0, 2)], -1)
    alpha = u8(0, 3)
    nrm_xy = jnp.stack([u8(1, 0), u8(1, 1)], -1) * 2.0 - 1.0
    nz = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(nrm_xy * nrm_xy, -1), 0.04))
    normal_ts = jnp.concatenate([nrm_xy, nz[..., None]], -1)
    occ = u8(1, 2)
    rough = u8(1, 3)
    metal = u8(2, 0)
    emis = jnp.stack([u8(2, 1), u8(2, 2), u8(2, 3)], -1)
    return TexSample(albedo=_srgb_to_linear(base), alpha=alpha,
                     normal_ts=normal_ts, occlusion=occ, roughness=rough,
                     metallic=metal, emissive=_srgb_to_linear(emis))


def uv_lod(uv_img, tex_size_img):
    """Mip level from screen-space UV derivatives (visibility-buffer shading
    has no quad derivatives; finite differences stand in — ref HW ddx/ddy).

    uv_img (H, W, 2); tex_size_img (H, W). Returns (H, W) fractional lod."""
    dx = jnp.roll(uv_img, -1, axis=1) - uv_img
    dy = jnp.roll(uv_img, -1, axis=0) - uv_img
    # wrap-aware: a seam crossing produces |duv| ~ 1; modular-minimize
    dx = dx - jnp.round(dx)
    dy = dy - jnp.round(dy)
    foot = jnp.maximum(jnp.abs(dx).max(-1), jnp.abs(dy).max(-1))
    texels = foot * tex_size_img
    return jnp.log2(jnp.maximum(texels, 1e-6))


def cotangent_frame(n, pos, uv):
    """Per-pixel tangent frame from screen-space derivatives (Schüler's
    cotangent-frame method — normal mapping without vertex tangents).

    n, pos (H, W, 3); uv (H, W, 2). Returns (T, B) world-space."""
    dp1 = jnp.roll(pos, -1, axis=1) - pos
    dp2 = jnp.roll(pos, -1, axis=0) - pos
    duv1 = jnp.roll(uv, -1, axis=1) - uv
    duv2 = jnp.roll(uv, -1, axis=0) - uv
    duv1 = duv1 - jnp.round(duv1)
    duv2 = duv2 - jnp.round(duv2)
    # solve for dP/du, dP/dv
    dp2perp = jnp.cross(dp2, n)
    dp1perp = jnp.cross(n, dp1)
    T = dp2perp * duv1[..., 0:1] + dp1perp * duv2[..., 0:1]
    B = dp2perp * duv1[..., 1:2] + dp1perp * duv2[..., 1:2]
    invmax = jax.lax.rsqrt(jnp.maximum(
        jnp.maximum(jnp.sum(T * T, -1, keepdims=True),
                    jnp.sum(B * B, -1, keepdims=True)), 1e-20))
    return T * invmax, B * invmax


def apply_normal_map(n, pos, uv, n_ts):
    """Perturb world normal n by tangent-space sample n_ts."""
    T, B = cotangent_frame(n, pos, uv)
    degenerate = (jnp.sum(T * T, -1, keepdims=True) < 1e-12)
    m = n_ts[..., 0:1] * T + n_ts[..., 1:2] * B + n_ts[..., 2:3] * n
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-8)
    return jnp.where(degenerate, n, m)
