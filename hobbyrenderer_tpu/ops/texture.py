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
    return _decode_rows(rows)


def _decode_rows(rows) -> TexSample:
    """Unpack (..., 4) u32 packed texel rows (scene/textures.py layout)."""

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


def sample_material_streamed(stream, mat, uv, lod, rng_key3) -> TexSample:
    """Stochastic-trilinear sample through the STREAMING residency tables
    (scene/streaming.py StreamTables; ref D3D12 reserved-resource sampling +
    residency clamp).

    The requested lod is clamped to the material's finest FULLY-resident mip;
    tail mips (<= 32x32, always resident) read dense rows at the pool head,
    streamed mips go through the page table. Costs the same ONE texel row
    gather as the dense path plus three small-table gathers (resident mip,
    virtual-tile base, page id)."""
    from hobbyrenderer_tpu.scene.streaming import PAGE_TEXELS, TAIL_MAX, TILE
    MIPS = stream.vt_base.shape[1]
    M = stream.mat_resident.shape[0]
    mc = jnp.clip(mat, 0, M - 1)
    u0 = uniform_from_bits(rng_key3[..., 0])
    u1 = uniform_from_bits(rng_key3[..., 1])
    u2 = uniform_from_bits(rng_key3[..., 2])

    S = jnp.maximum(stream.mat_tex_size[mc], 1)
    max_l = jnp.round(jnp.log2(S.astype(jnp.float32))).astype(jnp.int32)
    l = jnp.clip(jnp.floor(lod + u0).astype(jnp.int32), 0, max_l)
    l = jnp.maximum(l, stream.mat_resident[mc])          # residency clamp
    l = jnp.clip(l, 0, MIPS - 1)
    Sl = jnp.maximum(S >> l, 1)
    Slf = Sl.astype(jnp.float32)

    tx_ = uv[..., 0] * Slf - 0.5 + u1
    ty_ = uv[..., 1] * Slf - 0.5 + u2
    xi = jnp.floor(tx_).astype(jnp.int32) % Sl
    yi = jnp.floor(ty_).astype(jnp.int32) % Sl

    flat = mc * MIPS + l
    is_tail = Sl <= TAIL_MAX
    # tail: dense rows at the pool head
    row_t = stream.tail_off.reshape(-1)[flat] + yi * Sl + xi
    # streamed: virtual tile -> page -> pool row
    tiles_x = jnp.maximum(Sl // TILE, 1)
    vt = (stream.vt_base.reshape(-1)[flat]
          + (yi // TILE) * tiles_x + (xi // TILE))
    V = stream.page_table.shape[0]
    page = stream.page_table[jnp.clip(vt, 0, V - 1)]
    row_s = (stream.pool_base + page * PAGE_TEXELS
             + (yi % TILE) * TILE + (xi % TILE))
    # page < 0 cannot happen for mips >= mat_resident; guard with the 1x1 tail
    idx = jnp.where(is_tail, row_t,
                    jnp.where(page >= 0, row_s,
                              stream.tail_off.reshape(-1)[mc * MIPS + MIPS - 1]))
    rows = stream.tex_pool[jnp.clip(idx, 0, stream.tex_pool.shape[0] - 1)]
    return _decode_rows(rows)


def texture_feedback(mat, lod, n_mats: int, stride: int = 4):
    """Per-frame sampler-feedback resolve (ref FeedbackManager feedback
    resolves): strided (mat, mip) demand histogram BEFORE the residency clamp.

    mat (H, W) i32, lod (H, W) f32 -> (n_mats, MAX_MIPS) i32 counts."""
    from hobbyrenderer_tpu.scene.textures import MAX_MIPS
    m = jnp.clip(mat[::stride, ::stride], 0, n_mats - 1)
    l = jnp.clip(jnp.floor(lod[::stride, ::stride]).astype(jnp.int32),
                 0, MAX_MIPS - 1)
    seg = (m * MAX_MIPS + l).reshape(-1)
    ones = jnp.ones(seg.shape, jnp.int32)
    return jax.ops.segment_sum(ones, seg,
                               num_segments=n_mats * MAX_MIPS
                               ).reshape(n_mats, MAX_MIPS)


def _ddx(img):
    """Forward difference along x, backward at the last column (jnp.roll
    wrapped to the opposite image edge — garbage derivatives on the border
    and at every row-band seam under sharding)."""
    d = img[:, 1:] - img[:, :-1]
    return jnp.concatenate([d, d[:, -1:]], axis=1)


def _ddy(img):
    """Forward difference along y, backward at the last row."""
    d = img[1:] - img[:-1]
    return jnp.concatenate([d, d[-1:]], axis=0)


def uv_lod(uv_img, tex_size_img):
    """Mip level from screen-space UV derivatives (visibility-buffer shading
    has no quad derivatives; finite differences stand in — ref HW ddx/ddy).

    A one-sided difference across a TRIANGLE/surface boundary compares uvs of
    unrelated surfaces — |duv| blows up and the pixel samples the coarsest
    mip. HW quad derivatives share the same problem only on 2x2 quad borders;
    here EVERY pixel along a silhouette got a garbage footprint (measured:
    wholesale texture blur at low golden-gate resolutions, visibly washed-out
    vs the PT ground truth). Take the MIN-magnitude of the forward/backward
    differences per axis: at a boundary, the surface-interior side survives.

    uv_img (H, W, 2); tex_size_img (H, W). Returns (H, W) fractional lod."""
    def two_sided(d, axis):
        # d = forward diff with edge copy; backward diff = d shifted by one
        if axis == 1:
            bwd = jnp.concatenate([d[:, :1], d[:, :-1]], axis=1)
        else:
            bwd = jnp.concatenate([d[:1], d[:-1]], axis=0)
        # wrap-aware: a seam crossing produces |duv| ~ 1; modular-minimize
        d = d - jnp.round(d)
        bwd = bwd - jnp.round(bwd)
        mag_f = jnp.abs(d).max(-1)
        mag_b = jnp.abs(bwd).max(-1)
        return jnp.minimum(mag_f, mag_b)

    foot = jnp.maximum(two_sided(_ddx(uv_img), 1),
                       two_sided(_ddy(uv_img), 0))
    texels = foot * tex_size_img
    return jnp.log2(jnp.maximum(texels, 1e-6))


def cotangent_frame(n, pos, uv):
    """Per-pixel tangent frame from screen-space derivatives (Schüler's
    cotangent-frame method — normal mapping without vertex tangents).

    n, pos (H, W, 3); uv (H, W, 2). Returns (T, B) world-space."""
    dp1 = _ddx(pos)
    dp2 = _ddy(pos)
    duv1 = _ddx(uv)
    duv2 = _ddy(uv)
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
