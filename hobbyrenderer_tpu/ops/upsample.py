"""Depth/normal-guided (joint bilateral) upsampling of low-res lighting grids.

The GI-class passes (ReSTIR GI, SHARC/combined indirect, SSGI, DDGI query)
evaluate at a strided sub-grid of the G-buffer (`img[::s, ::s]` — TOP-LEFT
aligned) and used to come back to full res through `jax.image.resize`, which is
(a) center-aligned (a ~(s-1)/2-pixel shift of the whole indirect signal) and
(b) oblivious to geometry: radiance bleeds across depth and normal edges
exactly where low-res sampling is already weakest. The reference's NRD/RTXDI
stack upsamples its half-res signals with depth+normal-guided kernels for the
same reason (ref: NRD integration, src/shaders/SHARCResolve + NRD docs).

TPU design: NO gathers. For an integer factor s, a full-res pixel y interpolates
quarter rows i0 = y//s and i0+1 with weight fy = (y % s)/s — so the four
bilinear candidates are produced by `jnp.repeat` of the grid and of its
one-row/col shifted copy (layout-only ops XLA folds into the consumer), and the
guided weights are pure elementwise math. Cross-band: the +1 row at a band's
bottom edge arrives through ONE ppermute halo row (`shard_utils.extend_rows`),
keeping sharded == single exact.
"""

from __future__ import annotations

import jax.numpy as jnp

from hobbyrenderer_tpu.ops import shard_utils as shu

__all__ = ["joint_bilateral_upsample"]


def _axis_pair(q, scale, axis, shard=None):
    """Low/high interpolation partners along one axis, expanded s×.

    q: (..., n, ...) grid sampled at full positions i*scale along `axis`.
    Returns (lo, hi): full-length (n*scale) arrays with
    lo[y] = q[y//s], hi[y] = q[min(y//s + 1, n-1)] (interior bands reach the
    neighbor's first row via the shard halo)."""
    n = q.shape[axis]
    if axis == 0 and shard is not None and shard.n > 1:
        ext = shu.extend_rows(q, 1, shard)          # (1 + n + 1, ...)
        below = ext[-1:]                            # next band's first row
        # the LAST band has no neighbor below: ppermute zero-fills there —
        # clamp to our own last row (matches the single-chip edge clone)
        is_last = shard.y0 >= (shard.n - 1) * shard.shard_h
        below = jnp.where(is_last, q[-1:], below)
        q_hi = jnp.concatenate([q[1:], below], axis=0)
    else:
        idx_take = [slice(None)] * q.ndim
        idx_take[axis] = slice(1, None)
        idx_last = [slice(None)] * q.ndim
        idx_last[axis] = slice(n - 1, n)
        q_hi = jnp.concatenate([q[tuple(idx_take)], q[tuple(idx_last)]],
                               axis=axis)
    lo = jnp.repeat(q, scale, axis=axis)
    hi = jnp.repeat(q_hi, scale, axis=axis)
    return lo, hi


def _frac(n, scale, dtype=jnp.float32):
    """fy[y] = (y % s) / s for y in [0, n*s)."""
    r = jnp.arange(scale, dtype=dtype) / scale
    return jnp.tile(r, n)


def _fit(x, H, W):
    """Edge-extend an (Hs, Ws, ...) map to (H, W, ...) when H % s != 0."""
    if x.shape[0] < H:
        pad = [(0, H - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad, mode="edge")
    if x.shape[1] < W:
        pad = [(0, 0), (0, W - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
        x = jnp.pad(x, pad, mode="edge")
    return x[:H, :W]


def joint_bilateral_upsample(q, q_depth, q_nrm, q_valid,
                             f_depth, f_nrm, scale: int,
                             shard=None, depth_rel: float = 0.1,
                             normal_min: float = 0.0,
                             normal_pow: float = 8.0):
    """Upsample a (Hg, Wg, C) grid to full (H, W, C) with geometry guidance.

    q            low-res signal at full pixels (i*scale, j*scale)
    q_depth/nrm  the G-buffer rows the signal was computed AT (`[::scale]`)
    q_valid      (Hg, Wg) bool — sky/invalid samples get zero weight
    f_depth/nrm  full-res guides; full shape defines the output size
    shard        optional RowShard of the FULL-res band (quarter shard is
                 derived; shard_h % scale == 0 by the mesh contract)
    depth_rel    relative depth tolerance (same 0.1 rule the GI spatial
                 similarity test uses)

    Candidates whose surface differs (relative depth beyond depth_rel, or
    facing away) are down-weighted; when every candidate dies the plain
    bilinear blend is used instead (thin geometry: a biased estimate beats a
    black hole the denoiser would smear)."""
    Hg, Wg = q.shape[:2]
    H, W = f_depth.shape[:2]
    C = q.shape[-1]

    qshard = None
    if shard is not None and shard.n > 1:
        qshard = shard._replace(y0=shard.y0 // scale, shard_h=Hg,
                                full_h=shu.full_height(shard, H) // scale)

    # stack signal + guides so the repeat/shift machinery runs once
    pack = jnp.concatenate([q, q_depth[..., None],
                            q_nrm, q_valid[..., None].astype(q.dtype)], -1)
    lo, hi = _axis_pair(pack, scale, 0, qshard)     # rows
    p00, p01 = _axis_pair(lo, scale, 1)             # cols of the low row
    p10, p11 = _axis_pair(hi, scale, 1)

    fy = _frac(Hg, scale)[:, None]                  # (Hs, 1)
    fx = _frac(Wg, scale)[None, :]                  # (1, Ws)
    b = ((1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx)

    fd = _fit(f_depth[..., None], H, W)[..., 0]
    fn = _fit(f_nrm, H, W)
    num = jnp.zeros((H, W, C), q.dtype)
    den = jnp.zeros((H, W), q.dtype)
    num_b = jnp.zeros((H, W, C), q.dtype)
    den_b = jnp.zeros((H, W), q.dtype)
    for cand, bw in zip((p00, p01, p10, p11), b):
        cand = _fit(cand, H, W)
        val = cand[..., :C]
        zq = cand[..., C]
        nq = cand[..., C + 1:C + 4]
        okq = cand[..., C + 4]
        # same relative-depth rule as the GI spatial similarity test
        gz = jnp.exp(-jnp.abs(zq - fd)
                     / (depth_rel * jnp.maximum(jnp.abs(fd), 1e-3)))
        gn = jnp.maximum(jnp.sum(nq * fn, -1), normal_min) ** normal_pow
        w = bw * okq * gz * gn
        num = num + val * w[..., None]
        den = den + w
        wb = bw * okq
        num_b = num_b + val * wb[..., None]
        den_b = den_b + wb
    guided = num / jnp.maximum(den, 1e-8)[..., None]
    plain = num_b / jnp.maximum(den_b, 1e-8)[..., None]
    out = jnp.where((den > 1e-6)[..., None], guided, plain)
    return jnp.where((den_b > 1e-6)[..., None], out, 0.0)
