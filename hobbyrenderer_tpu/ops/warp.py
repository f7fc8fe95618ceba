"""Gather-free screen-space warping (temporal reprojection backbone).

Every temporal pass (TAA, RELAX accumulation, ReSTIR temporal reuse, SSGI)
fetches history at `pixel + motion`. The obvious formulation is a per-pixel
gather — and a 1080p row gather costs ~45 ms on TPU (measured: 2M random rows
from a 2M x 48B table; the HW gather unit is latency-bound per row). But
reprojection indices are NEAR-IDENTITY: source = dest + motion, where motion is
a few pixels of jitter/parallax plus a roughly-uniform camera term. That
structure turns the gather into pure VPU bandwidth:

  1. split motion into a GLOBAL integer shift (its rounded mean, one
     dynamic_slice — uniform camera pans of any speed cost nothing), plus
  2. a per-pixel RESIDUAL handled by 2R+1 static shifted slices per axis,
     mask-weighted and summed (a "masked barrel shift"). Residuals beyond R
     clamp — exactly the pixels whose history the neighborhood clamp /
     disocclusion test rejects anyway.

Separable: the vertical pass uses the motion field sampled at the tap column
(error only where the motion field varies within R px — object silhouettes,
where history is rejected regardless). Cost: 2*(2R+1) fused multiply-adds over
the frame ≈ 0.3 ms at 1080p vs ~45 ms for the gather. Reference analogue: the
plain texture fetches of TAA.hlsl / the NRD reprojection taps, whose random
access is free on GPU texture units but hostile to the TPU.

Under row-band sharding (ops/shard_utils.RowShard) the vertical reach is
bounded by the exchanged halo: |global dy| + R <= halo; farther reprojection
clamps to the halo rows (same clamping the gather path applied). The global
shift means are psum'd so every band picks the same window."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import shard_utils as shu

WARP_RADIUS = 8      # residual tap radius (px) after the global integer shift
WARP_COL_PAD = 96    # static column pad: bounds |global dx| to COL_PAD-R-1


def _global_mean(v: jnp.ndarray, shard) -> jnp.ndarray:
    """Frame-wide mean of a (H, W) field (psum across row bands)."""
    s = jnp.sum(v)
    n = v.shape[0] * v.shape[1]
    if shard is not None and shard.n > 1:
        s = jax.lax.psum(s, shard.axis)
        n = n * shard.n
    return s / n


def warp_image(img: jnp.ndarray, motion: jnp.ndarray, shard=None,
               halo: int = 32, radius: int = WARP_RADIUS,
               col_pad: int = WARP_COL_PAD, bilinear: bool = True):
    """Reproject `img` (H, W, C) by `motion` (H, W, 2) = (prev - cur) pixels.

    Returns (H, W, C): img sampled at pixel_center + motion (bilinear or
    nearest), edge-clamped to the framebuffer like the gather formulation.
    Integer dtypes: cast to f32 first and use bilinear=False (one-hot weights
    move values exactly).
    """
    H, W = img.shape[0], img.shape[1]
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    R = radius
    assert halo - R >= 1, "halo must exceed the residual radius"
    y0g = shu.global_y0(shard)
    full_h = shu.full_height(shard, H)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    # continuous source coords in texel space (pixel center + motion - 0.5)
    if bilinear:
        sx = jnp.clip(xs[None, :] + motion[..., 0], 0.0, W - 1.0)
        sy_l = jnp.clip(ys[:, None] + motion[..., 1] + y0g, 0.0,
                        full_h - 1.0) - y0g
    else:
        # nearest: floor(pixel_center + motion) = round-to-texel
        sx = jnp.clip(jnp.floor(xs[None, :] + 0.5 + motion[..., 0]),
                      0.0, W - 1.0)
        sy_l = jnp.clip(jnp.floor(ys[:, None] + 0.5 + motion[..., 1] + y0g),
                        0.0, full_h - 1.0) - y0g

    # global integer shift (consistent across bands)
    gy = jnp.round(_global_mean(sy_l - ys[:, None], shard)).astype(jnp.int32)
    gx = jnp.round(_global_mean(sx - xs[None, :], shard)).astype(jnp.int32)
    gy = jnp.clip(gy, -(halo - R), halo - R - 1)
    gx = jnp.clip(gx, -(col_pad - R), col_pad - R - 1)

    ext = shu.extend_rows(img, halo, shard)                 # (H+2*halo, W, C)
    pad = jnp.pad(ext, ((0, 0), (col_pad, col_pad), (0, 0)), mode="edge")
    win = jax.lax.dynamic_slice(
        pad, (halo + gy - R, col_pad + gx - R, jnp.int32(0)),
        (H + 2 * R + 1, W + 2 * R + 1, img.shape[2]))

    # ---- vertical pass: weights from motion at the tap column -------------
    # (column j of win feeds destinations near x = j - R; edge-pad the motion
    # field so the weights line up — exact wherever motion is locally smooth)
    my_p = jnp.pad(sy_l - ys[:, None], ((0, 0), (R, R + 1)), mode="edge")
    iy = jnp.floor(my_p)
    fy = my_p - iy
    ry = jnp.clip(iy.astype(jnp.int32) - gy, -R, R - 1)
    t = jnp.zeros((H, W + 2 * R + 1, img.shape[2]), img.dtype)
    for d in range(-R, R + 1):
        w = jnp.where(ry == d, 1.0 - fy, 0.0) + jnp.where(ry == d - 1, fy, 0.0)
        t = t + w[..., None] * jax.lax.slice(
            win, (R + d, 0, 0), (R + d + H, W + 2 * R + 1, img.shape[2]))

    # ---- horizontal pass --------------------------------------------------
    rxf = sx - xs[None, :]
    ix = jnp.floor(rxf)
    fx = rxf - ix
    rx = jnp.clip(ix.astype(jnp.int32) - gx, -R, R - 1)
    out = jnp.zeros((H, W, img.shape[2]), img.dtype)
    for e in range(-R, R + 1):
        w = jnp.where(rx == e, 1.0 - fx, 0.0) + jnp.where(rx == e - 1, fx, 0.0)
        out = out + w[..., None] * jax.lax.slice(
            t, (0, R + e, 0), (H, R + e + W, img.shape[2]))
    return out[..., 0] if squeeze else out


