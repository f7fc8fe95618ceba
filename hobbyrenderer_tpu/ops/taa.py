"""Temporal anti-aliasing (FSR3-class accumulate-resolve at native resolution).

Reference: src/TAARenderer.cpp — AMD FSR3 upscaler context in TAA-only mode:
jittered rendering, jitter-cancelled motion vectors, exposure-aware accumulation.
The vendor DLL is reimplemented as a capability (SURVEY.md §7): history
reprojection by motion vectors, 3x3 neighborhood min/max clamp (variance-based),
disocclusion-aware blend, optional sharpening.

Row-band sharding (ops/shard_utils.RowShard): the history fetch and the 3x3
neighborhood reach the adjacent bands through ppermute halos; reprojection
farther than the 32-row halo clamps to the exchanged rows.

The history fetch is the gather-free masked-shift warp (ops/warp.py): a row
gather at 1080p costs ~45 ms on TPU, the warp ~0.3 ms."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import shard_utils as shu
from hobbyrenderer_tpu.ops.warp import warp_image

HISTORY_HALO = 32


def _neighborhood_minmax(c_e, H, W):
    """3x3 min/max per channel over the 1-row-extended domain."""
    mn = -jax.lax.reduce_window(-c_e, -jnp.inf, jax.lax.max, (3, 3, 1),
                                (1, 1, 1), "SAME")[1:1 + H]
    mx = jax.lax.reduce_window(c_e, -jnp.inf, jax.lax.max, (3, 3, 1),
                               (1, 1, 1), "SAME")[1:1 + H]
    return mn, mx


def taa_resolve(hdr: jnp.ndarray, history: jnp.ndarray, motion: jnp.ndarray,
                valid_history, settings, shard=None) -> jnp.ndarray:
    """One TAA step: returns the resolved frame (which is also the new history).

    hdr (H,W,3) jittered current frame; motion (H,W,2) = prev - cur in pixels;
    valid_history: scalar bool (False on reset/first frame); history is this
    band's rows (halos exchanged here when sharded)."""
    H, W = hdr.shape[0], hdr.shape[1]
    y0g = shu.global_y0(shard)
    full_h = shu.full_height(shard, H)
    px = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                                jnp.arange(H, dtype=jnp.float32) + y0g + 0.5,
                                indexing="xy"), -1)
    prev_xy = px + motion
    hist = warp_image(history, motion, shard=shard, halo=HISTORY_HALO)
    # neighborhood clamp (suppresses ghosting)
    hdr_e1 = shu.extend_rows(hdr, 1, shard)
    mn, mx = _neighborhood_minmax(hdr_e1, H, W)
    hist = jnp.clip(hist, mn, mx)
    # disocclusion: off-screen reprojection falls back to current
    on_screen = ((prev_xy[..., 0] >= 0) & (prev_xy[..., 0] < W)
                 & (prev_xy[..., 1] >= 0) & (prev_xy[..., 1] < full_h))
    alpha = jnp.where(on_screen[..., None], settings.taa_blend, 1.0)
    alpha = jnp.where(valid_history, alpha, 1.0)
    out = hist + (hdr - hist) * alpha
    # sharpen (ref sharpness param); settings.sharpness == 0 disables
    out_e1 = shu.extend_rows(out, 1, shard)
    blur = jax.lax.reduce_window(out_e1, 0.0, jax.lax.add,
                                 (3, 3, 1), (1, 1, 1), "SAME")[1:1 + H] / 9.0
    out = out + (out - blur) * settings.sharpness
    return jnp.maximum(out, 0.0)


def taau_resolve(hdr_lr: jnp.ndarray, history: jnp.ndarray,
                 motion_lr: jnp.ndarray, valid_history, settings, jitter,
                 out_h: int, out_w: int) -> jnp.ndarray:
    """TAA UPSCALING step (the FSR3 upscaler capability, ref TAARenderer):
    jittered low-res frame -> full-res output accumulated in a full-res
    history. Returns the resolved full-res frame (= new history).

    hdr_lr (h, w, 3) jittered render; history (out_h, out_w, 3);
    motion_lr (h, w, 2) prev - cur in RENDER pixels; jitter (2,) this frame's
    sub-pixel offset in render pixels.

    TPU shape: the jitter-compensated upsample and the motion upsample are
    jax.image.scale_and_translate (XLA convolutions — no gathers); the
    history fetch reuses the masked-shift warp. Sub-pixel detail accumulates
    because each frame's jitter lands the render samples at different output
    positions, and the per-pixel NEW-SAMPLE CONFIDENCE (distance from the
    output pixel center to the nearest jittered render sample) gates how much
    of the current frame blends in."""
    h, w = hdr_lr.shape[:2]
    sx = out_w / w
    sy = out_h / h
    jx = jitter[0] if hasattr(jitter, "__getitem__") else 0.0
    jy = jitter[1] if hasattr(jitter, "__getitem__") else 0.0
    # render sample i sits at (i + 0.5 + j) render px = ((i + 0.5 + j) * s)
    # output px; scale_and_translate maps in-pixel i to out (i + 0.5) * sx
    # + tx - 0.5, so tx = sx * jx (and likewise ty)
    scale = jnp.asarray([sy, sx], jnp.float32)
    trans = jnp.asarray([sy * jy, sx * jx], jnp.float32)
    cur = jax.image.scale_and_translate(hdr_lr, (out_h, out_w, 3),
                                        (0, 1), scale, trans, method="linear")
    mot = jax.image.scale_and_translate(motion_lr, (out_h, out_w, 2),
                                        (0, 1), scale, trans, method="linear")
    mot = mot * jnp.asarray([sx, sy], jnp.float32)   # motion xy -> output px

    hist = warp_image(history, mot, halo=HISTORY_HALO)
    cur_e1 = jnp.concatenate([cur[:1], cur, cur[-1:]], 0)
    mn, mx = _neighborhood_minmax(cur_e1, out_h, out_w)
    hist = jnp.clip(hist, mn, mx)

    # confidence of the current sample at each output pixel: distance to the
    # nearest jittered render sample (pure arithmetic, no gathers)
    xo = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / sx   # render-space x
    yo = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / sy
    dx = xo - (jnp.floor(xo - 0.5 - jx) + 0.5 + jx)
    dx = jnp.minimum(jnp.abs(dx), jnp.abs(dx - 1.0))
    dy = yo - (jnp.floor(yo - 0.5 - jy) + 0.5 + jy)
    dy = jnp.minimum(jnp.abs(dy), jnp.abs(dy - 1.0))
    d2 = dy[:, None] ** 2 + dx[None, :] ** 2
    conf = jnp.exp(-4.0 * d2)                        # 1 on a sample, ~0.1 far

    px = jnp.stack(jnp.meshgrid(jnp.arange(out_w, dtype=jnp.float32) + 0.5,
                                jnp.arange(out_h, dtype=jnp.float32) + 0.5,
                                indexing="xy"), -1)
    prev_xy = px + mot
    on_screen = ((prev_xy[..., 0] >= 0) & (prev_xy[..., 0] < out_w)
                 & (prev_xy[..., 1] >= 0) & (prev_xy[..., 1] < out_h))
    alpha = settings.taa_blend * (0.25 + 0.75 * conf)[..., None]
    alpha = jnp.where(on_screen[..., None], alpha, 1.0)
    alpha = jnp.where(valid_history, alpha, 1.0)
    out = hist + (cur - hist) * alpha
    blur = jax.lax.reduce_window(
        jnp.concatenate([out[:1], out, out[-1:]], 0), 0.0, jax.lax.add,
        (3, 3, 1), (1, 1, 1), "SAME")[1:1 + out_h] / 9.0
    out = out + (out - blur) * settings.sharpness
    return jnp.maximum(out, 0.0)
