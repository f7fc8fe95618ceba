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
