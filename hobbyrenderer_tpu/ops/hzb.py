"""Hierarchical Z-buffer (HZB) construction.

Reference: HZB generation via pow2 downsample + SPD min-reduction
(src/BasePassRenderer.cpp:58-107, src/shaders/ResizeToNextLowestPowerOfTwo.hlsl,
SPD.hlsl) — the occlusion pyramid for two-phase GPU culling (GPUCulling.hlsl:9-21).

TPU build: reversed-Z means the CONSERVATIVE reduction is min (farthest depth in
the footprint). The pyramid is a padded (levels, H0, W0) stack — each level lives
in the top-left corner at its own resolution — so the culling test can gather from
a single array with a dynamic level index (static shapes; the memory overhead is
levels x level0, ~4 MB x L at 1080p half-res)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.utils.math import prev_pow2


def hzb_sizes(width: int, height: int):
    """Level-0 pow2 size + level count for a given framebuffer."""
    w0 = prev_pow2(width)
    h0 = prev_pow2(height)
    levels = max(min(w0, h0).bit_length() - 1, 1)
    levels = min(levels, 12)
    return h0, w0, int(levels)


def build_hzb(depth: jnp.ndarray, levels: int, h0: int, w0: int) -> jnp.ndarray:
    """depth (H, W) reversed-Z -> (levels, h0, w0) min-pyramid stack.

    Level 0 is a conservative min-downsample of the full-res depth to (h0, w0);
    each next level halves with a 2x2 min (SPD-style reduction chain — XLA's
    reduce_window replaces the single-dispatch atomic-counter SPD)."""
    H, W = depth.shape
    # conservative fixed-stride fold to <= pow2: texel x covers source columns
    # [x*fx, (x+1)*fx), so the IMAGE occupies the left ceil(W/fx) texels of
    # each level (the rest is far=0 padding). hzb_effective_size() gives the
    # occupied extent — occlusion lookups MUST map uv through it, not through
    # (h0, w0) (that skew caused false culls when W < fx*w0).
    fy = -(-H // h0)
    fx = -(-W // w0)
    padded = jnp.pad(depth, ((0, fy * h0 - H), (0, fx * w0 - W)),
                     constant_values=0.0)  # 0 = far (reversed-Z): conservative
    lvl = jax.lax.reduce_window(padded, jnp.inf, jax.lax.min,
                                (fy, fx), (fy, fx), "VALID")
    lvl = jnp.where(jnp.isfinite(lvl), lvl, 0.0)

    out = jnp.zeros((levels, h0, w0), jnp.float32)
    out = out.at[0, :h0, :w0].set(lvl)
    h, w = h0, w0
    for li in range(1, levels):
        h, w = max(h // 2, 1), max(w // 2, 1)
        lvl = jax.lax.reduce_window(lvl, jnp.inf, jax.lax.min,
                                    (2, 2), (2, 2), "VALID")
        out = out.at[li, :h, :w].set(lvl)
    return out


def hzb_effective_size(width: int, height: int):
    """(he0, we0): the level-0 texel extent actually covered by the image
    (floats; level L covers he0/2^L x we0/2^L). See build_hzb."""
    h0, w0, _ = hzb_sizes(width, height)
    fy = -(-height // h0)
    fx = -(-width // w0)
    return height / fy, width / fx
