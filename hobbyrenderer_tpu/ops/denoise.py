"""RELAX-class denoiser for stochastic lighting signals (ReSTIR DI/GI).

Reference: NRD integration (src/NrdIntegration.{h,cpp}, REBLUR/RELAX pipelines
driven per frame after the RTXDI chain, SURVEY.md §2.6 #53). The vendor SDK is
reimplemented as a capability: RELAX's core structure is

  temporal accumulation (motion reprojection, geometry-validated history,
  first+second luminance moments -> variance estimate)
  -> variance-guided A-trous wavelet filtering (edge-stopping on normal,
     depth and luminance).

All stages are regular per-pixel math: reprojection bilinear taps, and the
A-trous taps are static shifts (jnp.roll) — ideal VPU work."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.utils import math as hm


class DenoiseState(NamedTuple):
    color: jnp.ndarray      # (H, W, 3) accumulated signal
    moments: jnp.ndarray    # (H, W, 2) first/second luminance moments
    history: jnp.ndarray    # (H, W) accumulated frame count
    depth: jnp.ndarray      # (H, W) previous depth (validation)
    normal: jnp.ndarray     # (H, W, 3) previous normal (validation)


def denoise_init(h: int, w: int) -> DenoiseState:
    return DenoiseState(color=jnp.zeros((h, w, 3), jnp.float32),
                        moments=jnp.zeros((h, w, 2), jnp.float32),
                        history=jnp.zeros((h, w), jnp.float32),
                        depth=jnp.zeros((h, w), jnp.float32),
                        normal=jnp.zeros((h, w, 3), jnp.float32))


def _bilinear(img, xy, H, W):
    x = jnp.clip(xy[..., 0] - 0.5, 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1] - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[..., None] if img.ndim == 3 else (x - x0)
    fy = (y - y0)[..., None] if img.ndim == 3 else (y - y0)
    return ((img[y0, x0] * (1 - fx) + img[y0, x1] * fx) * (1 - fy)
            + (img[y1, x0] * (1 - fx) + img[y1, x1] * fx) * fy)


def temporal_accumulate(signal, gb, state: DenoiseState,
                        max_history: float = 32.0):
    """RELAX temporal pass: reproject, validate by depth+normal, blend with
    1/(history+1), accumulate luminance moments."""
    H, W = signal.shape[0], signal.shape[1]
    px = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                                jnp.arange(H, dtype=jnp.float32) + 0.5,
                                indexing="xy"), -1)
    prev_xy = px + gb.motion
    on = ((prev_xy[..., 0] >= 0) & (prev_xy[..., 0] < W)
          & (prev_xy[..., 1] >= 0) & (prev_xy[..., 1] < H))
    pc = _bilinear(state.color, prev_xy, H, W)
    pm = _bilinear(state.moments, prev_xy, H, W)
    ph = _bilinear(state.history, prev_xy, H, W)
    pd = _bilinear(state.depth, prev_xy, H, W)
    pn = _bilinear(state.normal, prev_xy, H, W)

    # geometry validation (ref disocclusion test)
    dep_ok = jnp.abs(pd - gb.depth) < 0.1 * jnp.maximum(gb.depth, 1e-3)
    nrm_ok = jnp.sum(hm.normalize(pn, xp=jnp) * gb.normal, -1) > 0.8
    valid = on & dep_ok & nrm_ok & gb.valid & (ph > 0)

    hist = jnp.where(valid, jnp.minimum(ph + 1.0, max_history), 1.0)
    a = (1.0 / hist)[..., None]
    color = jnp.where(valid[..., None], pc + (signal - pc) * a, signal)
    lum = hm.luminance(signal, xp=jnp)
    mom_new = jnp.stack([lum, lum * lum], -1)
    moments = jnp.where(valid[..., None], pm + (mom_new - pm) * a, mom_new)
    new_state = DenoiseState(color=color, moments=moments, history=hist,
                             depth=gb.depth, normal=gb.normal)
    var = jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0)
    # boost variance for young history (ref history-length-driven blur)
    var = var * (1.0 + 4.0 / jnp.maximum(hist, 1.0))
    return color, var, new_state


_KERNEL = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]


def atrous_filter(color, var, gb, iterations: int = 3,
                  sigma_z: float = 1.0, sigma_n: float = 64.0,
                  sigma_l: float = 4.0):
    """Edge-aware A-trous wavelet chain (ref RELAX/SVGF spatial filter)."""
    H, W = color.shape[0], color.shape[1]
    lum_c = hm.luminance(color, xp=jnp)
    for it in range(iterations):
        step = 1 << it
        acc = color * _KERNEL[2] * _KERNEL[2]
        acc_w = jnp.full((H, W), _KERNEL[2] * _KERNEL[2])
        acc_v = var * (_KERNEL[2] * _KERNEL[2]) ** 2
        std = jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-4
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                if dx == 0 and dy == 0:
                    continue
                k = _KERNEL[dy + 2] * _KERNEL[dx + 2]
                sc = jnp.roll(color, (-dy * step, -dx * step), axis=(0, 1))
                sv = jnp.roll(var, (-dy * step, -dx * step), axis=(0, 1))
                sn = jnp.roll(gb.normal, (-dy * step, -dx * step), axis=(0, 1))
                sd = jnp.roll(gb.depth, (-dy * step, -dx * step), axis=(0, 1))
                sl = jnp.roll(lum_c, (-dy * step, -dx * step), axis=(0, 1))
                w_n = jnp.power(jnp.maximum(jnp.sum(sn * gb.normal, -1), 0.0), sigma_n)
                w_z = jnp.exp(-jnp.abs(sd - gb.depth)
                              / (sigma_z * 0.05 * jnp.maximum(gb.depth, 1e-3) * step + 1e-6))
                w_l = jnp.exp(-jnp.abs(sl - hm.luminance(color, xp=jnp))
                              / (sigma_l * std + 1e-4))
                w = k * w_n * w_z * w_l
                acc = acc + sc * w[..., None]
                acc_w = acc_w + w
                acc_v = acc_v + sv * w * w
        color = acc / jnp.maximum(acc_w[..., None], 1e-6)
        var = acc_v / jnp.maximum(acc_w * acc_w, 1e-6)
        lum_c = hm.luminance(color, xp=jnp)
    return color


def denoise(signal, gb, state: DenoiseState):
    """Full RELAX-class chain. Returns (denoised, new_state)."""
    color, var, new_state = temporal_accumulate(signal, gb, state)
    out = atrous_filter(color, var, gb)
    return out, new_state
