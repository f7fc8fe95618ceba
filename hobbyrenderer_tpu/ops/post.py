"""HDR post-processing: luminance histogram, auto-exposure, bloom, tonemap.

Reference: src/HDRRenderer.cpp — 256-bin log-luminance histogram over 16x16 tiles
(LuminanceHistogram.hlsl), exposure adaptation with EV100 min/max clamp +
compensation + speed (ExposureAdaptation.hlsl), and tonemapping (Tonemap.hlsl:13-104:
Khronos PBR Neutral + sRGB OETF for SDR); src/BloomRenderer.cpp — 6-mip dual pyramid
with knee prefilter and seeded upsample.

TPU design: the histogram is a segment_sum over bin ids (no atomics); the mip
pyramids are lax.reduce_window / resize chains (the SPD analogue); everything else is
fused elementwise."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.utils import math as hm

HIST_BINS = 256          # ref HDRRenderer.cpp:12-13
LOG_LUM_MIN = -10.0      # ref log range [-10, 20]
LOG_LUM_MAX = 20.0


def luminance_histogram(hdr: jnp.ndarray, min_log: float = LOG_LUM_MIN,
                        max_log: float = LOG_LUM_MAX,
                        stride: int = 2) -> jnp.ndarray:
    """256-bin log2-luminance histogram (ref LuminanceHistogram.hlsl).

    Bin 0 collects near-black pixels, like the reference. Samples every
    `stride`-th pixel — auto-exposure needs a luminance DISTRIBUTION, not
    every pixel, and segment_sum cost scales with element count."""
    if stride > 1 and hdr.ndim == 3:
        hdr = hdr[::stride, ::stride]
    lum = hm.luminance(hdr, xp=jnp)
    loglum = jnp.log2(jnp.maximum(lum, 1e-12))
    t = (loglum - min_log) / (max_log - min_log)
    bins = jnp.clip((t * (HIST_BINS - 2)).astype(jnp.int32) + 1, 1, HIST_BINS - 1)
    bins = jnp.where(lum < 1e-6, 0, bins)
    return jax.ops.segment_sum(jnp.ones_like(lum.reshape(-1)), bins.reshape(-1),
                               num_segments=HIST_BINS)


def exposure_adapt(hist: jnp.ndarray, prev_exposure: jnp.ndarray, dt: float,
                   settings, min_log: float = LOG_LUM_MIN,
                   max_log: float = LOG_LUM_MAX) -> jnp.ndarray:
    """Exposure adaptation (ref ExposureAdaptation.hlsl): histogram-weighted mean
    log-luminance (ignoring bin 0), EV clamp + compensation, exponential approach
    at adaptation_speed. Returns the new 1x1 exposure scale (linear multiplier)."""
    w = hist.at[0].set(0.0)
    total = jnp.maximum(jnp.sum(w), 1.0)
    centers = (jnp.arange(HIST_BINS, dtype=jnp.float32) - 1.0) / (HIST_BINS - 2)
    avg_log = jnp.sum(w * (centers * (max_log - min_log) + min_log)) / total
    # target EV100 from average luminance: EV100 = log2(L * 100 / 12.5)
    avg_lum = jnp.exp2(avg_log)
    ev100 = jnp.log2(avg_lum * 100.0 / 12.5)
    ev100 = ev100 - settings.exposure_compensation
    ev100 = jnp.clip(ev100, -6.0, 17.0)
    target = hm.exposure_from_ev100(ev100, xp=jnp)
    # exponential adaptation (ref adaptation speed)
    a = 1.0 - jnp.exp(-dt * settings.adaptation_speed)
    new = prev_exposure + (target - prev_exposure) * a
    return jnp.asarray(new, jnp.float32)


def _downsample2(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID") * 0.25


def _upsample2(x, out_h, out_w):
    return jax.image.resize(x, (out_h, out_w, x.shape[-1]), method="bilinear")


def bloom(hdr: jnp.ndarray, settings, mips: int = 6) -> jnp.ndarray:
    """Dual-pyramid bloom (ref src/BloomRenderer.cpp: knee prefilter -> 6-mip
    downsample chain -> seeded upsample with radius -> additive composite)."""
    thr = settings.bloom_threshold
    knee = jnp.maximum(settings.bloom_knee * thr, 1e-4)
    lum = hm.luminance(hdr, xp=jnp)[..., None]
    soft = jnp.clip(lum - thr + knee, 0.0, 2.0 * knee)
    soft = soft * soft / (4.0 * knee)
    weight = jnp.maximum(lum - thr, soft) / jnp.maximum(lum, 1e-4)
    pre = hdr * weight

    # pad to pow2-friendly sizes via edge clamp for the chain
    chain = [pre]
    x = pre
    for _ in range(mips):
        h, w = x.shape[0], x.shape[1]
        if h < 4 or w < 4:
            break
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
        x = _downsample2(x)
        chain.append(x)
    # upsample chain with radius-weighted accumulation
    acc = chain[-1]
    for lvl in range(len(chain) - 2, -1, -1):
        up = _upsample2(acc, chain[lvl].shape[0], chain[lvl].shape[1])
        acc = chain[lvl] + up * settings.bloom_radius
    return hdr + acc * settings.bloom_intensity


def bloom_sharded(hdr: jnp.ndarray, settings, shard, full_h: int,
                  mips: int = 6) -> jnp.ndarray:
    """Row-sharded dual-pyramid bloom: the downsample chain and the upsample
    accumulation run on each device's band; only ONE halo row per level
    crosses the band boundary (ppermute), replacing the former
    all_gather-the-frame + replicated-bloom post path.

    Exactness vs bloom(): 2x2 box blocks nest inside the band because the
    flagship mesh guarantees shard_h % TILE == 0 (TILE=32 covers 5 levels;
    deeper levels stop early, see lvl_max). The 2x bilinear upsample is the
    separable half-pixel kernel jax.image.resize applies: out[2i] =
    0.25*in[i-1] + 0.75*in[i]; out[2i+1] = 0.75*in[i] + 0.25*in[i+1], with
    in[] clamped at the GLOBAL image edge (the band edge reads the neighbor's
    row via the halo)."""
    from hobbyrenderer_tpu.ops import shard_utils as shu
    h_band, W = hdr.shape[0], hdr.shape[1]
    # levels must keep 2x2 blocks inside the band AND mirror the single-chip
    # chain's global stop condition (h < 4 or w < 4)
    lvl_max = 0
    hb, hg, wg = h_band, full_h, W
    while (lvl_max < mips and hb % 2 == 0 and hb >= 1
           and hg >= 4 and wg >= 4):
        lvl_max += 1
        hb //= 2
        hg = (hg + hg % 2) // 2
        wg = (wg + wg % 2) // 2

    thr = settings.bloom_threshold
    knee = jnp.maximum(settings.bloom_knee * thr, 1e-4)
    lum = hm.luminance(hdr, xp=jnp)[..., None]
    soft = jnp.clip(lum - thr + knee, 0.0, 2.0 * knee)
    soft = soft * soft / (4.0 * knee)
    weight = jnp.maximum(lum - thr, soft) / jnp.maximum(lum, 1e-4)
    pre = hdr * weight

    is_top = shu.global_y0(shard) == 0
    is_bot = (shu.global_y0(shard) + h_band) == full_h

    chain = [pre]
    x = pre
    for _ in range(lvl_max):
        w = x.shape[1]
        if w % 2:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)), mode="edge")
        x = _downsample2(x)
        chain.append(x)

    def up2_rows(x_band, out_w):
        """2x bilinear upsample of a band with one cross-device halo row."""
        ext = shu.extend_rows(x_band, 1, shard)
        # global-edge clamp (ppermute zero-fills beyond the frame)
        ext = jnp.concatenate([
            jnp.where(is_top, x_band[:1], ext[:1]), ext[1:]], axis=0)
        ext = jnp.concatenate([
            ext[:-1], jnp.where(is_bot, x_band[-1:], ext[-1:])], axis=0)
        a, b, c = ext[:-2], ext[1:-1], ext[2:]
        even = 0.25 * a + 0.75 * b
        odd = 0.75 * b + 0.25 * c
        h2 = x_band.shape[0] * 2
        rows = jnp.stack([even, odd], axis=1).reshape(h2, *x_band.shape[1:])
        # width: same separable half-pixel kernel, clamped at the frame edge
        ew = jnp.concatenate([rows[:, :1], rows, rows[:, -1:]], axis=1)
        aw, bw, cw = ew[:, :-2], ew[:, 1:-1], ew[:, 2:]
        cols = jnp.stack([0.25 * aw + 0.75 * bw, 0.75 * bw + 0.25 * cw],
                         axis=2).reshape(h2, rows.shape[1] * 2,
                                         *x_band.shape[2:])
        return cols[:, :out_w]

    acc = chain[-1]
    for lvl in range(len(chain) - 2, -1, -1):
        up = up2_rows(acc, chain[lvl].shape[1])
        acc = chain[lvl] + up * settings.bloom_radius
    return hdr + acc * settings.bloom_intensity


def tonemap_pbr_neutral(c: jnp.ndarray) -> jnp.ndarray:
    """Khronos PBR Neutral tonemapper (ref Tonemap.hlsl:13-104, SDR path)."""
    start_compression = 0.8 - 0.04
    desaturation = 0.15
    x = jnp.minimum(c[..., 0], jnp.minimum(c[..., 1], c[..., 2]))
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, 0.04)
    c = c - offset[..., None]
    peak = jnp.maximum(c[..., 0], jnp.maximum(c[..., 1], c[..., 2]))
    d = 1.0 - start_compression
    new_peak = 1.0 - d * d / (peak + d - start_compression)
    scale = jnp.where(peak < start_compression, 1.0, new_peak / jnp.maximum(peak, 1e-6))
    c_comp = c * scale[..., None]
    g = jnp.where(peak < start_compression, 0.0,
                  1.0 - 1.0 / (desaturation * (peak - new_peak) + 1.0))
    return jnp.clip(c_comp * (1.0 - g[..., None]) + new_peak[..., None] * g[..., None],
                    0.0, 1.0)


def srgb_oetf(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)


def tonemap_to_output(hdr: jnp.ndarray, exposure) -> jnp.ndarray:
    """Exposure -> PBR Neutral -> sRGB, to uint8 (the backbuffer write)."""
    c = hdr * jnp.asarray(exposure, jnp.float32)
    ldr = srgb_oetf(tonemap_pbr_neutral(c))
    return (jnp.clip(ldr, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
