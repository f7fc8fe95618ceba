"""SSGI: screen-space global illumination (the NormalBasic indirect path).

Reference: src/SSGIRenderer.cpp + src/shaders/SSGI.hlsl — half-res screen-space
ray march against the depth buffer, temporal reprojection, edge-aware denoise,
compose (SURVEY.md §2.6 #43).

TPU design: one cosine-sampled march per half-res pixel per frame (temporal
accumulation integrates), marched as K fixed world-space steps projected to
screen against the reversed-Z depth buffer; hits fetch bounce radiance from the
previous frame's lit HDR (the TAA history buffer), misses fall back to sky
irradiance. All taps are bilinear screen-space fetches — regular VPU work.

Row sharding: the march projects to ARBITRARY screen positions (a 4-world-unit
march near the camera can cross the whole frame), so the banded variant taps
the GATHERED full-frame depth + prev-HDR while marching only its band's
half-res pixels; RNG/blue-noise tiling is aligned to GLOBAL rows so
sharded == single."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import ibl as iblops
from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.utils import math as hm

MARCH_STEPS = 8
MARCH_DISTANCE = 4.0      # world units
THICKNESS = 0.35          # relative depth-gap acceptance


def ssgi_half_res(gb, vc, prev_hdr, irr, settings, frame_index, scale: int = 2,
                  shard=None, depth_full=None, prev_hdr_full=None,
                  debug_out: dict = None):
    """Returns (h_band, W, 3) indirect radiance (upsampled from half res).

    Single-chip: gb/prev_hdr are the full frame. Sharded: gb is the device's
    row band; depth_full/prev_hdr_full are the all_gather'd full-frame depth
    and previous lit HDR the march taps (prev_hdr is then unused)."""
    from hobbyrenderer_tpu.ops import shard_utils as shu
    depth_tap = gb.depth if depth_full is None else depth_full
    hdr_tap = prev_hdr if prev_hdr_full is None else prev_hdr_full
    Hf, W = depth_tap.shape
    hb = gb.depth.shape[0]            # band rows (== Hf single-chip)
    y0 = shu.global_y0(shard)
    sh, sw = hb // scale, W // scale
    pos = gb.world_pos[::scale, ::scale][:sh, :sw].reshape(-1, 3)
    nrm = gb.normal[::scale, ::scale][:sh, :sw].reshape(-1, 3)
    valid = gb.valid[::scale, ::scale][:sh, :sw].reshape(-1)
    R = pos.shape[0]
    frame = jnp.asarray(frame_index).astype(jnp.uint32)
    # spatiotemporal blue-noise ray jitter (ref vendored LDR_RG01_0.png blue
    # noise): neighboring pixels get maximally-separated hemisphere samples,
    # so the A-trous/temporal filters see high-frequency error instead of
    # white-noise clumps; golden-ratio rotation keeps the temporal mean flat.
    # The texture is rolled to the band's GLOBAL half-res row so a sharded
    # band reads the same noise as the full-frame tiling.
    from hobbyrenderer_tpu.utils import bluenoise as bn

    def band_noise(seed):
        tex = jnp.asarray(bn.blue_noise(seed=seed))
        tex = jnp.roll(tex, -(y0 // scale) % tex.shape[0], axis=0)
        return bn.tile_for(tex, sh, sw)

    u1 = bn.animate(band_noise(0), frame).reshape(R)
    u2 = bn.animate(band_noise(1),
                    frame * jnp.uint32(7) + jnp.uint32(3)).reshape(R)
    d = smp.to_world(nrm, smp.cosine_sample_hemisphere(u1, u2))

    VP = vc["view_proj_no_jitter"]

    def project(p):
        w = p @ VP[3, :3] + VP[3, 3]
        w = jnp.maximum(w, 1e-6)
        clip = p @ VP[:3, :3].T + VP[:3, 3]
        ndc = clip / w[..., None]
        x = (ndc[..., 0] * 0.5 + 0.5) * W
        y = (0.5 - ndc[..., 1] * 0.5) * Hf
        return x, y, ndc[..., 2]

    hit_col = jnp.zeros((R, 3))
    found = jnp.zeros(R, bool)
    hit_t = jnp.zeros(R)
    # geometric step schedule biased toward the origin
    for k in range(MARCH_STEPS):
        t = MARCH_DISTANCE * ((k + 1) / MARCH_STEPS) ** 2 + 0.05
        p = pos + d * t
        x, y, z = project(p)
        on = (x >= 0) & (x < W) & (y >= 0) & (y < Hf) & (z > 0)
        xi = jnp.clip(x.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(y.astype(jnp.int32), 0, Hf - 1)
        zbuf = depth_tap[yi, xi]
        # reversed-Z: buffer nearer than the ray point -> potential occluder
        hit = on & (zbuf > z) & (zbuf < z * (1.0 + THICKNESS)) & ~found
        col = hdr_tap[yi, xi]
        hit_col = jnp.where(hit[..., None], col, hit_col)
        hit_t = jnp.where(hit, t, hit_t)
        found = found | hit

    # miss -> no contribution: sky visibility is already covered by the IBL
    # ambient term (adding sky here would double-count it)
    radiance = jnp.where(found[..., None], hit_col, 0.0)
    # cosine-sampled single bounce, DEMODULATED: the half-res grid carries
    # irradiance/pi (pdf cancels cos/pi); the geometry-guided upsample then
    # re-applies FULL-res albedo so texture detail never passes through the
    # low-res grid (NRD demodulation convention)
    irr_img = jnp.where(valid[..., None], radiance, 0.0).reshape(sh, sw, 3)
    if debug_out is not None:
        # debug intermediates for ops/debugview.py (ref SSGIDebugMode outputs)
        debug_out["irr_half"] = irr_img
        debug_out["hit"] = found.reshape(sh, sw).astype(jnp.float32)
        debug_out["ray_t"] = (hit_t / MARCH_DISTANCE).reshape(sh, sw)
        debug_out["direct"] = hit_col.reshape(sh, sw, 3)
        # the sky term a missed march WOULD read (ref SSGI_DEBUG_SKY_FALLBACK;
        # here that energy lives in the IBL ambient term — see the miss note
        # above): SH sky irradiance along the marched direction
        debug_out["sky_eval"] = jnp.where(
            valid[..., None], iblops.sample_irradiance(irr, d),
            0.0).reshape(sh, sw, 3)
    irr = irr_img
    if scale > 1:
        from hobbyrenderer_tpu.ops.upsample import joint_bilateral_upsample
        sub = lambda img: img[::scale, ::scale][:sh, :sw]
        irr = joint_bilateral_upsample(
            irr, sub(gb.depth), sub(gb.normal), sub(gb.valid),
            gb.depth, gb.normal, scale, shard=shard)
    ind = jnp.where(gb.valid[..., None], gb.albedo * irr, 0.0)
    return ind
