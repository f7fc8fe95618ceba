"""Traced specular indirect: BRDF-sampled reflection rays for glossy pixels.

Reference: the specular half of the RTXDI GI pipeline — BrdfRayTracing samples
a GGX-VNDF half-vector, traces the reflected ray, and ShadeSecondarySurfaces
shades the hit (src/RTXDIRenderer.cpp:2218-2235, shaders/rtxdi/LightingPasses/
BrdfRayTracing.hlsl). Without it, glossy surfaces only get the split-sum
environment term — mirrors never show geometry, lamps, or the sun.

TPU design: the reference resolves specular per-pixel full-res with RT cores;
here reflection rays ride the sorted-block Pallas traversal (ops/trace.py) at
half resolution, one VNDF sample per pixel per frame, denoised by the same
RELAX machinery as the diffuse signals (temporal accumulation + a short
roughness-aware A-trous) and bilinearly upsampled. Where this pass is active
(roughness below `rough_max`) it REPLACES the split-sum IBL specular ambient —
the traced result includes the environment on miss, and adds what split-sum
cannot: reflected geometry, emitters, and correct occlusion. The two blend
over a smoothstep band so the handoff is invisible.

Delta surfaces (roughness < DELTA_ROUGHNESS) reflect the exact mirror
direction with weight = Fresnel only (ref isDeltaSurface) and keep emitters
visible in the reflection (ref includeEmissiveComponent)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.ops import shard_utils as shu
from hobbyrenderer_tpu.ops.denoise import (DenoiseState, atrous_filter,
                                           denoise_init, temporal_accumulate)
from hobbyrenderer_tpu.ops.intersect import offset_ray_origin
from hobbyrenderer_tpu.ops.shading import brdf_params, fresnel_schlick
from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

DELTA_ROUGHNESS = 0.03      # below: mirror path (ref kMinRoughness)
ROUGH_MAX = 0.50            # above: split-sum ambient only
FADE_BAND = 0.12            # smoothstep handoff width in roughness
MAX_RADIANCE = 10.0         # firefly clamp (ref c_MaxIndirectRadiance)


class _SubGB:
    """The four G-buffer fields the denoiser reads, at the spec grid res."""

    def __init__(self, motion, depth, normal, valid):
        self.motion, self.depth = motion, depth
        self.normal, self.valid = normal, valid


def spec_state_init(height: int, width: int, scale: int = 2) -> DenoiseState:
    return denoise_init(height // scale, width // scale)


def spec_blend_weight(roughness, rough_max: float = ROUGH_MAX):
    """(H, W) in [0, 1]: 1 = traced specular, 0 = split-sum ambient."""
    t = (rough_max - roughness) / FADE_BAND
    t = jnp.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def specular_indirect(gpu, rt, gb, vc, settings, state: DenoiseState,
                      frame_index, *, scale: int = 2,
                      rough_max: float = ROUGH_MAX, env_fn=None,
                      sun_dir=None, sharc_cache=None, shard=None,
                      skip_pool_emissive: bool = False,
                      include_env_miss: bool = True,
                      sky_sh=None, ibl_scale=1.0,
                      half_rate: bool = False):
    """One traced-specular frame. Returns (spec (H, W, 3) full-res PREMULTIPLIED
    by the blend weight, weight (H, W), new DenoiseState (half-res)).

    skip_pool_emissive: mirror NON-delta rays feed rough reflections that
    overlap what ReSTIR DI resolves at the receiver only for the DIRECT light;
    reflections of emitter SURFACES are separate transport, so emissive always
    counts here (ref includeEmissiveComponent applies it on delta rays; our
    reservoir-free pass shades every ray directly, so it applies everywhere).
    sharc_cache: optional SHARC hash grid — adds cached multi-bounce exitance
    at the hit (ref the SHARC-assisted secondary shading mode)."""
    H, W = gb.depth.shape
    Hs, Ws = H // scale, W // scale
    R = Hs * Ws
    gshard = None
    if shard is not None:
        gshard = shard._replace(y0=shard.y0 // scale, shard_h=Hs,
                                full_h=shard.full_h // scale)
    gy0 = shu.global_y0(gshard)
    frame = jnp.asarray(frame_index).astype(jnp.uint32)

    sub = lambda img: img[::scale, ::scale][:Hs, :Ws]
    pos = sub(gb.world_pos).reshape(R, 3)
    n = sub(gb.normal).reshape(R, 3)
    gn = sub(gb.geo_normal).reshape(R, 3)
    valid = sub(gb.valid).reshape(R)
    rough = sub(gb.orm[..., 1]).reshape(R)
    metal = sub(gb.orm[..., 2]).reshape(R)
    albedo = sub(gb.albedo).reshape(R, 3)

    ly = jnp.arange(R, dtype=jnp.int32) // Ws
    pix = ((ly + gy0) * Ws + jnp.arange(R, dtype=jnp.int32) % Ws) \
        .astype(jnp.uint32)

    cam = vc["camera_pos"]
    v = hm.normalize(cam[None, :] - pos, xp=jnp)
    nov = jnp.sum(n * v, -1)

    # ---- GGX-VNDF half-vector sample (ref sampleGGX_VNDF in BrdfRayTracing) --
    _, f0, alpha = brdf_params(albedo, metal, rough)
    bits = pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                            jnp.full_like(pix, 610)], -1))
    u1 = uniform_from_bits(bits[..., 0])
    u2 = uniform_from_bits(bits[..., 1])
    v_loc = smp.to_local(n, v)
    h_loc = smp.sample_ggx_vndf(v_loc, alpha, u1, u2)
    delta = rough < DELTA_ROUGHNESS
    h = jnp.where(delta[..., None], n, smp.to_world(n, h_loc))
    d = hm.reflect(-v, h, xp=jnp)
    d = hm.normalize(d, xp=jnp)

    # estimator weight for VNDF reflection sampling: F(h·v) * G2/G1 (the
    # exact BRDF/pdf ratio; the reference approximates with F * G1).
    # Delta surfaces: pure Fresnel.
    hov = jnp.maximum(jnp.sum(h * v, -1), 0.0)
    ndl = jnp.sum(n * d, -1)
    F = fresnel_schlick(hov[..., None], f0)
    g2g1 = smp.smith_g2_over_g1(jnp.maximum(nov, 1e-4),
                                jnp.maximum(ndl, 1e-4), alpha)
    weight = jnp.where(delta[..., None], F, F * g2g1[..., None])

    active = (valid & (rough < rough_max) & (nov > 1e-4)
              & (jnp.sum(gn * d, -1) > 0.0) & (ndl > 0.0))
    # half-rate checkerboard (ref rtxdi::CheckerboardMode as a perf preset
    # lever): only alternating-parity spec-grid pixels trace this frame; the
    # temporal pass carries the off-parity lanes' history forward. GLOBAL
    # parity so the sharded frame traces the same lanes as single-chip.
    if half_rate:
        gx = jnp.arange(R, dtype=jnp.int32) % Ws
        parity = (((ly + gy0) + gx + jnp.asarray(frame_index)
                   .astype(jnp.int32)) & 1) == 0
        active &= parity
    o = offset_ray_origin(pos, gn, d)

    # ---- compact the active lanes before tracing ----------------------------
    # Only ~10-30% of pixels are glossy (measured 0.20 on the stress scene),
    # but a masked lockstep trace pays EVERY phase for every lane, and the
    # hit shading below (attr fetch, NEE + shadow ray, SHARC probe) costs
    # R-row gathers regardless of the mask. Compacting actives into a
    # quarter-capacity wavefront cuts the whole secondary-surface chain ~4x
    # (measured 1.55 s -> see README journal). Lanes past CAP (glossier
    # scenes) fall back to the unoccluded environment sample — exactly the
    # split-sum term this pass replaces — instead of going black.
    CAP = max(R // 8 if half_rate else R // 4, 1024)
    rank = jnp.cumsum(active.astype(jnp.int32)) - 1
    slot = jnp.where(active & (rank < CAP), rank, CAP)
    sel = jnp.full((CAP + 1,), R, jnp.int32) \
        .at[slot].set(jnp.arange(R, dtype=jnp.int32))[:CAP]
    pad = sel >= R
    sel_c = jnp.minimum(sel, R - 1)
    take = lambda a: jnp.where(pad.reshape((-1,) + (1,) * (a.ndim - 1)),
                               0, a[sel_c])
    o_c, d_c, pix_c = take(o), take(d), take(pix)
    delta_c = take(delta)

    from hobbyrenderer_tpu.ops import trace as traceops
    # capped step budget: glossy reflection rays converge in far fewer steps
    # than the worst-case PT budget; one straggler must not spin the phase
    # tail of the wavefront
    hit = traceops.closest_hit_auto(rt, o_c, d_c, active=~pad, max_steps=512)

    # ---- shade the secondary surface (ref ShadeSecondarySurfaces) ----------
    # emissive + one power-CDF NEE sample with a shadow ray, shared with the
    # GI bounce (restir_gi._hit_radiance)
    # pooled-emitter Le through a GLOSSY reflection is already resolved by
    # ReSTIR DI's specular lobe at the receiver — skip it there; MIRROR
    # (delta) lanes keep it: DI cannot represent a delta lobe, and lamps must
    # be visible in mirrors (ref includeEmissiveComponent)
    skip_mask = (~delta_c if skip_pool_emissive else
                 jnp.zeros_like(delta_c))
    from hobbyrenderer_tpu.ops.restir_gi import _hit_radiance
    hpos, hnrm, hrad = _hit_radiance(gpu, rt, rt.lights, hit, o_c, d_c,
                                     pix_c + jnp.uint32(0x53EC), frame,
                                     skip_pool_emissive=skip_mask,
                                     sky_sh=sky_sh, ibl_scale=ibl_scale)
    if sharc_cache is not None:
        from hobbyrenderer_tpu.ops.sharc import sharc_query
        fb, fb_ok = sharc_query(sharc_cache, hpos, hnrm, cam)
        hrad = hrad + jnp.where((fb_ok & (hit.tri >= 0))[..., None], fb, 0.0)

    # miss -> environment (what split-sum sampled; now correctly occluded).
    # include_env_miss=False when the environment rides the ReSTIR light pool
    # (--env-lights): DI already resolves its specular at the receiver.
    if not include_env_miss:
        env_r = jnp.zeros((R, 3), jnp.float32)
    elif env_fn is not None:
        env_r = env_fn(d)
    else:
        from hobbyrenderer_tpu.ops import sky as skyops
        env_r = skyops.sky_radiance_fast(d, sun_dir, settings,
                                         with_sun_disk=True)
    hit_rad_c = jnp.where((hit.tri >= 0)[..., None], hrad, 0.0)
    hit_ok_c = hit.tri >= 0
    # scatter the compacted hit results back to the full spec grid; lanes
    # that never traced (inactive or past CAP) read the env term below
    hit_rad = jnp.zeros((R, 3), jnp.float32) \
        .at[sel].set(jnp.where(pad[:, None], 0.0, hit_rad_c), mode="drop")
    hit_ok = jnp.zeros((R,), bool).at[sel].set(hit_ok_c & ~pad, mode="drop")
    radiance = jnp.where(hit_ok[..., None], hit_rad, env_r)
    # firefly clamp before weighting (ref c_MaxIndirectRadiance)
    lum = hm.luminance(radiance, xp=jnp)
    radiance = radiance * (jnp.minimum(lum, MAX_RADIANCE)
                           / jnp.maximum(lum, 1e-6))[..., None]
    spec = jnp.where(active[..., None], weight * radiance, 0.0)
    # demodulate by F0 before the filter chain (the NRD specular
    # demodulation): for metals F0 carries the albedo texture — filtering
    # the demodulated signal keeps that detail at FULL res via the
    # remodulation below; the 0.02 floor bounds the dielectric ratio
    mod_s = f0 + 0.02
    spec = (spec / mod_s).reshape(Hs, Ws, 3)

    # ---- denoise at the spec grid (RELAX temporal + short A-trous) ---------
    sgb = _SubGB(motion=sub(gb.motion) / float(scale), depth=sub(gb.depth),
                 normal=sub(gb.normal), valid=sub(gb.valid))
    # mirror-like pixels keep a short history (reflections move with the
    # camera; long histories ghost), rough pixels accumulate long
    sv = (parity.reshape(Hs, Ws) if half_rate else None)
    color, var, new_state = temporal_accumulate(spec, sgb, state,
                                                max_history=8.0, shard=gshard,
                                                sample_valid=sv)
    r_px = (4.0 * jnp.clip(sub(gb.orm[..., 1]) / rough_max, 0.05, 1.0)
            * 8.0 / (1.0 + new_state.history))
    color = atrous_filter(color, var, sgb, iterations=2, shard=gshard,
                          radius_px=jnp.maximum(r_px, 0.5))

    from hobbyrenderer_tpu.ops.upsample import joint_bilateral_upsample
    full = joint_bilateral_upsample(color, sgb.depth, sgb.normal, sgb.valid,
                                    gb.depth, gb.normal, scale, shard=shard)
    _, f0_full, _ = brdf_params(gb.albedo, gb.orm[..., 2], gb.orm[..., 1])
    full = full * (f0_full + 0.02)
    w_blend = spec_blend_weight(gb.orm[..., 1], rough_max) \
        * gb.valid.astype(jnp.float32)
    return full * w_blend[..., None], w_blend, new_state
