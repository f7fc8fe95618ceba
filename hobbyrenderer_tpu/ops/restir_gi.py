"""ReSTIR GI: reservoir-resampled one-bounce indirect illumination.

Reference: the GI half of src/RTXDIRenderer.cpp (:2256-2293 — GI temporal /
spatial resampling + final shading passes; algorithm: Ouyang et al. 2021
"ReSTIR GI: Path Resampling for Real-Time Path Tracing").

TPU build: GI runs on a 1/gi_scale grid (ray budget: the software BVH wavefront
is the cost ceiling — SURVEY.md §7). Per GI pixel and frame, ONE cosine-sampled
bounce ray produces a sample point (hit position, hit normal, outgoing radiance
via next-event estimation at the hit). Reservoirs carry the full sample so
temporal + spatial reuse multiply the effective sample count; reuse across
surfaces applies the solid-angle Jacobian of the reconnection shift (Ouyang
§4.3). A final receiver-side visibility ray kills stale samples. Upsampled
bilinearly; the temporal accumulation + TAA hide the grid."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import lights as lightops
from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops import shard_utils as shu
from hobbyrenderer_tpu.ops.intersect import offset_ray_origin
from hobbyrenderer_tpu.ops.warp import warp_image
from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

GI_M_CLAMP = 12.0
GI_SPATIAL_TAPS = 4     # taps are one dynamic_slice each (frame-wide offsets)
GI_SPATIAL_RADIUS = 12.0    # GI-grid pixels
GI_HALO = 16                # GI-grid halo rows (>= spatial radius)


class GIReservoir(NamedTuple):
    """Per-GI-pixel path-sample reservoir (ref RTXDI GI reservoir buffers)."""

    pos: jnp.ndarray      # (H, W, 3) sample (hit) position
    nrm: jnp.ndarray      # (H, W, 3) sample surface normal
    rad: jnp.ndarray      # (H, W, 3) outgoing radiance at sample -> receiver
    w_sum: jnp.ndarray    # (H, W)  (intra-frame only: temporal reuse
    #                       re-derives it from W*M*p-hat; kept for pytree
    #                       stability of the persistent state)
    M: jnp.ndarray        # (H, W)
    W: jnp.ndarray        # (H, W)


def gi_reservoir_init(h: int, w: int) -> GIReservoir:
    return GIReservoir(pos=jnp.zeros((h, w, 3), jnp.float32),
                       nrm=jnp.zeros((h, w, 3), jnp.float32),
                       rad=jnp.zeros((h, w, 3), jnp.float32),
                       w_sum=jnp.zeros((h, w), jnp.float32),
                       M=jnp.zeros((h, w), jnp.float32),
                       W=jnp.zeros((h, w), jnp.float32))


def _rand(pix, frame, dim):
    bits = pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                            jnp.full_like(pix, dim)], -1))
    return (uniform_from_bits(bits[..., 0]), uniform_from_bits(bits[..., 1]),
            uniform_from_bits(bits[..., 2]))


def _hit_radiance(gpu, rt, pool, hit, o, d, pix, frame,
                  skip_pool_emissive: bool = False,
                  sky_sh=None, ibl_scale=1.0):
    """Outgoing radiance at the bounce hit toward -d: emissive + one
    power-presampled NEE light sample with a shadow ray (the GI sample's
    initial radiance, ref the GI initial-sampling pass).

    sky_sh (9, 3) optional: adds the diffuse sky/IBL exitance at the hit
    (albedo * irradiance/pi, Lambertian) — the path sky -> hit -> receiver
    that PT integrates and NEE alone cannot see. Without it, reflections and
    GI bounces off sky-lit geometry come out dark (measured: the traced
    specular pass REGRESSED flagship-vs-PT RMSE 0.123 -> 0.141 before this,
    because it replaced the split-sum env term with darker-than-truth hits)."""
    from hobbyrenderer_tpu.models.pathtracer import _fetch_hit_attrs
    from hobbyrenderer_tpu.scene.gpu import (MAT_BASE_COLOR, MAT_EMISSIVE,
                                             MAT_METALLIC, MAT_ROUGHNESS)
    p, n_s, _gn, _uv, hmat, _hi = _fetch_hit_attrs(gpu, rt, hit, o, d)
    mf = gpu.mat_f[hmat]
    albedo = mf[:, MAT_BASE_COLOR:MAT_BASE_COLOR + 3]
    emissive = mf[:, MAT_EMISSIVE:MAT_EMISSIVE + 3]
    rough = mf[:, MAT_ROUGHNESS]
    metal = mf[:, MAT_METALLIC]

    u1, u2, u3 = _rand(pix, frame, 520)
    tile_ids, tile_inv = lightops.presample_lights(pool, frame, n_tiles=16,
                                                   tile_size=64)
    T, S = tile_ids.shape
    tile = (pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                             jnp.full_like(pix, 9)], -1))[..., 0] % T
            ).astype(jnp.int32)
    slot = jnp.minimum((u1 * S).astype(jnp.int32), S - 1)
    li = tile_ids[tile, slot]
    inv_pdf = tile_inv[tile, slot]
    uv = jnp.stack([u2, u3], -1)
    L, rad_l, dist = lightops.pool_light_incident_packed(pool, li, uv, p)
    f = shadeops.eval_brdf(n_s, -d, L, albedo, metal, rough)
    direct = f * rad_l * inv_pdf[..., None]
    # NEE shadow ray
    so = offset_ray_origin(p, n_s, L)
    shoot = (hit.tri >= 0) & (li >= 0) & (hm.luminance(direct, xp=jnp) > 0)
    from hobbyrenderer_tpu.ops.intersect import retarget_shadow_ray
    L_v, tmax_t = retarget_shadow_ray(p, so, L, dist)
    # bounce-hit NEE shadow rays are incoherent: sorted-block kernel on TPU
    from hobbyrenderer_tpu.ops import trace as traceops
    occ = traceops.any_hit_auto(rt, so, L_v,
                                t_max=jnp.where(shoot, tmax_t, 1e-4),
                                active=shoot, max_steps=256)
    direct = jnp.where((occ | ~shoot)[..., None], 0.0, direct)
    # emissive triangles that live in the DI light pool are ALREADY sampled
    # by ReSTIR DI at the receiver — counting their Le here too double-lights
    # surfaces near emissive panels. Pooled hits contribute only their
    # reflected light; emitters OUTSIDE the pool keep their Le. Only valid
    # when the receiver's direct mode IS ReSTIR (callers pass the flag; with
    # simple direct lighting the GI ray is the ONLY emissive transport).
    # May be a per-lane bool mask (ops/specular.py: mirror lanes keep Le —
    # ref BrdfRayTracing's includeEmissiveComponent on delta rays).
    skip_any = (skip_pool_emissive if isinstance(skip_pool_emissive, bool)
                else True)
    if skip_any and getattr(rt, "em_index", None) is not None:
        e_idx = rt.em_index[rt.split_to_orig[jnp.maximum(hit.tri, 0)]]
        emissive = jnp.where(((e_idx >= 0) & skip_pool_emissive)[..., None],
                             0.0, emissive)
    rad_out = emissive + direct
    if sky_sh is not None:
        from hobbyrenderer_tpu.ops.ibl import sample_irradiance
        amb = (albedo * (1.0 - metal)[..., None]
               * jnp.maximum(sample_irradiance(sky_sh, n_s), 0.0) * ibl_scale)
        rad_out = rad_out + amb
    return p, n_s, jnp.where((hit.tri >= 0)[..., None], rad_out, 0.0)


def _jacobian(recv_pos, s_pos, s_nrm, src_pos):
    """Solid-angle Jacobian of reconnecting sample s (seen from src surface)
    to the receiver surface (Ouyang et al. §4.3), clamped for stability."""
    to_r = s_pos - recv_pos
    to_s = s_pos - src_pos
    d2_r = jnp.maximum(jnp.sum(to_r * to_r, -1), 1e-6)
    d2_s = jnp.maximum(jnp.sum(to_s * to_s, -1), 1e-6)
    cos_r = jnp.abs(jnp.sum(s_nrm * to_r, -1)) / jnp.sqrt(d2_r)
    cos_s = jnp.abs(jnp.sum(s_nrm * to_s, -1)) / jnp.sqrt(d2_s)
    J = (cos_r / jnp.maximum(cos_s, 1e-4)) * (d2_s / d2_r)
    return jnp.clip(J, 0.0, 10.0)


def restir_gi(gpu, rt, gb, vc, settings, prev: GIReservoir, frame_index,
              scale: int = 4, pool=None, shard=None, half_rate: bool = False,
              trace_max_steps: int = None,
              skip_pool_emissive: bool = False, stats_out: dict = None,
              sky_sh=None, ibl_scale=1.0,
              spatial_taps: int = GI_SPATIAL_TAPS,
              m_clamp: float = GI_M_CLAMP):
    """One ReSTIR GI frame at 1/scale res. Returns (indirect (H, W, 3)
    full-res diffuse indirect, new GIReservoir (Hg, Wg)). shard: optional
    FULL-RES RowShard; the GI grid shards with it (shard_h % scale == 0).

    half_rate: trace NEW bounce rays on alternating frames only (odd frames
    are temporal-reservoir playback; the wavefront BVH walk — the pass's cost
    ceiling — executes every other frame via lax.cond), the ray-budget trade
    the reference exposes as checkerboard modes (src/RTXDIRenderer.cpp:96-247).
    trace_max_steps: optional traversal step cap for the bounce rays (GI
    tolerates a truncated far tail: the final visibility ray still kills
    occluded samples)."""
    H, W = gb.depth.shape
    Hg, Wg = H // scale, W // scale
    R = Hg * Wg
    gshard = None
    if shard is not None:
        gshard = shard._replace(y0=shard.y0 // scale, shard_h=Hg,
                                full_h=shard.full_h // scale)
    gy0 = shu.global_y0(gshard)
    gfull_h = shu.full_height(gshard, Hg)
    frame = jnp.asarray(frame_index).astype(jnp.uint32)
    ly = jnp.arange(R, dtype=jnp.int32) // Wg
    lx = jnp.arange(R, dtype=jnp.int32) % Wg
    ggy = ly + gy0
    # RNG keyed on GLOBAL GI-pixel id (sharded == single sample sequences)
    pix = (ggy * Wg + lx).astype(jnp.uint32)
    if pool is None:
        pool = getattr(rt, "lights", None)
    assert pool is not None, "ReSTIR GI needs rt.lights"

    sub = lambda img: img[::scale, ::scale][:Hg, :Wg]
    pos = sub(gb.world_pos).reshape(R, 3)
    n = sub(gb.normal).reshape(R, 3)
    gn = sub(gb.geo_normal).reshape(R, 3)
    valid = sub(gb.valid).reshape(R)

    # ---- initial sample: one cosine bounce ray ----
    u1, u2, u3 = _rand(pix, frame, 500)
    d_local = smp.cosine_sample_hemisphere(u1, u2)
    d = smp.to_world(n, d_local)
    o = offset_ray_origin(pos, gn, d)
    if half_rate:
        # frame-alternating trace: even frames trace the WHOLE GI grid, odd
        # frames are pure temporal playback (lax.cond — the untaken branch
        # does not execute, so the two BVH traversals run every OTHER frame).
        # Uniform across pixels, so the temporal/spatial M dynamics match the
        # full-rate chain exactly (a pixel-interlaced variant was measured
        # ~12% dark: M-clamped history weighting went parity-asymmetric).
        active = (frame % 2) == 0      # scalar

        def trace(_):
            from hobbyrenderer_tpu.ops import trace as traceops
            hit = traceops.closest_hit_auto(rt, o, d,
                                            max_steps=trace_max_steps,
                                            active=valid)
            sp, sn, sr = _hit_radiance(gpu, rt, pool, hit, o, d, pix, frame,
                                       skip_pool_emissive=skip_pool_emissive,
                                       sky_sh=sky_sh, ibl_scale=ibl_scale)
            return sp, sn, sr, hit.tri

        def skip(_):
            return (jnp.zeros((R, 3)), jnp.zeros((R, 3)), jnp.zeros((R, 3)),
                    jnp.full((R,), -1, jnp.int32))

        s_pos, s_nrm, s_rad, hit_tri = jax.lax.cond(active, trace, skip, None)
        ok0 = valid & (hit_tri >= 0)
    else:
        from hobbyrenderer_tpu.ops import trace as traceops
        hit = traceops.closest_hit_auto(rt, o, d, max_steps=trace_max_steps,
                                        active=valid)
        s_pos, s_nrm, s_rad = _hit_radiance(
            gpu, rt, pool, hit, o, d, pix, frame,
            skip_pool_emissive=skip_pool_emissive,
            sky_sh=sky_sh, ibl_scale=ibl_scale)
        ok0 = valid & (hit.tri >= 0)
    # target p_hat = luminance of incoming radiance (receiver-BRDF-free,
    # Ouyang §4.1); candidate pdf = cos/pi cancels against the cosine in the
    # integrand only at FINAL shading, so keep both explicit:
    cos0 = jnp.maximum(jnp.sum(d * n, -1), 0.0)
    pdf0 = jnp.maximum(cos0 / jnp.pi, 1e-4)
    ph0 = jnp.where(ok0, hm.luminance(s_rad, xp=jnp), 0.0)
    w0 = jnp.where(ok0, ph0 / pdf0, 0.0)

    y_pos, y_nrm, y_rad = s_pos, s_nrm, s_rad
    w_sum = w0
    # an un-traced (playback) frame drew NO candidate: M = 0
    M = (jnp.full((R,), active.astype(jnp.float32)) if half_rate
         else jnp.ones((R,)))

    def merge(state, c_pos, c_nrm, c_rad, c_w, c_M, u):
        y_pos, y_nrm, y_rad, w_sum, M = state
        w_new = w_sum + c_w
        take = (u * jnp.maximum(w_new, 1e-20)) < c_w
        t3 = take[..., None]
        return (jnp.where(t3, c_pos, y_pos), jnp.where(t3, c_nrm, y_nrm),
                jnp.where(t3, c_rad, y_rad), w_new, M + c_M)

    # ---- temporal reuse with reconnection Jacobian ----
    motion = sub(gb.motion) / float(scale)
    pxc = jnp.stack(jnp.meshgrid(jnp.arange(Wg, dtype=jnp.float32) + 0.5,
                                 jnp.arange(Hg, dtype=jnp.float32) + gy0 + 0.5,
                                 indexing="xy"), -1)      # GLOBAL GI centers
    prev_xy = pxc + motion
    on_s = ((prev_xy[..., 0] >= 0) & (prev_xy[..., 0] < Wg)
            & (prev_xy[..., 1] >= 0)
            & (prev_xy[..., 1] < gfull_h)).reshape(R)
    # nearest-pixel reservoir reprojection via the gather-free masked-shift
    # warp (ops/warp.py) — reservoirs move whole, never blended
    packed = jnp.concatenate([prev.pos, prev.nrm, prev.rad,
                              prev.W[..., None], prev.M[..., None]], -1)
    pw = warp_image(packed, motion, shard=gshard, halo=GI_HALO,
                    radius=4, col_pad=32, bilinear=False)
    t_pos = pw[..., 0:3].reshape(R, 3)
    t_nrm = pw[..., 3:6].reshape(R, 3)
    t_rad = pw[..., 6:9].reshape(R, 3)
    t_W = pw[..., 9].reshape(R)
    t_M = jnp.minimum(pw[..., 10].reshape(R), m_clamp)
    t_ok = on_s & valid & (t_M > 0)
    # sample must be in front of the receiver
    t_dir = t_pos - pos
    front = jnp.sum(t_dir * n, -1) > 1e-4
    t_ok &= front
    ph_t = jnp.where(t_ok, hm.luminance(t_rad, xp=jnp), 0.0)
    # previous receiver position: approximate with current (static-camera
    # exact; under motion the Jacobian error is bounded by the J clamp)
    w_t = ph_t * t_W * t_M
    u_t, _, _ = _rand(pix, frame, 540)
    state = (y_pos, y_nrm, y_rad, w_sum, M)
    state = merge(state, t_pos, t_nrm, t_rad, jnp.where(t_ok, w_t, 0.0),
                  jnp.where(t_ok, t_M, 0.0), u_t)
    y_pos, y_nrm, y_rad, w_sum, M = state

    # ---- spatial reuse ----
    # TPU redesign (as in restir.py): per-frame scalar tap offsets -> each
    # neighbor fetch is one dynamic_slice of the packed halo-extended snapshot
    # instead of a per-pixel gather. Neighbor choice is value-independent, so
    # the merge stays unbiased; offsets rotate per frame and tap.
    hl = GI_HALO
    d2v = sub(gb.depth)
    snap = jnp.concatenate([
        y_pos.reshape(Hg, Wg, 3), y_nrm.reshape(Hg, Wg, 3),
        y_rad.reshape(Hg, Wg, 3), w_sum.reshape(Hg, Wg)[..., None],
        M.reshape(Hg, Wg)[..., None], n.reshape(Hg, Wg, 3),
        d2v[..., None], pos.reshape(Hg, Wg, 3)], -1)
    PADX = hl
    snap_e = jnp.pad(shu.extend_rows(snap, hl, gshard),
                     ((0, 0), (PADX, PADX), (0, 0)), mode="edge")
    for k in range(spatial_taps):
        kb = pcg3d(jnp.stack([jnp.asarray(k + 1, jnp.uint32), frame,
                              jnp.asarray(0x61AB1E, jnp.uint32)])[None])[0]
        u_a = uniform_from_bits(kb[0])
        u_b = uniform_from_bits(kb[1])
        ang = u_a * (2 * jnp.pi)
        r_px = 1.0 + jnp.sqrt(u_b) * (GI_SPATIAL_RADIUS - 1.0)
        dx = jnp.round(jnp.cos(ang) * r_px).astype(jnp.int32)
        dy = jnp.round(jnp.sin(ang) * r_px).astype(jnp.int32)
        nb = jax.lax.dynamic_slice(snap_e, (hl + dy, PADX + dx, jnp.int32(0)),
                                   (Hg, Wg, 18))
        c_pos = nb[..., 0:3].reshape(R, 3)
        c_nrm = nb[..., 3:6].reshape(R, 3)
        c_rad = nb[..., 6:9].reshape(R, 3)
        c_ws = nb[..., 9].reshape(R)
        c_M_raw = nb[..., 10].reshape(R)
        c_M = jnp.minimum(c_M_raw, m_clamp)
        n_n = nb[..., 11:14].reshape(R, 3)
        d_n = nb[..., 14].reshape(R)
        sim = ((jnp.sum(n_n * n, -1) > 0.85)
               & (jnp.abs(d_n - d2v.reshape(R))
                  < 0.1 * jnp.maximum(d2v.reshape(R), 1e-3))
               & valid)
        ph_n = hm.luminance(c_rad, xp=jnp)
        W_n = jnp.where(ph_n > 0, c_ws / jnp.maximum(c_M_raw * ph_n,
                                                     1e-20), 0.0)
        # reconnection Jacobian: neighbor's sample seen from OUR surface
        J = _jacobian(pos, c_pos, c_nrm, nb[..., 15:18].reshape(R, 3))
        front_n = jnp.sum((c_pos - pos) * n, -1) > 1e-4
        ok_n = sim & front_n & (ph_n > 0)
        _, _, u_c = _rand(pix, frame, 560 + k)
        w_n = jnp.where(ok_n, ph_n * W_n * c_M * J, 0.0)
        state = merge((y_pos, y_nrm, y_rad, w_sum, M),
                      c_pos, c_nrm, c_rad, w_n,
                      jnp.where(ok_n, c_M, 0.0), u_c)
        y_pos, y_nrm, y_rad, w_sum, M = state

    # ---- finalize + final visibility ray (kills stale/occluded samples) ----
    ph_y = hm.luminance(y_rad, xp=jnp)
    Wgt = jnp.where(ph_y > 0, w_sum / jnp.maximum(M * ph_y, 1e-20), 0.0)
    to_s = y_pos - pos
    dist = jnp.linalg.norm(to_s, axis=-1)
    L = to_s / jnp.maximum(dist, 1e-6)[..., None]
    o_v = offset_ray_origin(pos, gn, L)
    shoot = valid & (Wgt > 0) & (dist > 1e-4)
    from hobbyrenderer_tpu.ops.intersect import retarget_shadow_ray
    L, tmax_t = retarget_shadow_ray(pos, o_v, L, dist)
    tmax_v = jnp.where(shoot, tmax_t, 1e-4)
    if stats_out is not None:
        stats_out["overflow"] = jnp.int32(0)
    from hobbyrenderer_tpu.ops import restir as _restir
    if getattr(rt, "btable", None) is not None \
            and jax.default_backend() == "tpu" \
            and _restir.KERNEL_MODE != "xla":
        # post-spatial-reuse neighbors share samples, so receiver->sample
        # rays are tile-coherent: beam kernel (ops/beam.py)
        from hobbyrenderer_tpu.ops import beam as beamops
        occ, n_ovf = beamops.beam_any_hit(
            rt.btable, o_v.reshape(Hg, Wg, 3), L.reshape(Hg, Wg, 3),
            tmax_v.reshape(Hg, Wg), shoot.reshape(Hg, Wg), Hg, Wg,
            return_overflow=True)
        occ = occ.reshape(R)
        if stats_out is not None:
            stats_out["overflow"] = n_ovf
    else:
        occ = bvhops.bvh_any_hit(rt.bvh, o_v, L, t_max=tmax_v)
    Wgt = jnp.where(occ, 0.0, Wgt)

    cos_r = jnp.maximum(jnp.sum(L * n, -1), 0.0)
    # demodulated resolve: the grid carries IRRADIANCE/pi (no albedo) so the
    # full-res modulation below restores texture detail the low-res grid
    # cannot represent (the NRD demodulation convention)
    irr = y_rad * (cos_r * Wgt / jnp.pi)[..., None]
    irr = jnp.where(valid[..., None], irr, 0.0)

    new_res = GIReservoir(pos=y_pos.reshape(Hg, Wg, 3),
                          nrm=y_nrm.reshape(Hg, Wg, 3),
                          rad=y_rad.reshape(Hg, Wg, 3),
                          w_sum=w_sum.reshape(Hg, Wg),
                          M=M.reshape(Hg, Wg), W=Wgt.reshape(Hg, Wg))
    from hobbyrenderer_tpu.ops.upsample import joint_bilateral_upsample
    full_irr = joint_bilateral_upsample(
        irr.reshape(Hg, Wg, 3), d2v, n.reshape(Hg, Wg, 3),
        valid.reshape(Hg, Wg), gb.depth, gb.normal, scale, shard=shard)
    full = gb.albedo * full_irr
    full = jnp.where(gb.valid[..., None], full, 0.0)
    return full, new_res
