"""ReSTIR DI: reservoir-based spatiotemporal importance resampling for direct
lighting.

Reference: src/RTXDIRenderer.cpp (2647 LoC, NVIDIA RTXDI library) — per-frame
chain: PrepareLights -> presampling (RIS tiles) -> GenerateInitialSamples ->
TemporalResampling -> SpatialResampling -> ShadeSamples (SURVEY.md §2.6 #41).
Algorithm: Bitterli et al. 2020 "Spatiotemporal reservoir resampling for
real-time ray tracing with dynamic direct lighting".

TPU design: a reservoir is a pytree of (H, W) arrays (light id, w_sum, M, W);
every stage is pure vectorized math over pixels — streaming RIS needs no
atomics. Initial candidates sample the analytic light pool uniformly (the
uniform mode of the reference's uniform/Power-RIS/ReGIR initial sampling);
temporal reuse reprojects via motion vectors with M-clamping; spatial reuse
merges K fixed-radius neighbors; a single visibility ray shades the winner.
Deterministic counter-based RNG (pixel, frame, dim) like the rest of the
renderer."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.scene.scene import LIGHT_DIRECTIONAL
from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

M_CLAMP_TEMPORAL = 20.0     # ref RTXDI temporal M clamp
SPATIAL_RADIUS = 30.0       # px (ref spatial sampling radius)
SPATIAL_TAPS = 4


class Reservoir(NamedTuple):
    """Per-pixel light reservoir (ref RTXDI light reservoir buffers)."""

    y: jnp.ndarray       # (H, W) i32 selected light index (-1 = empty)
    w_sum: jnp.ndarray   # (H, W) f32 sum of RIS weights
    M: jnp.ndarray       # (H, W) f32 candidate count
    W: jnp.ndarray       # (H, W) f32 unbiased contribution weight


def reservoir_init(h: int, w: int) -> Reservoir:
    # NOTE: three distinct arrays (not one shared zeros) — the frame state is
    # donated into jit, and aliased leaves trip "donate the same buffer twice"
    return Reservoir(y=jnp.full((h, w), -1, jnp.int32),
                     w_sum=jnp.zeros((h, w), jnp.float32),
                     M=jnp.zeros((h, w), jnp.float32),
                     W=jnp.zeros((h, w), jnp.float32))


def _rand(pix, frame, dim):
    bits = pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                            jnp.full_like(pix, dim)], -1))
    return (uniform_from_bits(bits[..., 0]), uniform_from_bits(bits[..., 1]),
            uniform_from_bits(bits[..., 2]))


def _light_dir_dist(gpu, li, pos):
    """Direction/radiance/distance toward light li at shaded points (delta
    sampling; the soft-sun cone is applied only at final shading)."""
    return shadeops.light_incident(
        gpu.light_type[li], gpu.light_pos[li], gpu.light_dir[li],
        gpu.light_color[li], gpu.light_range[li], gpu.light_cone[li], pos)


def _p_hat(gpu, li, pos, n, v, albedo, metal, rough):
    """Target function: luminance of unshadowed reflected radiance for light li.

    (ref RAB_GetLightSampleTargetPdfForSurface)."""
    L, rad, dist = _light_dir_dist(gpu, li, pos)
    f = shadeops.eval_brdf(n, v, L, albedo, metal, rough)
    return hm.luminance(f * rad, xp=jnp), L, dist


def _res_update(y, w_sum, M, cand_y, cand_w, u):
    w_sum_new = w_sum + cand_w
    take = (u * jnp.maximum(w_sum_new, 1e-20)) < cand_w
    return jnp.where(take, cand_y, y), w_sum_new, M + 1.0


def restir_di(gpu, rt, gb, vc, settings, prev: Reservoir, frame_index,
              num_candidates: int = 8, visibility: bool = True,
              spatial_taps: int = SPATIAL_TAPS):
    """Full ReSTIR DI chain for one frame.

    gb: GBuffer; prev: last frame's reservoir (already at this frame's pixel
    grid semantics — reprojection happens here via gb.motion).
    Returns (direct_radiance (H,W,3), new Reservoir)."""
    H, W = gb.depth.shape
    R = H * W
    pix = jnp.arange(R, dtype=jnp.uint32)
    frame = jnp.asarray(frame_index).astype(jnp.uint32)

    pos = gb.world_pos.reshape(R, 3)
    n = gb.normal.reshape(R, 3)
    valid = gb.valid.reshape(R)
    cam = vc["camera_pos"]
    v = hm.normalize(cam[None, :] - pos, xp=jnp)
    albedo = gb.albedo.reshape(R, 3)
    rough = gb.orm.reshape(R, 3)[:, 1]
    metal = gb.orm.reshape(R, 3)[:, 2]

    nl = jnp.maximum(gpu.light_count, 1)
    inv_pdf = nl.astype(jnp.float32)  # uniform light selection

    def p_hat_of(li):
        ph, L, dist = _p_hat(gpu, li, pos, n, v, albedo, metal, rough)
        return jnp.where(valid, ph, 0.0), L, dist

    # ---- initial candidates (GenerateInitialSamples, uniform mode) ----
    y = jnp.full((R,), -1, jnp.int32)
    w_sum = jnp.zeros((R,))
    M = jnp.zeros((R,))
    for c in range(num_candidates):
        u_l, u_r, _ = _rand(pix, frame, 100 + c)
        li = jnp.minimum((u_l * nl).astype(jnp.int32), nl - 1)
        ph, _L, _d = p_hat_of(li)
        y, w_sum, M = _res_update(y, w_sum, M, li, ph * inv_pdf, u_r)

    # ---- temporal reuse (TemporalResampling) ----
    motion = gb.motion  # prev - cur, pixels
    pxc = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                                 jnp.arange(H, dtype=jnp.float32) + 0.5,
                                 indexing="xy"), -1)
    prev_xy = pxc + motion
    px_i = jnp.clip(prev_xy[..., 0].astype(jnp.int32), 0, W - 1).reshape(R)
    py_i = jnp.clip(prev_xy[..., 1].astype(jnp.int32), 0, H - 1).reshape(R)
    on_screen = ((prev_xy[..., 0] >= 0) & (prev_xy[..., 0] < W)
                 & (prev_xy[..., 1] >= 0) & (prev_xy[..., 1] < H)).reshape(R)
    ty = prev.y[py_i, px_i]
    tM = jnp.minimum(prev.M[py_i, px_i], M_CLAMP_TEMPORAL)
    tW = prev.W[py_i, px_i]
    t_ok = on_screen & (ty >= 0)
    ph_t, _, _ = p_hat_of(jnp.maximum(ty, 0))
    w_t = jnp.where(t_ok, ph_t * tW * tM, 0.0)
    u1, _, _ = _rand(pix, frame, 200)
    y, w_sum, _ = _res_update(y, w_sum, M, ty, w_t, u1)
    M = M + jnp.where(t_ok, tM, 0.0)

    # ---- spatial reuse (SpatialResampling): merge K jittered neighbors ----
    # Snapshot the post-temporal reservoir with each pixel's contribution
    # weight W evaluated at ITS OWN surface (ping-pong, like the reference's
    # spatial pass reading the previous stage's buffer). The merge then
    # reweights the neighbor's sample by p-hat at the CURRENT surface:
    #   cand_w = ph_here(y_n) * W_n * M_n
    # where W_n = w_sum_n / (M_n * ph_n(y_n)) uses the NEIGHBOR's p-hat —
    # evaluating both at the current surface would cancel algebraically.
    ph_s, _, _ = p_hat_of(jnp.maximum(y, 0))
    W_snap = jnp.where((y >= 0) & (ph_s > 0),
                       w_sum / jnp.maximum(M * ph_s, 1e-20), 0.0)
    y_snap2 = jnp.reshape(y, (H, W))
    W_snap2 = jnp.reshape(W_snap, (H, W))
    M_snap2 = jnp.reshape(M, (H, W))
    for k in range(spatial_taps):
        u_a, u_b, u_c = _rand(pix, frame, 300 + k)
        ang = u_a * (2 * jnp.pi)
        rad_px = jnp.sqrt(u_b) * SPATIAL_RADIUS
        dx = (jnp.cos(ang) * rad_px).astype(jnp.int32)
        dy = (jnp.sin(ang) * rad_px).astype(jnp.int32)
        nx = jnp.clip(pix.astype(jnp.int32) % W + dx, 0, W - 1)
        ny_ = jnp.clip(pix.astype(jnp.int32) // W + dy, 0, H - 1)
        # neighbor similarity (depth + normal) guards against bias at edges
        n_n = gb.normal[ny_, nx]
        d_n = gb.depth[ny_, nx]
        d_c = gb.depth.reshape(R)
        similar = ((jnp.sum(n_n * n, -1) > 0.9)
                   & (jnp.abs(d_n - d_c) < 0.1 * jnp.maximum(d_c, 1e-3))
                   & valid & gb.valid[ny_, nx])
        yy = y_snap2[ny_, nx]
        W_n = W_snap2[ny_, nx]
        mm = M_snap2[ny_, nx]
        ph_here, _, _ = p_hat_of(jnp.maximum(yy, 0))
        w_n = jnp.where(similar & (yy >= 0), ph_here * W_n * mm, 0.0)
        y, w_sum, _ = _res_update(y, w_sum, M, yy, w_n, u_c)
        M = M + jnp.where(similar & (yy >= 0), mm, 0.0)

    # ---- finalize W ----
    ph_y, L_y, dist_y = p_hat_of(jnp.maximum(y, 0))
    Wgt = jnp.where((y >= 0) & (ph_y > 0), w_sum / jnp.maximum(M * ph_y, 1e-20), 0.0)

    # ---- shade winner with one visibility ray (ShadeSamples) ----
    is_sun = gpu.light_type[jnp.maximum(y, 0)] == LIGHT_DIRECTIONAL
    u_s1, u_s2, _ = _rand(pix, frame, 400)
    cos_max = jnp.cos(settings.sun_angular_radius)
    L_final = jnp.where(is_sun[..., None],
                        smp.sample_cone(L_y, cos_max, u_s1, u_s2), L_y)
    Ld, rad, dist = _light_dir_dist(gpu, jnp.maximum(y, 0), pos)
    f = shadeops.eval_brdf(n, v, L_final, albedo, metal, rough)
    contrib = f * rad * Wgt[..., None]
    if visibility and rt is not None:
        gn = gb.geo_normal.reshape(R, 3)
        bias = settings.shadow_bias
        o = pos + gn * bias + L_final * bias
        shoot = valid & (y >= 0) & (Wgt > 0)
        occ = bvhops.bvh_any_hit(rt.bvh, o, L_final,
                                 t_max=jnp.where(shoot, dist - 2e-3, 1e-4))
        contrib = jnp.where(occ[..., None], 0.0, contrib)
    contrib = jnp.where((valid & (y >= 0))[..., None], contrib, 0.0)

    new_res = Reservoir(y=y.reshape(H, W), w_sum=w_sum.reshape(H, W),
                        M=M.reshape(H, W), W=Wgt.reshape(H, W))
    return contrib.reshape(H, W, 3), new_res
