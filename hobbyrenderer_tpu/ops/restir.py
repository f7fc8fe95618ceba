"""ReSTIR DI: reservoir-based spatiotemporal importance resampling for direct
lighting, over a POLYMORPHIC light pool (analytic + emissive triangles).

Reference: src/RTXDIRenderer.cpp (2647 LoC, NVIDIA RTXDI library) — per-frame
chain: PrepareLights -> presampling (RIS tiles) -> GenerateInitialSamples ->
TemporalResampling -> SpatialResampling -> ShadeSamples (SURVEY.md §2.6 #41).
Algorithm: Bitterli et al. 2020 "Spatiotemporal reservoir resampling for
real-time ray tracing with dynamic direct lighting".

TPU design: a reservoir is a pytree of (H, W) arrays (light id, sample uv,
w_sum, M, W); every stage is pure vectorized math over pixels — streaming RIS
needs no atomics. Initial candidates draw from per-frame power-presampled RIS
tiles (ops/lights.py); reservoirs carry the light id PLUS the area-sample uv so
emissive-triangle samples survive reuse; temporal reuse reprojects via motion
vectors with M-clamping; spatial reuse merges K fixed-radius neighbors with the
neighbor's own-surface W (the unbiased-merge reweighting); a single visibility
ray shades the winner. Deterministic counter-based RNG (pixel, frame, dim)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import lights as lightops
from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops import shard_utils as shu
from hobbyrenderer_tpu.ops.warp import warp_image
from hobbyrenderer_tpu.scene.scene import LIGHT_DIRECTIONAL
from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

M_CLAMP_TEMPORAL = 20.0     # ref RTXDI temporal M clamp
VIS_SCALE_MIN_DIM = 512     # reduced-rate visibility only at real resolutions
#                             (the reuse offset is a huge image fraction at
#                              golden-gate thumbnails; tests patch this down)
SPATIAL_RADIUS = 30.0       # px (ref spatial sampling radius)
SPATIAL_TAPS = 4
HALO = 32                   # row-shard halo >= SPATIAL_RADIUS (exact taps)


class Reservoir(NamedTuple):
    """Per-pixel light reservoir (ref RTXDI light reservoir buffers).

    Within a frame the chain also threads the winner's PACKED LIGHT ROW as a
    local alongside its id, so every p-hat after the candidate stage evaluates
    from in-hand data — zero per-pixel pool gathers (a 2M-lane row gather
    costs ~13 ms at 1080p and the chain needs ~15 evaluations). Across frames
    only the id persists; temporal reuse re-gathers the row from the LIVE
    pool (one gather/frame), which also keeps animated lights current."""

    y: jnp.ndarray       # (H, W) i32 selected pool light id (-1 = empty)
    uv: jnp.ndarray      # (H, W, 2) f32 area-light sample point
    w_sum: jnp.ndarray   # (H, W) f32 sum of RIS weights
    M: jnp.ndarray       # (H, W) f32 candidate count
    W: jnp.ndarray       # (H, W) f32 unbiased contribution weight


def reservoir_init(h: int, w: int) -> Reservoir:
    # NOTE: distinct arrays (not one shared zeros) — the frame state is donated
    # into jit, and aliased leaves trip "donate the same buffer twice"
    return Reservoir(y=jnp.full((h, w), -1, jnp.int32),
                     uv=jnp.zeros((h, w, 2), jnp.float32),
                     w_sum=jnp.zeros((h, w), jnp.float32),
                     M=jnp.zeros((h, w), jnp.float32),
                     W=jnp.zeros((h, w), jnp.float32))


def _rand(pix, frame, dim):
    bits = pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                            jnp.full_like(pix, dim)], -1))
    return (uniform_from_bits(bits[..., 0]), uniform_from_bits(bits[..., 1]),
            uniform_from_bits(bits[..., 2]))


def _fallback_pool(gpu):
    """Analytic-only pool when the caller has no emissive pool (NormalBasic /
    tests): zero emissive tris, uniform-power analytic lights."""
    A = gpu.light_type.shape[0]
    alive = jnp.arange(A) < gpu.light_count
    p = jnp.where(alive, 1.0, 0.0)
    tot = jnp.maximum(p.sum(), 1e-20)
    z3 = jnp.zeros((1, 3), jnp.float32)
    pool = lightops.LightPool(
        n_analytic=jnp.asarray(A, jnp.int32),
        n_total=jnp.asarray(A, jnp.int32),
        em_v0=z3, em_e1=z3, em_e2=z3, em_rad=z3,
        em_orig=jnp.full((1,), -1, jnp.int32),
        em_scale=jnp.ones((1,), jnp.float32),
        power_cdf=jnp.cumsum(jnp.concatenate([p / tot, jnp.zeros(1)])),
        power_pdf=jnp.concatenate([p / tot, jnp.zeros(1)]))
    return lightops.pack_pool(pool, gpu)


def boiling_filter_mask(w_sum_2d, live_2d, mult: float = 20.0,
                        radius: int = 16, shard=None):
    """Boiling-filter kill mask (ref RTXDI BoilingFilter.hlsli): reservoirs
    whose weight vastly exceeds the local mean are fireflies-in-waiting that
    temporal feedback would amplify into 'boiling' blobs.

    The reference averages w_sum over a GPU wave via WaveActiveSum; the TPU
    shape is a separable (2r+1)^2 windowed mean — translation-invariant, so a
    row-sharded band (halo rows via ppermute) computes bit-identical means to
    the single-chip frame, keeping the sharded==single contract. Rows outside
    the global framebuffer contribute zero weight AND zero count in both
    paths. Returns True where the reservoir must be reset."""
    H, W = w_sum_2d.shape
    r = radius
    w = jnp.where(live_2d, w_sum_2d, 0.0)
    cnt = live_2d.astype(jnp.float32)
    we = shu.extend_rows(w, r, shard)
    ce = shu.extend_rows(cnt, r, shard)
    y0 = shu.global_y0(shard)
    full_h = shu.full_height(shard, H)
    gy = jnp.arange(-r, H + r) + y0
    inside = ((gy >= 0) & (gy < full_h)).astype(jnp.float32)[:, None]
    we = we * inside
    ce = ce * inside

    def box(x):
        v = jax.lax.reduce_window(x, 0.0, jax.lax.add, (2 * r + 1, 1),
                                  (1, 1), "VALID")              # rows
        v = jnp.pad(v, ((0, 0), (r, r)))
        return jax.lax.reduce_window(v, 0.0, jax.lax.add, (1, 2 * r + 1),
                                     (1, 1), "VALID")           # cols

    mean = box(we) / jnp.maximum(box(ce), 1.0)
    return live_2d & (w_sum_2d > mult * jnp.maximum(mean, 1e-20))


# Kernel-path selector for the TPU-only stages (tile-modal beam winner
# visibility, fused Pallas candidates). "auto" = kernels on TPU, XLA
# elsewhere; "xla" forces the plain XLA path EVEN on TPU — the lever the
# kernel-parity diagnostics (scripts/diag_tpu_quality.py) and the golden
# gates use to attribute TPU-vs-CPU image differences to a specific kernel.
KERNEL_MODE = "auto"

# census-iteration budget for the straggler (minority-winner) re-trace
STRAGGLER_STEPS = 20

def _winner_occlusion(rt, o, L_vis, tmax, shoot, y_ids, H, W,
                      force_kernel: bool, stats_out: dict):
    """One occlusion bit per lane for the ReSTIR winner rays (R = H*W lanes).

    TPU: tile-modal winner split — the TOP-TWO tile-modal winners each ride
    a beam pass (tight cones; post-spatial-reuse tiles hold 1-3 distinct
    winners), the rare stragglers compact into a small wavefront for the
    on-chip walk (measured: one unsplit beam pass degenerated to 1.46 s at
    1080p when lanes mixed winners). CPU: plain wavefront any-hit."""
    R = H * W
    if getattr(rt, "btable", None) is not None and KERNEL_MODE != "xla" \
            and (jax.default_backend() == "tpu" or force_kernel):
        from hobbyrenderer_tpu.ops import beam as beamops
        interp = force_kernel and jax.default_backend() != "tpu"
        shoot2 = shoot.reshape(H, W)
        o2 = o.reshape(H, W, 3)
        Lv2 = L_vis.reshape(H, W, 3)
        tm2 = tmax.reshape(H, W)
        key = jnp.where(shoot2, y_ids.reshape(H, W), -1)
        match = beamops.tile_majority_mask(key, H, W, exclude=-1) & shoot2
        occ_b, n_ovf = beamops.beam_any_hit(
            rt.btable, o2, Lv2, tm2, match, H, W,
            interpret=interp, return_overflow=True)
        key2 = jnp.where(match, -1, key)
        match2 = beamops.tile_majority_mask(key2, H, W, exclude=-1) \
            & shoot2 & ~match
        occ_b2, n_ovf2 = beamops.beam_any_hit(
            rt.btable, o2, Lv2, tm2, match2, H, W,
            interpret=interp, return_overflow=True)
        occ_b = jnp.where(match2, occ_b2, occ_b)
        n_ovf = n_ovf + n_ovf2
        match = match | match2
        minority = shoot & ~match.reshape(R)
        CAP = max(R // 32, 1024)
        rank = jnp.cumsum(minority.astype(jnp.int32)) - 1
        slot = jnp.where(minority & (rank < CAP), rank, CAP)
        sel = jnp.full((CAP + 1,), R, jnp.int32) \
            .at[slot].set(jnp.arange(R, dtype=jnp.int32), mode="drop")[:CAP]
        pad = sel >= R
        o_c = jnp.where(pad[:, None], 0.0, o[jnp.minimum(sel, R - 1)])
        d_c = jnp.where(pad[:, None], 0.0, L_vis[jnp.minimum(sel, R - 1)])
        tm_c = jnp.where(pad, 0.0, tmax[jnp.minimum(sel, R - 1)])
        if getattr(rt, "bvh16", None) is not None:
            from hobbyrenderer_tpu.ops.trace import _use_wtrace
            if _use_wtrace(rt) and jax.default_backend() == "tpu":
                from hobbyrenderer_tpu.ops import wtrace as wtops
                occ_c = wtops.wtrace_any_hit(rt.bvh16, o_c, d_c,
                                             t_max=tm_c,
                                             max_steps=STRAGGLER_STEPS)
            else:
                from hobbyrenderer_tpu.ops import bvh16 as b16ops
                occ_c = b16ops.bvh16_any_hit(rt.bvh16, o_c, d_c,
                                             t_max=tm_c, max_steps=64)
        else:
            occ_c = bvhops.bvh_any_hit(rt.bvh, o_c, d_c, t_max=tm_c,
                                       max_steps=256)
        # lanes past CAP never traced: treat them as OCCLUDED (a brief
        # over-dark shadow) rather than unoccluded (a light leak the
        # temporal chain amplifies) — ADVICE r3
        occ_m = jnp.where(minority & (rank >= CAP), True,
                          jnp.zeros(R, bool).at[sel].set(occ_c & ~pad,
                                                         mode="drop"))
        occ = jnp.where(match.reshape(R), occ_b.reshape(R), occ_m)
        if stats_out is not None:
            # under-reported occlusion events: frontier-overflowed beam
            # tiles + straggler lanes past the wavefront capacity; surfaced
            # in Renderer.stats()
            n_min = jnp.sum(minority.astype(jnp.int32))
            stats_out["overflow"] = stats_out.get("overflow", jnp.int32(0)) \
                + n_ovf + jnp.maximum(n_min - CAP, 0)
        return occ
    return bvhops.bvh_any_hit(rt.bvh, o, L_vis, t_max=tmax)


def restir_di(gpu, rt, gb, vc, settings, prev: Reservoir, frame_index,
              num_candidates: int = 8, visibility: bool = True,
              spatial_taps: int = SPATIAL_TAPS, pool=None, shard=None,
              force_kernel: bool = False, boiling_mult: float = 20.0,
              regir_grid=None, stats_out: dict = None,
              checkerboard: bool = False, vis_scale: int = 1):
    """Full ReSTIR DI chain for one frame.

    gb: GBuffer; prev: last frame's reservoir (already at this frame's pixel
    grid semantics — reprojection happens here via gb.motion); pool: LightPool
    (defaults to rt.lights, else analytic-only fallback); shard: optional
    shard_utils.RowShard when gb/prev are one device's row band — temporal
    and spatial taps then reach the neighbor bands via ppermute halos.
    Returns (direct_radiance (H,W,3), new Reservoir)."""
    H, W = gb.depth.shape
    R = H * W
    y0 = shu.global_y0(shard)
    full_h = shu.full_height(shard, H)
    ly = jnp.arange(R, dtype=jnp.int32) // W
    lx = jnp.arange(R, dtype=jnp.int32) % W
    gy = ly + y0
    # RNG keyed on GLOBAL pixel id: a sharded frame draws the same sample
    # sequence as the single-chip frame (the sharded==single contract)
    pix = (gy * W + lx).astype(jnp.uint32)
    frame = jnp.asarray(frame_index).astype(jnp.uint32)
    if pool is None:
        pool = getattr(rt, "lights", None) if rt is not None else None
    if pool is None:
        pool = _fallback_pool(gpu)

    pos = gb.world_pos.reshape(R, 3)
    n = gb.normal.reshape(R, 3)
    valid = gb.valid.reshape(R)
    cam = vc["camera_pos"]
    v = hm.normalize(cam[None, :] - pos, xp=jnp)
    albedo = gb.albedo.reshape(R, 3)
    rough = gb.orm.reshape(R, 3)[:, 1]
    metal = gb.orm.reshape(R, 3)[:, 2]

    def p_hat_rows_at(rows, li, uv, s_pos, s_n, s_v, s_alb, s_metal, s_rough,
                      s_valid):
        """Target: luminance of unshadowed reflected radiance of the sample
        described by in-hand packed rows (ref
        RAB_GetLightSampleTargetPdfForSurface) — no pool gather. Surface
        arrays are explicit so the candidate stage can run on the
        checkerboard half grid."""
        L, rad, dist = lightops.light_incident_rows(rows, uv, s_pos)
        f = shadeops.eval_brdf(s_n, s_v, L, s_alb, s_metal, s_rough)
        ph = hm.luminance(f * rad, xp=jnp)
        return jnp.where(s_valid & (li >= 0), ph, 0.0), L, dist

    def p_hat_rows(rows, li, uv):
        return p_hat_rows_at(rows, li, uv, pos, n, v, albedo, metal, rough,
                             valid)

    def res_update(state, cand_y, cand_uv, cand_row, cand_w, u):
        y, uv, row, w_sum, M = state
        w_sum_new = w_sum + cand_w
        take = (u * jnp.maximum(w_sum_new, 1e-20)) < cand_w
        return (jnp.where(take, cand_y, y),
                jnp.where(take[..., None], cand_uv, uv),
                jnp.where(take[..., None], cand_row, row),
                w_sum_new, M + 1.0)

    # ---- checkerboard half grid (ref rtxdi::CheckerboardMode) ----
    # Only W/2 columns per row (alternating parity per frame) draw fresh
    # candidates; temporal reuse carries the off-parity pixels — the
    # reference's checkerboard reconstruction story. On TPU the saving must
    # come from SMALLER SHAPES (masked lanes still cost); compaction is two
    # strided slices + a select, zero gathers.
    if checkerboard:
        assert W % 2 == 0, "checkerboard needs an even render width"
        Wc = W // 2
        par = ((jnp.arange(H, dtype=jnp.int32) + y0
                + frame.astype(jnp.int32)) & 1)            # (H,) traced

        def _compact(img):
            ev, od = img[:, 0::2], img[:, 1::2]
            pr = par.reshape((H,) + (1,) * (img.ndim - 1))
            return jnp.where(pr == 0, ev[:, :Wc], od[:, :Wc])

        pos_g = _compact(gb.world_pos)
        n_g = _compact(gb.normal)
        alb_g = _compact(gb.albedo)
        orm_g = _compact(gb.orm)
        valid_g = _compact(gb.valid)
    else:
        Wc = W
        pos_g, n_g, alb_g, orm_g, valid_g = (gb.world_pos, gb.normal,
                                             gb.albedo, gb.orm, gb.valid)
    Rc = H * Wc
    posc = pos_g.reshape(Rc, 3)
    nc = n_g.reshape(Rc, 3)
    validc = valid_g.reshape(Rc)
    albc = alb_g.reshape(Rc, 3)
    roughc = orm_g.reshape(Rc, 3)[:, 1]
    metalc = orm_g.reshape(Rc, 3)[:, 2]
    vc_cand = hm.normalize(cam[None, :] - posc, xp=jnp)
    # candidate RNG ids: gy * W + local col (the kernel's w_log contract;
    # == the global pixel id when not checkerboarded)
    pixc = (((jnp.arange(Rc, dtype=jnp.int32) // Wc) + y0) * W
            + jnp.arange(Rc, dtype=jnp.int32) % Wc).astype(jnp.uint32)

    # ---- presampled candidate ROW tiles (RIS presampling) ----
    # (T, S=128, 18) packed-light-row tiles; each 128-pixel row SEGMENT pulls
    # one whole tile per candidate as a single contiguous chunk row (~130k
    # block-granular gathers/frame ~= 3 ms), and pixel x reads slot x % 128 —
    # stratified within the tile's iid power-samples. Replaces a per-pixel
    # per-candidate pool gather (2 x 8 x ~13 ms at 1080p).
    if regir_grid is not None:
        # ReGIR mode (ref RTXDIRenderer ReGIR grid): the tile table IS the
        # world-space cell-reservoir grid, and each 128-pixel segment fetches
        # the cell covering its center pixel — local lights propose locally.
        # Slot 16 carries the cell reservoir's W (reciprocal-pdf estimate),
        # playing 1/power_pdf's role in the RIS weights downstream.
        from hobbyrenderer_tpu.ops import regir as regirops
        tile_rows = regir_grid.rows
    else:
        tile_rows = lightops.presample_light_rows(pool, frame)
    T, S, CH = tile_rows.shape
    flat = tile_rows.reshape(T, S * CH)        # minor dim 2304 = 18 x 128
    nseg = (Wc + S - 1) // S
    Wp = nseg * S
    gy_img = jnp.arange(H, dtype=jnp.uint32) + jnp.uint32(y0)
    seg = jnp.arange(nseg, dtype=jnp.uint32)
    # ONE tile per (global scanline, segment), rotating per frame; fetched as
    # one contiguous chunk row. All candidates share the segment's tile (the
    # reference likewise shares one presample tile per pixel block): candidate
    # c of the pixel at segment rank r reads slot (r + 17c) % S — distinct
    # slots per pixel (sampling the tile's iid power-draws without
    # replacement), realized as a STATIC circular shift, so the whole
    # candidate stage costs exactly one gather. 3-D intermediates only — a
    # (H, nseg, C, S, CH) form pads 8x under TPU tiling (OOM).
    if regir_grid is not None:
        seg_x = jnp.minimum(jnp.arange(nseg, dtype=jnp.int32) * S + S // 2,
                            Wc - 1)
        tsel = regirops.cells_of_positions(
            regir_grid, pos_g[:, seg_x], valid_g[:, seg_x])
    else:
        sbits = pcg3d(jnp.stack([
            jnp.broadcast_to(gy_img[:, None], (H, nseg)),
            jnp.broadcast_to(seg[None, :], (H, nseg)),
            jnp.broadcast_to(frame, (H, nseg))], -1))
        tsel = (sbits[..., 0] % jnp.uint32(T)).astype(jnp.int32)
    fetched = flat[tsel].reshape(H, nseg, S, CH)   # (H, nseg, S, CH)

    def candidate_rows(c):
        """(Rc, CH) packed candidate rows for candidate c (see above)."""
        shift = (17 * c) % S
        rolled = (fetched if shift == 0 else
                  jnp.concatenate([fetched[:, :, shift:],
                                   fetched[:, :, :shift]], axis=2))
        return rolled.reshape(H, Wp, CH)[:, :Wc].reshape(Rc, CH)

    # ---- initial candidates (GenerateInitialSamples) ----
    if (jax.default_backend() == "tpu" or force_kernel) \
            and KERNEL_MODE != "xla":
        # fused Pallas kernel: chunk DMA + p-hat + RIS update in VMEM
        # (ops/restir_pallas.py; statistically identical draws to the XLA
        # loop below — same tiles, slots, and counter RNG)
        from hobbyrenderer_tpu.ops import restir_pallas as rpk
        Hp = -(-H // rpk.ROWS) * rpk.ROWS

        def pad2(v1d):
            return jnp.pad(v1d.reshape(H, Wc).astype(jnp.float32),
                           ((0, Hp - H), (0, Wp - Wc)))

        planes = [pad2(posc[:, 0]), pad2(posc[:, 1]), pad2(posc[:, 2]),
                  pad2(nc[:, 0]), pad2(nc[:, 1]), pad2(nc[:, 2]),
                  pad2(albc[:, 0]), pad2(albc[:, 1]), pad2(albc[:, 2]),
                  pad2(roughc), pad2(metalc), pad2(validc)]
        flat3 = tile_rows.transpose(0, 2, 1)
        tselp = jnp.pad(tsel, ((0, Hp - H), (0, 0)))
        yf, uf, vf, wf, rowf = rpk.restir_candidates(
            flat3, tselp, planes, cam, frame, jnp.asarray(y0),
            num_candidates=num_candidates, w_log=W,
            interpret=force_kernel and jax.default_backend() != "tpu")
        y = jnp.round(yf[:H, :Wc]).astype(jnp.int32).reshape(Rc)
        uv = jnp.stack([uf[:H, :Wc].reshape(Rc), vf[:H, :Wc].reshape(Rc)], -1)
        w_sum = wf[:H, :Wc].reshape(Rc)
        row = rowf[:H, :, :Wc].transpose(0, 2, 1).reshape(Rc, 16)
        M = jnp.full((Rc,), float(num_candidates))
    else:
        y = jnp.full((Rc,), -1, jnp.int32)
        uv = jnp.zeros((Rc, 2))
        row = jnp.zeros((Rc, 16))
        w_sum = jnp.zeros((Rc,))
        M = jnp.zeros((Rc,))
        state = (y, uv, row, w_sum, M)
        for c in range(num_candidates):
            # one counter-RNG eval per candidate: slot choice is the lane
            # rank (stratified within the chunk), so only (accept, uv) need
            # randomness
            u_r, u_u, u_v = _rand(pixc, frame, 100 + c)
            crows = candidate_rows(c)
            crow = crows[:, :16]
            li = jnp.round(crows[:, 17]).astype(jnp.int32)
            inv_pdf = crows[:, 16]
            cuv = jnp.stack([u_u, u_v], -1)
            ph, _L, _d = p_hat_rows_at(crow, li, cuv, posc, nc, vc_cand,
                                       albc, metalc, roughc, validc)
            state = res_update(state, li, cuv, crow, ph * inv_pdf, u_r)
        y, uv, row, w_sum, M = state

    if checkerboard:
        # scatter the half-grid reservoirs back to screen layout; off-parity
        # pixels start this frame EMPTY (M=0) and are refilled by temporal
        # reuse below (ref checkerboard reconstruction)
        def _expand(cmp, fill):
            img = cmp.reshape((H, Wc) + cmp.shape[1:])
            pr = par.reshape((H,) + (1,) * (img.ndim - 1))
            f = jnp.full_like(img, fill)
            ev = jnp.where(pr == 0, img, f)
            od = jnp.where(pr == 1, img, f)
            return jnp.stack([ev, od], axis=2).reshape((H * W,)
                                                       + cmp.shape[1:])

        y = _expand(y, -1)
        uv = _expand(uv, 0.0)
        row = _expand(row, 0.0)
        w_sum = _expand(w_sum, 0.0)
        M = _expand(M, 0.0)

    # ---- temporal reuse (TemporalResampling) ----
    motion = gb.motion  # prev - cur, pixels
    pxc = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                                 jnp.arange(H, dtype=jnp.float32) + y0 + 0.5,
                                 indexing="xy"), -1)      # GLOBAL pixel centers
    prev_xy = pxc + motion
    on_screen = ((prev_xy[..., 0] >= 0) & (prev_xy[..., 0] < W)
                 & (prev_xy[..., 1] >= 0)
                 & (prev_xy[..., 1] < full_h)).reshape(R)
    # nearest-pixel reprojection of the reservoir state via the gather-free
    # masked-shift warp (ops/warp.py; a per-pixel gather costs ~45 ms/array at
    # 1080p). Light ids ride as f32 — exact for pools < 2^24 lights.
    packed = jnp.concatenate([prev.y.astype(jnp.float32)[..., None], prev.uv,
                              prev.M[..., None], prev.W[..., None]], -1)
    pw = warp_image(packed, motion, shard=shard, halo=HALO, bilinear=False)
    ty = jnp.round(pw[..., 0]).astype(jnp.int32).reshape(R)
    tuv = pw[..., 1:3].reshape(R, 2)
    tM = jnp.minimum(pw[..., 3].reshape(R), M_CLAMP_TEMPORAL)
    tW = pw[..., 4].reshape(R)
    t_ok = on_screen & (ty >= 0)
    # refresh the temporal sample's packed row from the LIVE pool — the one
    # per-pixel pool gather in the chain (keeps animated lights current)
    Np = pool.packed.shape[0]
    trow = pool.packed[jnp.clip(ty, 0, Np - 1)]
    ph_t, _, _ = p_hat_rows(trow, jnp.where(t_ok, ty, -1), tuv)
    w_t = jnp.where(t_ok, ph_t * tW * tM, 0.0)
    u1, _, _ = _rand(pix, frame, 200)
    y, uv, row, w_sum, _ = res_update((y, uv, row, w_sum, M), ty, tuv, trow,
                                      w_t, u1)
    M = M + jnp.where(t_ok, tM, 0.0)

    # ---- boiling filter (ref RTXDI BoilingFilter.hlsli) ----
    if boiling_mult > 0.0:
        kill = boiling_filter_mask(jnp.reshape(w_sum, (H, W)),
                                   jnp.reshape(y >= 0, (H, W)),
                                   mult=boiling_mult, shard=shard).reshape(R)
        y = jnp.where(kill, -1, y)
        w_sum = jnp.where(kill, 0.0, w_sum)

    # ---- spatial reuse (SpatialResampling): merge K jittered neighbors ----
    # Snapshot the post-temporal reservoir with each pixel's contribution
    # weight W evaluated at ITS OWN surface (ping-pong, like the reference's
    # spatial pass reading the previous stage's buffer). The merge then
    # reweights the neighbor's sample by p-hat at the CURRENT surface:
    #   cand_w = ph_here(y_n) * W_n * M_n
    # where W_n = w_sum_n / (M_n * ph_n(y_n)) uses the NEIGHBOR's p-hat —
    # evaluating both at the current surface would cancel algebraically.
    ph_s, _, _ = p_hat_rows(row, y, uv)
    W_snap = jnp.where((y >= 0) & (ph_s > 0),
                       w_sum / jnp.maximum(M * ph_s, 1e-20), 0.0)
    # TPU redesign: each tap k uses ONE frame-wide offset (a device scalar
    # from counter RNG) instead of per-pixel jitter, so a neighbor fetch is a
    # single dynamic_slice over the halo-extended domain rather than a ~45 ms
    # per-pixel gather. Offsets rotate every frame; the similarity test and
    # own-surface W reweighting keep the merge unbiased regardless of how
    # neighbors are chosen (the choice is value-independent).
    snap = jnp.concatenate([
        jnp.reshape(y, (H, W)).astype(jnp.float32)[..., None],
        jnp.reshape(uv, (H, W, 2)),
        jnp.reshape(W_snap, (H, W))[..., None],
        jnp.reshape(M, (H, W))[..., None],
        gb.normal, gb.depth[..., None],
        gb.valid.astype(jnp.float32)[..., None],
        jnp.reshape(row, (H, W, 16))], -1)
    PADX = HALO
    snap_e = jnp.pad(shu.extend_rows(snap, HALO, shard),
                     ((0, 0), (PADX, PADX), (0, 0)), mode="edge")
    d_c = gb.depth.reshape(R)
    for k in range(spatial_taps):
        kb = pcg3d(jnp.stack([jnp.asarray(k + 1, jnp.uint32),
                              frame, jnp.asarray(0x5EED, jnp.uint32)])[None])[0]
        u_a = uniform_from_bits(kb[0])
        u_b = uniform_from_bits(kb[1])
        ang = u_a * (2 * jnp.pi)
        rad_px = 1.0 + jnp.sqrt(u_b) * (SPATIAL_RADIUS - 1.0)
        dx = jnp.round(jnp.cos(ang) * rad_px).astype(jnp.int32)
        dy = jnp.round(jnp.sin(ang) * rad_px).astype(jnp.int32)
        nb = jax.lax.dynamic_slice(snap_e, (HALO + dy, PADX + dx,
                                            jnp.int32(0)), (H, W, 26))
        yy = jnp.round(nb[..., 0]).astype(jnp.int32).reshape(R)
        yuv = nb[..., 1:3].reshape(R, 2)
        W_n = nb[..., 3].reshape(R)
        mm = nb[..., 4].reshape(R)
        n_n = nb[..., 5:8].reshape(R, 3)
        d_n = nb[..., 8].reshape(R)
        val_n = nb[..., 9].reshape(R) > 0.5
        yrow = nb[..., 10:26].reshape(R, 16)
        # neighbor similarity (depth + normal) guards against bias at edges
        similar = ((jnp.sum(n_n * n, -1) > 0.9)
                   & (jnp.abs(d_n - d_c) < 0.1 * jnp.maximum(d_c, 1e-3))
                   & valid & val_n)
        _, _, u_c = _rand(pix, frame, 300 + k)
        ph_here, _, _ = p_hat_rows(yrow, jnp.where(similar, yy, -1), yuv)
        w_n = jnp.where(similar & (yy >= 0), ph_here * W_n * mm, 0.0)
        y, uv, row, w_sum, _ = res_update((y, uv, row, w_sum, M), yy, yuv,
                                          yrow, w_n, u_c)
        M = M + jnp.where(similar & (yy >= 0), mm, 0.0)

    # ---- finalize W ----
    ph_y, L_y, dist_y = p_hat_rows(row, y, uv)
    Wgt = jnp.where((y >= 0) & (ph_y > 0), w_sum / jnp.maximum(M * ph_y, 1e-20), 0.0)

    # ---- shade winner with one visibility ray (ShadeSamples) ----
    is_sun = (y >= 0) & (row[:, 13] < 0.5) \
        & (jnp.round(row[:, 0]).astype(jnp.int32) == LIGHT_DIRECTIONAL)
    u_s1, u_s2, _ = _rand(pix, frame, 400)
    cos_max = jnp.cos(settings.sun_angular_radius)
    L_final = jnp.where(is_sun[..., None],
                        smp.sample_cone(L_y, cos_max, u_s1, u_s2), L_y)
    _, rad, dist = lightops.light_incident_rows(row, uv, pos)
    f = shadeops.eval_brdf(n, v, L_final, albedo, metal, rough)
    contrib = f * rad * Wgt[..., None]
    if stats_out is not None:
        stats_out["overflow"] = jnp.int32(0)
    if visibility and rt is not None:
        gn = gb.geo_normal.reshape(R, 3)
        bias = settings.shadow_bias
        o = pos + gn * bias + L_final * bias
        shoot = valid & (y >= 0) & (Wgt > 0)
        from hobbyrenderer_tpu.ops.intersect import retarget_shadow_ray
        L_vis, tmax_t = retarget_shadow_ray(pos, o, L_final, dist)
        tmax = jnp.where(shoot, tmax_t, 1e-4)
        vs = max(int(vis_scale), 1)
        if vs > 1 and min(shu.full_height(shard, H), W) < VIS_SCALE_MIN_DIM:
            # the reuse offset is <= vs PIXELS: at thumbnail sizes that is a
            # huge fraction of the image (measured +0.010 RMSE on the 96x64
            # golden gate) while at production resolutions it is sub-texel
            # scale shadow softening. Reduced-rate visibility only engages
            # at real resolutions; the golden gates measure full-rate.
            vs = 1
        if vs > 1:
            # REDUCED-RATE winner visibility (preset di_vis_scale; the
            # reference's perf presets make the same rays-vs-quality trade
            # via checkerboarding): trace the (::vs, ::vs) subgrid only.
            # A full-res lane whose winner MATCHES its quad's traced lane
            # reuses that occlusion bit (same light from a <=vs-px-offset
            # surface point — the classic reduced-res shadow approximation,
            # absorbed by RELAX+TAA); mismatched-winner lanes re-trace
            # EXACTLY in a compacted wavefront, so the reuse never crosses a
            # light boundary. The golden gates run full-rate (guard above);
            # this path is covered by the monkeypatched unit test
            # (test_reduced_rate_visibility_matches_full_rate).
            Hh, Wh = -(-H // vs), -(-W // vs)

            def sub2(a2):
                return a2.reshape((H, W) + a2.shape[1:])[::vs, ::vs]

            def up2(ah):
                e = jnp.repeat(jnp.repeat(ah, vs, 0), vs, 1)
                return e[:H, :W]

            o_h = sub2(o).reshape(-1, 3)
            d_h = sub2(L_vis).reshape(-1, 3)
            tm_h = sub2(tmax).reshape(-1)
            sh_h = sub2(shoot).reshape(-1)
            y_h = sub2(y)                        # (Hh, Wh) winner ids
            occ_h = _winner_occlusion(rt, o_h, d_h, tm_h, sh_h,
                                      y_h.reshape(-1), Hh, Wh,
                                      force_kernel, stats_out)
            occ_e = up2(occ_h.reshape(Hh, Wh)).reshape(R)
            same = (shoot & up2(sh_h.reshape(Hh, Wh)).reshape(R)
                    & (y == up2(y_h).reshape(R)))
            mismatch = shoot & ~same
            CAPm = max(R // 64, 1024)
            rank = jnp.cumsum(mismatch.astype(jnp.int32)) - 1
            slot = jnp.where(mismatch & (rank < CAPm), rank, CAPm)
            sel = jnp.full((CAPm + 1,), R, jnp.int32) \
                .at[slot].set(jnp.arange(R, dtype=jnp.int32),
                              mode="drop")[:CAPm]
            pad = sel >= R
            selc = jnp.minimum(sel, R - 1)
            o_c = jnp.where(pad[:, None], 0.0, o[selc])
            d_c = jnp.where(pad[:, None], 0.0, L_vis[selc])
            tm_c = jnp.where(pad, 0.0, tmax[selc])
            from hobbyrenderer_tpu.ops import trace as traceops
            occ_c = traceops.any_hit_auto(rt, o_c, d_c, t_max=tm_c,
                                          active=~pad, max_steps=256)
            # past-cap mismatches: conservative occluded (ADVICE r3 rule)
            occ_m = jnp.where(mismatch & (rank >= CAPm), True,
                              jnp.zeros(R, bool).at[sel].set(
                                  occ_c & ~pad, mode="drop"))
            occ = jnp.where(same, occ_e, occ_m)
            if stats_out is not None:
                n_mm = jnp.sum(mismatch.astype(jnp.int32))
                stats_out["overflow"] = stats_out.get(
                    "overflow", jnp.int32(0)) + jnp.maximum(n_mm - CAPm, 0)
        else:
            occ = _winner_occlusion(rt, o, L_vis, tmax, shoot, y, H, W,
                                    force_kernel, stats_out)
        contrib = jnp.where(occ[..., None], 0.0, contrib)
    contrib = jnp.where((valid & (y >= 0))[..., None], contrib, 0.0)

    new_res = Reservoir(y=y.reshape(H, W), uv=uv.reshape(H, W, 2),
                        w_sum=w_sum.reshape(H, W),
                        M=M.reshape(H, W), W=Wgt.reshape(H, W))
    return contrib.reshape(H, W, 3), new_res
