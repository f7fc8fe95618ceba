"""Software meshlet rasterizer → visibility buffer → G-buffer resolve.

Reference: the AS/MS meshlet raster pipeline (src/shaders/BasePass.hlsl:83-171 —
amplification-shader meshlet culling, mesh-shader vertex decode, pixel-shader
G-buffer write) plus the classic VS fallback. The D3D12 hardware rasterizer/ROPs do
triangle setup, depth test and attribute interpolation there.

TPU-first redesign (no raster hardware, SURVEY.md §7 "hard parts"):
- **Visibility-buffer split**: the raster loop writes only (depth f32, visid i32)
  per pixel; a separate fully-regular per-pixel RESOLVE pass recomputes barycentrics
  and interpolates attributes. This keeps the irregular inner loop tiny and makes
  the attribute path a pure VPU workload.
- **Meshlet = raster work unit**: visible (instance, meshlet) slots from culling are
  binned to screen tiles by meshlet screen AABB (capacity-bounded per-tile lists via
  cumsum scatter — the InterlockedAdd analogue). Each tile then scans its meshlet
  list; triangles are evaluated as edge functions over the tile's pixel block,
  vectorized over (tiles, tri_chunk, pixels).
- Reversed-Z: depth = z_ndc, larger = nearer, cleared to 0.
- No near clipping: triangles with any vertex at w <= eps are dropped (acceptable
  for v1; the reference relies on HW clipping).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.scene.cooker import MESHLET_MAX_TRIS, MESHLET_MAX_VERTS
from hobbyrenderer_tpu.scene.gpu import (MAT_ALPHA_CUTOFF, MAT_BASE_COLOR, MAT_EMISSIVE,
                                         MAT_METALLIC, MAT_ROUGHNESS, MATI_DOUBLE_SIDED)
from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d

TILE = 32            # pixels per tile side


class RasterOutput(NamedTuple):
    depth: jnp.ndarray    # (H, W) f32 reversed-Z, 0 = far
    visid: jnp.ndarray    # (H, W) i32: slot * MESHLET_MAX_TRIS + tri, -1 = none
    overflow: jnp.ndarray  # () i32 count of (tile, meshlet) bin overflows (stats)


class RasterAux(NamedTuple):
    """Per-slot-triangle records consumed by the G-buffer resolve.

    Built once per frame at (visible-slot, triangle) granularity with one-hot
    MXU matmuls, so the per-PIXEL resolve needs only two contiguous row gathers
    (tri_screen + tri_attr) instead of ~12 element gathers (TPU gathers are
    per-element latency-bound; this took resolve from 640ms to tens of ms)."""

    tri_screen: jnp.ndarray  # (C, 96, 3, 4): screen x, y, z_ndc, 1/w
    tri_attr: jnp.ndarray    # (C, 96, 3, 12): world pos(3), world normal(3),
    #                          uv(2), prev-frame world pos(3), material id(1)


def _transform_meshlet_vertices(gpu, vc, slots, slot_valid):
    """Gather + transform the vertices of each visible meshlet slot.

    Uses the meshlet-major baked layout (SceneGPU.ml_pos): one contiguous ROW
    gather per meshlet instead of per-vertex element gathers (TPU gathers are
    latency-bound per element; rows are cheap).

    Returns (screen_xy (C,64,2), zndc (C,64), w (C,64), vert_valid (C,64),
             meshlet ids (C,))."""
    inst = jnp.where(slot_valid, gpu.pair_inst[slots], 0)
    ml = jnp.where(slot_valid, gpu.pair_meshlet[slots], 0)
    vcnt = gpu.ml_vert_count[ml]
    lanes = jnp.arange(MESHLET_MAX_VERTS, dtype=jnp.int32)[None, :]
    vert_valid = lanes < vcnt[:, None]
    p_obj = gpu.ml_pos[ml]                                       # (C,64,3) row gather
    W = gpu.inst_transform[inst]                                 # (C,4,4)
    p_world = jnp.einsum("cij,cvj->cvi", W[:, :3, :3], p_obj) + W[:, None, :3, 3]
    VP = vc["view_proj"]
    clip = jnp.einsum("ij,cvj->cvi", VP[:3, :3], p_world) + VP[:3, 3][None, None, :]
    w = jnp.einsum("j,cvj->cv", VP[3, :3], p_world) + VP[3, 3]
    w_safe = jnp.where(w > 1e-6, w, 1.0)
    ndc = clip / w_safe[..., None]
    width, height = vc["viewport"][0], vc["viewport"][1]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height
    screen = jnp.stack([sx, sy], -1)
    return screen, ndc[..., 2], w, vert_valid & (w > 1e-6), ml, p_world


def _tri_onehot(gpu, ml, slot_valid):
    """(C, 288, 64) one-hot of the meshlet-local triangle indices + (C,96) valid."""
    tcnt = gpu.ml_tri_count[ml]
    lanes = jnp.arange(MESHLET_MAX_TRIS, dtype=jnp.int32)[None, :]
    lt = gpu.ml_ltris[ml]                                         # (C,96,3) row gather
    tri_valid = (lanes < tcnt[:, None]) & slot_valid[:, None]
    C = lt.shape[0]
    onehot = (lt.reshape(C, MESHLET_MAX_TRIS * 3, 1)
              == jnp.arange(MESHLET_MAX_VERTS, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.float32)                               # (C,288,64)
    return onehot, tri_valid


def _tri_expand(onehot, feats):
    """onehot (C,288,64) @ feats (C,64,F) -> (C,96,3,F) on the MXU."""
    C, _, F = feats.shape[0], feats.shape[1], feats.shape[2]
    out = jax.lax.dot_general(onehot, feats, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    return out.reshape(C, MESHLET_MAX_TRIS, 3, F)


def build_raster_aux(gpu, vc, slots, slot_valid, screen, zndc, w, vert_ok,
                     ml, p_world, onehot) -> "RasterAux":
    """Per-slot-triangle records for the resolve pass (see RasterAux)."""
    inst = jnp.where(slot_valid, gpu.pair_inst[slots], 0)
    attr = gpu.ml_attr[ml]                                        # (C,64,3) u32 rows
    n_obj, _sign = hm.unpack_normal_oct(attr[..., 0], xp=jnp)     # (C,64,3)
    uv = hm.unpack_uv_half2(attr[..., 1], xp=jnp)                 # (C,64,2)
    Nm = gpu.inst_normal_mat[inst]
    n_world = jnp.einsum("cij,cvj->cvi", Nm, n_obj)
    Wp = gpu.inst_prev_transform[inst]
    p_obj = gpu.ml_pos[ml]
    p_prev = jnp.einsum("cij,cvj->cvi", Wp[:, :3, :3], p_obj) + Wp[:, None, :3, 3]
    matf = gpu.inst_material[inst].astype(jnp.float32)
    C, V = p_world.shape[0], p_world.shape[1]
    attr_feats = jnp.concatenate([
        p_world, n_world, uv, p_prev,
        jnp.broadcast_to(matf[:, None, None], (C, V, 1))], -1)    # (C,64,12)
    tri_attr = _tri_expand(onehot, attr_feats)                    # (C,96,3,12)

    scr_feats = jnp.concatenate([
        screen, zndc[..., None],
        (1.0 / jnp.maximum(w, 1e-6))[..., None]], -1)             # (C,64,4)
    tri_screen = _tri_expand(onehot, scr_feats)                   # (C,96,3,4)
    return RasterAux(tri_screen=tri_screen, tri_attr=tri_attr)


def build_worklist(screen, vert_ok, slot_valid, width, height,
                   capacity: int,
                   ty0: int = 0, ty_count: int = None,
                   sub_count=None, n_sub: int = 1):
    """Meshlet screen AABB -> flat (tile, slot) work list.

    Replaces per-tile fixed-capacity lists: raster work becomes proportional to
    the ACTUAL (meshlet x covered-tile) count, compacted by prefix sum (the
    InterlockedAdd-append analogue, GPUCulling.hlsl:104-146).

    ty0/ty_count select a band of tile rows (framebuffer row-sharding across the
    device mesh, SURVEY.md §5.8). Returned tile ids are band-local.

    sub_count (C,) i32 in [1, n_sub] emits sub_count[s] work items per covered
    tile with slot ids s * n_sub + k — the Pallas kernel's 32-triangle record
    chunks (only LIVE chunks get work items; a 52-tri meshlet emits 2 of 3).

    Returns (work_tile (Wcap,), work_slot (Wcap,), count, overflow)."""
    big = jnp.float32(1e9)
    xy = jnp.where(vert_ok[..., None], screen, big)
    mn = jnp.min(xy, axis=1)                      # (C, 2)
    xy = jnp.where(vert_ok[..., None], screen, -big)
    mx = jnp.max(xy, axis=1)
    any_vert = vert_ok.any(1) & slot_valid
    tx = -(-width // TILE)
    ty_full = -(-height // TILE)
    ty = ty_full if ty_count is None else ty_count
    t0 = jnp.clip(jnp.floor(mn / TILE).astype(jnp.int32), 0,
                  jnp.asarray([tx - 1, ty_full - 1]))
    t1 = jnp.clip(jnp.floor(mx / TILE).astype(jnp.int32), 0,
                  jnp.asarray([tx - 1, ty_full - 1]))
    on_screen = (mx[:, 0] >= 0) & (mx[:, 1] >= 0) & (mn[:, 0] < width) & (mn[:, 1] < height)
    ok = any_vert & on_screen

    C_ = screen.shape[0]
    T = tx * ty
    # band-local rect in tile space
    bx0 = t0[:, 0]
    bx1 = t1[:, 0]
    by0 = jnp.clip(t0[:, 1] - ty0, 0, ty - 1)
    by1 = jnp.clip(t1[:, 1] - ty0, 0, ty - 1)
    in_band = (t1[:, 1] >= ty0) & (t0[:, 1] <= ty0 + ty - 1)
    ok = ok & in_band
    nx = bx1 - bx0 + 1
    nyc = by1 - by0 + 1
    sub = (jnp.ones((C_,), jnp.int32) if sub_count is None
           else jnp.clip(sub_count, 1, n_sub))
    n = jnp.where(ok, nx * nyc * sub, 0)                           # (C,) covers

    # RECT EMISSION (no (C, T) cover matrix, no multi-million-element scatter):
    # exclusive-prefix offsets per slot, scatter only C segment heads, then a
    # cumulative-max fill expands them into the per-work slot ids.
    offs = jnp.cumsum(n) - n
    count = jnp.sum(n)
    overflow = jnp.maximum(count - capacity, 0)
    heads = jnp.full((capacity + 1,), -1, jnp.int32)
    dst = jnp.where(ok & (offs < capacity), offs, capacity)
    heads = heads.at[dst].max(jnp.arange(C_, dtype=jnp.int32))[:capacity]
    work_slot = jax.lax.cummax(heads)
    pos_in_work = jnp.arange(capacity, dtype=jnp.int32)
    valid = (pos_in_work < count) & (work_slot >= 0)
    ws = jnp.maximum(work_slot, 0)
    k = pos_in_work - offs[ws]
    # item k of slot s = (tile index k // sub[s], sub-slot k % sub[s])
    ksub = k % jnp.maximum(sub[ws], 1)
    k = k // jnp.maximum(sub[ws], 1)
    dx = k % jnp.maximum(nx[ws], 1)
    dy = k // jnp.maximum(nx[ws], 1)
    tile = (by0[ws] + dy) * tx + (bx0[ws] + dx)
    tile = jnp.where(valid, tile, T)                # sentinel: dropped by segments
    out_slot = ws * n_sub + ksub if n_sub > 1 else ws
    work_slot = jnp.where(valid, out_slot, -1)
    # sort by tile id so depth/vis folds are segment reductions over sorted ids
    order = jnp.argsort(tile)
    return tile[order], work_slot[order], jnp.minimum(count, capacity), overflow


RASTER_BACKEND = "auto"   # "auto" | "pallas" | "xla" (auto: pallas on TPU)


def _use_pallas(backend):
    b = backend or RASTER_BACKEND
    if b == "auto":
        return jax.default_backend() == "tpu"
    return b == "pallas"


def rasterize(gpu, vc, slots, width: int, height: int,
              worklist_capacity: int = None,
              batch: int = 256,
              tri_chunk: int = MESHLET_MAX_TRIS,
              double_sided_all: bool = False,
              y0: int = 0, shard_height: int = None,
              depth_only: bool = False,
              max_per_tile: int = None,
              backend: str = None,
              resolve_attrs: bool = False) -> RasterOutput:
    """Rasterize visible meshlet slots into a visibility buffer.

    TPU-first architecture (v3): a flat TILE-SORTED (tile, meshlet) work list
    replaces per-tile capacity lists; the depth test is two segment reductions:

      phase A: per work batch, evaluate the meshlet's triangles over its 32x32
               tile -> per-work candidate depth rows (CONTIGUOUS writes into a
               (Wcap, 1024) buffer — no scatter); then one segment_max over the
               sorted tile ids folds work rows into the (T, 1024) depth buffer.
      phase B: re-evaluate, keep triangle ids where the depth equals the final
               depth (bitwise — same arithmetic), segment_max the ids.

    Work executed is proportional to actual coverage: a fori_loop with a
    DYNAMIC trip count (ceil(work_count / batch)) walks the compacted list, so
    padded capacity costs memory only. History: a fixed tiles x max_per_tile
    scan was 13.9s @1080p; scatter-max phases 0.4-0.5s (scatter-bound); this
    segment-reduction form removes the scatters entirely.

    slots: (C,) i32 compacted visible pair ids (-1 padded) from ops.culling.
    y0/shard_height: rasterize only pixel rows [y0, y0+shard_height) — the
    per-device band under framebuffer row-sharding (y0 must be TILE-aligned).
    max_per_tile: accepted for API compat; ignored (no per-tile capacity).
    """
    if shard_height is None:
        shard_height = height
    if isinstance(y0, int):
        assert y0 % TILE == 0, "shard origin must be tile-aligned"
    C = slots.shape[0]
    if worklist_capacity is None:
        worklist_capacity = max(8 * C, 4096)
    slot_valid = slots >= 0
    screen, zndc, w, vert_ok, ml, p_world = _transform_meshlet_vertices(
        gpu, vc, slots, slot_valid)
    onehot, tri_valid = _tri_onehot(gpu, ml, slot_valid)
    tri_feats = _tri_expand(onehot, jnp.concatenate(
        [screen, zndc[..., None], vert_ok.astype(jnp.float32)[..., None]], -1))
    tv = tri_feats[..., 0:2]
    tz = tri_feats[..., 2]
    tok = (tri_feats[..., 3] > 0.5).all(-1) & tri_valid
    aux = None if depth_only else build_raster_aux(
        gpu, vc, slots, slot_valid, screen, zndc, w, vert_ok, ml, p_world, onehot)

    # single-sided backface cull (glTF CCW front in RH; screen y-down flips sign)
    e1 = tv[:, :, 1] - tv[:, :, 0]
    e2 = tv[:, :, 2] - tv[:, :, 0]
    area2 = e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0]      # (C, 96)
    if not double_sided_all:
        inst = jnp.where(slot_valid, gpu.pair_inst[slots], 0)
        ds = gpu.mat_i[gpu.inst_material[inst], MATI_DOUBLE_SIDED] > 0
        tok &= (area2 < 0.0) | ds[:, None]
    tok &= jnp.abs(area2) > 1e-12
    inv_a2 = jnp.where(jnp.abs(area2) > 1e-12, 1.0 / area2, 0.0)

    ty0 = y0 // TILE
    ty = -(-shard_height // TILE)
    tx = -(-width // TILE)
    T = tx * ty

    PIX = TILE * TILE
    TC = tri_chunk
    assert MESHLET_MAX_TRIS % TC == 0, \
        f"tri_chunk {TC} must divide {MESHLET_MAX_TRIS} (tail would be dropped)"
    n_chunks = MESHLET_MAX_TRIS // TC

    # Affine triangle setup: lambda1/lambda2/depth as plane equations over screen
    # space — the per-pixel inner loop then evaluates 3 affine functions (6 FMA)
    # with a single (B, R, P) temp instead of materializing ~10 edge-function
    # intermediates (the previous form was HBM-bound on those temps).
    coeff = _tri_affine_coeffs(tv, tz, inv_a2, tok)                 # (C, 96, 10)

    if _use_pallas(backend):
        # Pallas tile kernel: depth/vis accumulators live in VMEM; per-item
        # records stream via double-buffered DMA (see ops/raster_pallas.py).
        # Records are split into 32-triangle chunks with one worklist item per
        # LIVE chunk (most meshlets carry < 96 real triangles), so kernel VPU
        # work tracks real triangle count; ids keep the slot*96+tri encoding.
        from hobbyrenderer_tpu.ops import raster_pallas as rp
        interp = jax.default_backend() != "tpu"
        Hp, Wp = ty * TILE, tx * TILE
        tri_cnt = jnp.where(slot_valid, gpu.ml_tri_count[ml], 1)
        slot_chunks = jnp.clip(
            (tri_cnt + rp.TRI_CHUNK - 1) // rp.TRI_CHUNK,
            1, rp.N_CHUNKS).astype(jnp.int32)
        work_tile, work_slot, work_count, overflow = build_worklist(
            screen, vert_ok, slot_valid, width, height,
            2 * worklist_capacity, ty0=ty0, ty_count=ty,
            sub_count=slot_chunks, n_sub=rp.N_CHUNKS)
        if resolve_attrs and not depth_only:
            records = rp.build_full_records(coeff, aux.tri_screen, aux.tri_attr)
            records = records.reshape(-1, rp.TRI_CHUNK, records.shape[-1])
            depth_t, vis_t, attr_t = rp.raster_resolve_tiles(
                records, work_tile, work_slot, tiles=T, tx=tx,
                ty0=ty0, interpret=interp)
            attr_img = (attr_t.reshape(ty, tx, rp.ATTR_ROWS, TILE, TILE)
                        .transpose(0, 3, 1, 4, 2)
                        .reshape(Hp, Wp, rp.ATTR_ROWS)
                        [:shard_height, :width])
        else:
            records = rp.build_tri_records(coeff)
            records = records.reshape(-1, rp.TRI_CHUNK, records.shape[-1])
            depth_t, vis_t = rp.raster_tiles(
                records, work_tile, work_slot, tiles=T, tx=tx,
                ty0=ty0, depth_only=depth_only, interpret=interp)
            attr_img = None
        depth_img = depth_t.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3).reshape(Hp, Wp)
        vis_img = vis_t.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3).reshape(Hp, Wp)
        out = RasterOutput(depth_img[:shard_height, :width],
                           vis_img[:shard_height, :width], overflow)
        if resolve_attrs:
            return out, aux, attr_img
        return out, aux

    work_tile, work_slot, work_count, overflow = build_worklist(
        screen, vert_ok, slot_valid, width, height, worklist_capacity,
        ty0=ty0, ty_count=ty)
    ly, lx = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    local = jnp.stack([lx.reshape(-1), ly.reshape(-1)], -1).astype(jnp.float32) + 0.5

    B = batch
    n_batches = (work_count + B - 1) // B

    def batch_data(b):
        w0i = b * B
        btile = jax.lax.dynamic_slice_in_dim(work_tile, w0i, B)     # (B,)
        bslot = jax.lax.dynamic_slice_in_dim(work_slot, w0i, B)
        bvalid = bslot >= 0
        s = jnp.where(bvalid, bslot, 0)
        org = jnp.stack([(btile % tx) * TILE,
                         (btile // tx + ty0) * TILE], -1).astype(jnp.float32)
        px = org[:, None, :] + local[None, :, :]                    # (B, P, 2)
        return btile, s, bvalid, px

    def item_depth_id(s, bvalid, px):
        """(best depth, best triangle id) per pixel across the item's triangles."""
        cf = coeff[s]                                               # (B, 96, 10) rows
        okb = (cf[..., 9] > 0.5) & bvalid[:, None]
        acc_z = jnp.full((B, PIX), -1.0)
        acc_id = jnp.full((B, PIX), -1, jnp.int32)
        x = px[:, None, :, 0]                                       # (B, 1, P)
        y = px[:, None, :, 1]
        for c in range(n_chunks):
            sl = slice(c * TC, (c + 1) * TC)
            cc = cf[:, sl]                                          # (B, R, 10)
            l1 = cc[..., 0:1] * x + cc[..., 1:2] * y + cc[..., 2:3]
            l2 = cc[..., 3:4] * x + cc[..., 4:5] * y + cc[..., 5:6]
            zaff = cc[..., 6:7] * x + cc[..., 7:8] * y + cc[..., 8:9]
            inside = (l1 >= 0) & (l2 >= 0) & (l1 + l2 <= 1.0) & okb[:, sl, None]
            zpix = jnp.where(inside, zaff, -1.0)                    # (B, R, P)
            best = jnp.argmax(zpix, axis=1)                         # (B, P)
            bz = jnp.take_along_axis(zpix, best[:, None, :], axis=1)[:, 0, :]
            tid = s[:, None] * MESHLET_MAX_TRIS + (c * TC + best)
            upd = bz > acc_z
            acc_z = jnp.where(upd, bz, acc_z)
            acc_id = jnp.where(upd, tid, acc_id)
        return acc_z, acc_id

    # ---- single eval pass: per-work candidate (depth, id) rows, contiguous ----
    def eval_batch(b, bufs):
        depth_w, tid_w = bufs
        btile, s, bvalid, px = batch_data(b)
        dz, di = item_depth_id(s, bvalid, px)                       # (B, P)
        dz = jnp.where(bvalid[:, None] & (dz > 0.0), dz, -1.0)
        di = jnp.where(dz > 0.0, di, -1)
        return (jax.lax.dynamic_update_slice_in_dim(depth_w, dz, b * B, axis=0),
                jax.lax.dynamic_update_slice_in_dim(tid_w, di, b * B, axis=0))

    depth_w, tid_w = jax.lax.fori_loop(
        0, n_batches, eval_batch,
        (jnp.full((worklist_capacity, PIX), -1.0),
         jnp.full((worklist_capacity, PIX), -1, jnp.int32)))

    # fold per tile: depth by segment_max; ids by bitwise-equal depth match
    depth_t = jax.ops.segment_max(depth_w, work_tile, num_segments=T + 1,
                                  indices_are_sorted=True)[:T]
    depth_t = jnp.maximum(depth_t, 0.0)                             # empty tiles -> far
    if depth_only:
        vis_t = jnp.full((T, PIX), -1, jnp.int32)   # shadow passes: depth suffices
    else:
        final_rows = depth_t[jnp.minimum(work_tile, T - 1)]         # (Wcap, P) rows
        vis_w = jnp.where((depth_w == final_rows) & (depth_w > 0.0), tid_w, -1)
        vis_t = jax.ops.segment_max(vis_w, work_tile, num_segments=T + 1,
                                    indices_are_sorted=True)[:T]
        vis_t = jnp.maximum(vis_t, -1)                              # empty tiles -> -1

    # un-tile: (T, P) -> (shard_height, W) (tiles may extend past the band; crop)
    Hp, Wp = ty * TILE, tx * TILE
    depth_img = depth_t.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3).reshape(Hp, Wp)
    vis_img = vis_t.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3).reshape(Hp, Wp)
    out = RasterOutput(depth_img[:shard_height, :width],
                       vis_img[:shard_height, :width], overflow)
    if resolve_attrs:
        return out, aux, None   # XLA path resolves from aux row-gathers
    return out, aux


def rasterize_shadow_atlas(gpu, vps, slots, res: int,
                           worklist_capacity: int = None,
                           backend: str = None) -> jnp.ndarray:
    """Depth-only raster of N light views into one vertical atlas, one kernel.

    The reference renders each CSM cascade as its own culling + depth pass
    (src/ShadowRenderer.cpp); on TPU the per-pass fixed costs (vertex gather,
    one-hot triangle expansion, worklist sort, kernel launch) dominate a
    1024^2 depth raster, so all cascades share ONE slot table and ONE raster:
    a slot encodes (view, pair) as ``view * num_pairs + pair``, its meshlet is
    projected with the view's matrix and offset by ``view * res`` rows in the
    atlas, and the tile worklist spans the (n_views * res, res) target.

    vps (N, 4, 4) light view-proj matrices; slots (C,) compacted flattened
    (view, pair) ids (-1 padded). Returns depth (N, res, res), reversed-Z.
    """
    n_views = vps.shape[0]
    D = gpu.pair_inst.shape[0]
    C = slots.shape[0]
    if worklist_capacity is None:
        worklist_capacity = max(8 * C, 4096)
    slot_valid = slots >= 0
    s = jnp.where(slot_valid, slots, 0)
    view_i = s // D
    pair = s % D
    inst = gpu.pair_inst[pair]
    ml = gpu.pair_meshlet[pair]

    vcnt = gpu.ml_vert_count[ml]
    lanes = jnp.arange(MESHLET_MAX_VERTS, dtype=jnp.int32)[None, :]
    vert_valid = lanes < vcnt[:, None]
    p_obj = gpu.ml_pos[ml]                                        # (C, 64, 3)
    W = gpu.inst_transform[inst]
    p_world = jnp.einsum("cij,cvj->cvi", W[:, :3, :3], p_obj) + W[:, None, :3, 3]
    VP = vps[view_i]                                              # (C, 4, 4)
    clip = jnp.einsum("cij,cvj->cvi", VP[:, :3, :3], p_world) + VP[:, None, :3, 3]
    w = jnp.einsum("cj,cvj->cv", VP[:, 3, :3], p_world) + VP[:, 3, 3][:, None]
    w_safe = jnp.where(w > 1e-6, w, 1.0)
    ndc = clip / w_safe[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * res
    sy = (0.5 - ndc[..., 1] * 0.5) * res + (view_i * res)[:, None].astype(jnp.float32)
    screen = jnp.stack([sx, sy], -1)
    vert_ok = vert_valid & (w > 1e-6)

    onehot, tri_valid = _tri_onehot(gpu, ml, slot_valid)
    tri_feats = _tri_expand(onehot, jnp.concatenate(
        [screen, ndc[..., 2:3], vert_ok.astype(jnp.float32)[..., None]], -1))
    tv = tri_feats[..., 0:2]
    tz = tri_feats[..., 2]
    tok = (tri_feats[..., 3] > 0.5).all(-1) & tri_valid           # double-sided
    e1 = tv[:, :, 1] - tv[:, :, 0]
    e2 = tv[:, :, 2] - tv[:, :, 0]
    area2 = e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0]
    tok &= jnp.abs(area2) > 1e-12
    inv_a2 = jnp.where(jnp.abs(area2) > 1e-12, 1.0 / area2, 0.0)
    coeff = _tri_affine_coeffs(tv, tz, inv_a2, tok)

    tx = res // TILE
    ty = n_views * res // TILE
    T = tx * ty

    if _use_pallas(backend):
        from hobbyrenderer_tpu.ops import raster_pallas as rp
        tri_cnt = jnp.where(slot_valid, gpu.ml_tri_count[ml], 1)
        slot_chunks = jnp.clip(
            (tri_cnt + rp.TRI_CHUNK - 1) // rp.TRI_CHUNK,
            1, rp.N_CHUNKS).astype(jnp.int32)
        work_tile, work_slot, _wc, _ov = build_worklist(
            screen, vert_ok, slot_valid, res, n_views * res,
            2 * worklist_capacity, sub_count=slot_chunks, n_sub=rp.N_CHUNKS)
        records = rp.build_tri_records(coeff)
        records = records.reshape(-1, rp.TRI_CHUNK, records.shape[-1])
        depth_t, _vis = rp.raster_tiles(records, work_tile, work_slot,
                                        tiles=T,
                                        tx=tx, depth_only=True,
                                        interpret=jax.default_backend() != "tpu")
    else:
        work_tile, work_slot, _wc, _ov = build_worklist(
            screen, vert_ok, slot_valid, res, n_views * res, worklist_capacity)
        # XLA fallback (CPU tests): reuse the segment-reduction path
        PIXn = TILE * TILE
        B = 256
        n_batches = (worklist_capacity + B - 1) // B
        ly, lx = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
        local = jnp.stack([lx.reshape(-1), ly.reshape(-1)], -1).astype(jnp.float32) + 0.5

        def eval_batch(b, depth_w):
            w0i = b * B
            btile = jax.lax.dynamic_slice_in_dim(work_tile, w0i, B)
            bslot = jax.lax.dynamic_slice_in_dim(work_slot, w0i, B)
            bvalid = bslot >= 0
            sb = jnp.where(bvalid, bslot, 0)
            org = jnp.stack([(btile % tx) * TILE,
                             (btile // tx) * TILE], -1).astype(jnp.float32)
            px = org[:, None, :] + local[None, :, :]
            cf = coeff[sb]
            okb = (cf[..., 9] > 0.5) & bvalid[:, None]
            x = px[:, None, :, 0]
            y = px[:, None, :, 1]
            l1 = cf[..., 0:1] * x + cf[..., 1:2] * y + cf[..., 2:3]
            l2 = cf[..., 3:4] * x + cf[..., 4:5] * y + cf[..., 5:6]
            zaff = cf[..., 6:7] * x + cf[..., 7:8] * y + cf[..., 8:9]
            inside = (l1 >= 0) & (l2 >= 0) & (l1 + l2 <= 1.0) & okb[..., None]
            dz = jnp.max(jnp.where(inside, zaff, -1.0), axis=1)
            return jax.lax.dynamic_update_slice_in_dim(depth_w, dz, w0i, axis=0)

        depth_w = jax.lax.fori_loop(0, n_batches, eval_batch,
                                    jnp.full((worklist_capacity, PIXn), -1.0))
        depth_t = jax.ops.segment_max(depth_w, work_tile, num_segments=T + 1,
                                      indices_are_sorted=True)[:T]
        depth_t = jnp.maximum(depth_t, 0.0)

    Hp = ty * TILE
    depth = (depth_t.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3)
             .reshape(Hp, res))
    return depth.reshape(n_views, res, res)


def _tri_affine_coeffs(tv, tz, inv_a2, tok):
    """Per-triangle plane equations: lambda1, lambda2 and depth as affine
    functions of screen position. Returns (C, 96, 10):
    [l1x,l1y,l1c, l2x,l2y,l2c, dx,dy,dc, ok]."""
    va, vb, vc2 = tv[..., 0, :], tv[..., 1, :], tv[..., 2, :]       # (C,96,2)

    def edge_affine(p0, p1):
        # E(p) = cross2(p1-p0, p - p0) = -dy*x + dx*y + (dy*p0x - dx*p0y)
        d = p1 - p0
        return (-d[..., 1], d[..., 0],
                d[..., 1] * p0[..., 0] - d[..., 0] * p0[..., 1])

    # lambda1 = E(vc2->va... ) / area: lambda_b uses edge (c, a)
    bx, by, bc = edge_affine(vc2, va)
    cx, cy, cc = edge_affine(va, vb)
    l1x, l1y, l1c = bx * inv_a2, by * inv_a2, bc * inv_a2
    l2x, l2y, l2c = cx * inv_a2, cy * inv_a2, cc * inv_a2
    z0, z1, z2 = tz[..., 0], tz[..., 1], tz[..., 2]
    dx = l1x * (z1 - z0) + l2x * (z2 - z0)
    dy = l1y * (z1 - z0) + l2y * (z2 - z0)
    dc = z0 + l1c * (z1 - z0) + l2c * (z2 - z0)
    return jnp.stack([l1x, l1y, l1c, l2x, l2y, l2c, dx, dy, dc,
                      tok.astype(jnp.float32)], -1)


class GBuffer(NamedTuple):
    """Deferred G-buffer (ref formats at src/Renderer.h:111-118)."""

    albedo: jnp.ndarray      # (H, W, 3)
    normal: jnp.ndarray      # (H, W, 3) world-space shading normal
    geo_normal: jnp.ndarray  # (H, W, 3) world-space geometric normal
    orm: jnp.ndarray         # (H, W, 3) occlusion, roughness, metallic
    emissive: jnp.ndarray    # (H, W, 3)
    motion: jnp.ndarray      # (H, W, 2) pixels, prev - cur
    world_pos: jnp.ndarray   # (H, W, 3)
    depth: jnp.ndarray       # (H, W) reversed-Z
    material: jnp.ndarray    # (H, W) i32 material id (-1 = sky)
    valid: jnp.ndarray       # (H, W) bool (stencil==1 analogue)
    alpha: jnp.ndarray = None  # (H, W) alpha margin (sampled alpha - cutoff)



def resolve_gbuffer(gpu, vc, raster: RasterOutput, slots, aux: RasterAux = None,
                    sample_textures=None, y0: int = 0,
                    attr_img=None, textured: bool = True,
                    want_feedback: bool = False,
                    want_tex_debug: bool = False,
                    pix_ids=None, tex_lod_mode: str = "deriv") -> GBuffer:
    """Per-pixel attribute resolve from the visibility buffer.

    Two sources (the reference does this in the raster pixel shader,
    BasePass.hlsl:271-518):
    - ``attr_img`` (H, W, 16): already-interpolated attributes from the fused
      Pallas raster+resolve kernel (ops/raster_pallas.py layout) — the fast
      path; only material lookup / motion vectors / texturing remain here.
    - ``aux``: per-slot-triangle records; interpolation happens here with TWO
      contiguous row gathers per pixel (tri_screen, tri_attr) + pure FMAs.

    pix_ids, optional (H, W) i32: each lane's GLOBAL pixel id (gy * width +
    gx). Every per-pixel quantity is elementwise, so callers may resolve a
    COMPACTED lane list shaped as a (1, N) pseudo-image — pix_ids then
    supplies the texture-RNG keys and (aux path) the true pixel centers, so
    the compacted resolve is bit-identical to the full-grid one.

    tex_lod_mode: "deriv" = screen-space uv derivatives (needs a real image
    layout — neighbors must be screen neighbors); "cone" = pixel-cone
    footprint from view distance (the PT hit-texturing rule — the only
    correct choice for compacted lane lists).
    """
    H, W = raster.depth.shape
    visid = raster.visid
    valid = visid >= 0

    if attr_img is not None:
        pos_w = attr_img[..., 0:3]
        n_shade = hm.normalize(attr_img[..., 3:6], xp=jnp)
        uv_pix = attr_img[..., 6:8]
        prev_pos = attr_img[..., 8:11]
        mat = jnp.round(attr_img[..., 11]).astype(jnp.int32)
        gn = hm.normalize(attr_img[..., 12:15], xp=jnp)
        flip = jnp.sum(gn * n_shade, -1, keepdims=True) < 0
        gn = jnp.where(flip, -gn, gn)
    else:
        assert aux is not None, "resolve_gbuffer requires RasterAux or attr_img"
        vid0 = jnp.where(valid, visid, 0)

        C = aux.tri_screen.shape[0]
        scr = aux.tri_screen.reshape(C * MESHLET_MAX_TRIS, 3, 4)[vid0]   # (H,W,3,4)
        attr = aux.tri_attr.reshape(C * MESHLET_MAX_TRIS, 3, 12)[vid0]   # (H,W,3,12)

        # screen-space barycentrics at the pixel center (global pixel coords)
        if pix_ids is not None:
            wfull = jnp.asarray(vc["viewport"][0]).astype(jnp.int32)
            pxc = jnp.stack(
                [(pix_ids % wfull).astype(jnp.float32) + 0.5,
                 (pix_ids // wfull).astype(jnp.float32) + 0.5], -1)
        else:
            pxc = jnp.stack(
                jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                             jnp.arange(H, dtype=jnp.float32) + y0 + 0.5,
                             indexing="xy"), -1)                  # (H, W, 2)
        va, vb, vc2 = scr[..., 0, 0:2], scr[..., 1, 0:2], scr[..., 2, 0:2]
        e1 = vb - va
        e2 = vc2 - va
        a2 = e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0]
        a2 = jnp.where(jnp.abs(a2) < 1e-12, 1e-12, a2)

        def edge(p0, p1):
            d = p1 - p0
            r = pxc - p0
            return d[..., 0] * r[..., 1] - d[..., 1] * r[..., 0]

        l0 = edge(vb, vc2) / a2
        l1 = edge(vc2, va) / a2
        l2 = edge(va, vb) / a2
        # perspective-correct weights (invw precomputed in tri_screen[..., 3])
        iw = scr[..., 3]
        denom = l0 * iw[..., 0] + l1 * iw[..., 1] + l2 * iw[..., 2]
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        bary = jnp.stack([l0 * iw[..., 0], l1 * iw[..., 1], l2 * iw[..., 2]],
                         -1) / denom[..., None]

        interp = jnp.einsum("hwv,hwvf->hwf", bary, attr)              # (H,W,12)
        pos_w = interp[..., 0:3]
        n_shade = hm.normalize(interp[..., 3:6], xp=jnp)
        uv_pix = interp[..., 6:8]
        prev_pos = interp[..., 8:11]
        mat = jnp.round(attr[..., 0, 11]).astype(jnp.int32)

        # geometric normal from the world-space triangle, oriented along shading n
        gn = jnp.cross(attr[..., 1, 0:3] - attr[..., 0, 0:3],
                       attr[..., 2, 0:3] - attr[..., 0, 0:3])
        gn = hm.normalize(gn, xp=jnp)
        flip = jnp.sum(gn * n_shade, -1, keepdims=True) < 0
        gn = jnp.where(flip, -gn, gn)

    # material constants: one-hot matmul against the small material table
    Mt = gpu.mat_f.shape[0]
    moh = (mat[..., None] == jnp.arange(Mt, dtype=jnp.int32)).astype(jnp.float32)
    mf = jnp.einsum("hwm,mf->hwf", moh, gpu.mat_f)
    albedo = mf[..., MAT_BASE_COLOR:MAT_BASE_COLOR + 3]
    alpha = mf[..., MAT_BASE_COLOR + 3]
    metallic = mf[..., MAT_METALLIC]
    rough = mf[..., MAT_ROUGHNESS]
    emissive = mf[..., MAT_EMISSIVE:MAT_EMISSIVE + 3]
    occlusion = jnp.ones((H, W), jnp.float32)

    # texture sampling (BasePass.hlsl:271-518 bindless material sampling):
    # one stochastic-trilinear row gather per pixel, modulating the factors.
    # An all-untextured scene's table has exactly one 1x1 neutral texel per
    # material — skip the whole path statically then.
    tex_feedback = None
    tex_clamp = None
    streaming = getattr(gpu, "tex_stream", None) is not None
    if textured and (streaming
                     or gpu.tex_table.shape[0] > gpu.mat_f.shape[0]):
        from hobbyrenderer_tpu.ops import texture as texops
        from hobbyrenderer_tpu.scene.gpu import (MAT_TEX_BASE_HI, MAT_TEX_BASE_LO,
                                                 MAT_TEX_SIZE, MAT_UV_SCALE)
        tex_size = mf[..., MAT_TEX_SIZE]
        tex_base = (jnp.round(mf[..., MAT_TEX_BASE_HI]).astype(jnp.int32) * 4096
                    + jnp.round(mf[..., MAT_TEX_BASE_LO]).astype(jnp.int32))
        uv_s = uv_pix * jnp.maximum(mf[..., MAT_UV_SCALE:MAT_UV_SCALE + 1], 1e-6)
        if tex_lod_mode == "cone":
            hfull = jnp.asarray(vc["viewport"][1]).astype(jnp.float32)
            spread = 2.0 / (vc["proj11"] * hfull)
            dist = jnp.linalg.norm(pos_w - vc["camera_pos"], axis=-1)
            lod = jnp.log2(jnp.maximum(tex_size * dist * spread, 1e-6))
        else:
            lod = texops.uv_lod(uv_s, tex_size)
        if pix_ids is not None:
            pix = pix_ids.astype(jnp.uint32)
        else:
            pix = (jnp.arange(H * W, dtype=jnp.uint32).reshape(H, W)
                   + jnp.uint32(y0) * jnp.uint32(max(W, 1)))
        frame = vc["frame_index"].astype(jnp.uint32)
        key = pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                               jnp.full_like(pix, 311)], -1))
        if streaming:
            # residency-clamped sampling + the demand histogram the host
            # streamer consumes (ref sampler-feedback resolve)
            ts = texops.sample_material_streamed(gpu.tex_stream, mat, uv_s,
                                                 lod, key)
            tex_feedback = texops.texture_feedback(
                jnp.where(valid, mat, 0), jnp.where(valid, lod, 30.0),
                gpu.mat_f.shape[0])
            if want_tex_debug:
                # residency-clamp severity per pixel: how many mips coarser
                # the sample came back vs what the footprint asked for (ref
                # TileResidencyDebugRenderer's residency heatmap)
                Mres = gpu.tex_stream.mat_resident.shape[0]
                res_mip = gpu.tex_stream.mat_resident[
                    jnp.clip(mat, 0, Mres - 1)].astype(jnp.float32)
                tex_clamp = jnp.maximum(res_mip - jnp.maximum(lod, 0.0), 0.0)
                tex_clamp = jnp.where(valid & (tex_size > 1.5), tex_clamp,
                                      0.0)
        else:
            ts = texops.sample_material(gpu, tex_size, tex_base, uv_s, lod, key)
        albedo = albedo * ts.albedo
        alpha = alpha * ts.alpha
        rough = rough * ts.roughness
        metallic = metallic * ts.metallic
        emissive = emissive * ts.emissive
        occlusion = ts.occlusion
        if tex_lod_mode != "cone":
            # Schüler cotangent frames need SCREEN-space derivatives —
            # unavailable on a compacted lane list (cone mode); those layers
            # keep the interpolated normal (same trade as the PT hit shading)
            n_shade = texops.apply_normal_map(n_shade, pos_w, uv_s,
                                              ts.normal_ts)

    # alpha margin: sampled alpha minus the material cutoff (>= 0 passes the
    # alpha test; cutoff is 0 for opaque/blend so margin == alpha there)
    alpha_margin = alpha - mf[..., MAT_ALPHA_CUTOFF]

    if sample_textures is not None:
        albedo, rough, metallic, emissive, n_shade = sample_textures(
            gpu, mat, uv_pix, albedo, rough, metallic, emissive, n_shade, gn)

    # motion vectors: prev-frame reprojection (ref motion RGBA16F target)
    width, height = vc["viewport"][0], vc["viewport"][1]
    PVP = vc["prev_view_proj_no_jitter"]
    pw = jnp.einsum("j,hwj->hw", PVP[3, :3], prev_pos) + PVP[3, 3]
    pw = jnp.maximum(pw, 1e-6)
    pclip = jnp.einsum("ij,hwj->hwi", PVP[:3, :3], prev_pos) + PVP[:3, 3]
    pndc = pclip / pw[..., None]
    psx = (pndc[..., 0] * 0.5 + 0.5) * width
    psy = (0.5 - pndc[..., 1] * 0.5) * height
    # current unjittered position
    NJ = vc["view_proj_no_jitter"]
    cw = jnp.einsum("j,hwj->hw", NJ[3, :3], pos_w) + NJ[3, 3]
    cw = jnp.maximum(cw, 1e-6)
    cclip = jnp.einsum("ij,hwj->hwi", NJ[:3, :3], pos_w) + NJ[:3, 3]
    cndc = cclip / cw[..., None]
    csx = (cndc[..., 0] * 0.5 + 0.5) * width
    csy = (0.5 - cndc[..., 1] * 0.5) * height
    motion = jnp.stack([psx - csx, psy - csy], -1)

    z = jnp.zeros((H, W), jnp.float32)
    zero3 = jnp.zeros((H, W, 3), jnp.float32)
    vmask = valid[..., None]
    gb = GBuffer(
        albedo=jnp.where(vmask, albedo, zero3),
        normal=jnp.where(vmask, n_shade, zero3),
        geo_normal=jnp.where(vmask, gn, zero3),
        orm=jnp.where(vmask, jnp.stack([occlusion, rough, metallic], -1), zero3),
        emissive=jnp.where(vmask, emissive, zero3),
        motion=jnp.where(vmask, motion, jnp.zeros((H, W, 2), jnp.float32)),
        world_pos=jnp.where(vmask, pos_w, zero3),
        depth=jnp.where(valid, raster.depth, z),
        material=jnp.where(valid, mat, -1),
        valid=valid,
        alpha=jnp.where(valid, alpha_margin, 0.0),
    )
    if want_tex_debug:
        if tex_clamp is None:
            tex_clamp = jnp.zeros((H, W), jnp.float32)
        return gb, tex_feedback, tex_clamp
    if want_feedback:
        return gb, tex_feedback
    return gb
