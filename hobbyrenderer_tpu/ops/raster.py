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

TILE = 32            # pixels per tile side
TRI_CHUNK = 16       # triangles evaluated per scan step


class RasterOutput(NamedTuple):
    depth: jnp.ndarray    # (H, W) f32 reversed-Z, 0 = far
    visid: jnp.ndarray    # (H, W) i32: slot * MESHLET_MAX_TRIS + tri, -1 = none
    overflow: jnp.ndarray  # () i32 count of (tile, meshlet) bin overflows (stats)


def _transform_meshlet_vertices(gpu, vc, slots, slot_valid):
    """Gather + transform the vertices of each visible meshlet slot.

    Returns (screen_xy (C,64,2), zndc (C,64), w (C,64), vert_valid (C,64),
             global_vert_ids (C,64))."""
    C = slots.shape[0]
    inst = jnp.where(slot_valid, gpu.pair_inst[slots], 0)
    ml = jnp.where(slot_valid, gpu.pair_meshlet[slots], 0)
    vo = gpu.ml_vert_offset[ml]                                  # (C,)
    vcnt = gpu.ml_vert_count[ml]
    lanes = jnp.arange(MESHLET_MAX_VERTS, dtype=jnp.int32)[None, :]
    vid = gpu.ml_vertices[jnp.minimum(vo[:, None] + lanes,
                                      gpu.ml_vertices.shape[0] - 1)]  # (C,64)
    vert_valid = lanes < vcnt[:, None]
    p_obj = gpu.positions[vid]                                   # (C,64,3)
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
    return screen, ndc[..., 2], w, vert_valid & (w > 1e-6), vid


def _gather_tri_setup(gpu, slots, slot_valid, screen, zndc, vert_ok):
    """Per-slot triangle screen coordinates (C, 96, 3, 2) + validity."""
    ml = jnp.where(slot_valid, gpu.pair_meshlet[slots], 0)
    to = gpu.ml_tri_offset[ml]
    tcnt = gpu.ml_tri_count[ml]
    lanes = jnp.arange(MESHLET_MAX_TRIS, dtype=jnp.int32)[None, :]
    lt = gpu.ml_tris[jnp.minimum(to[:, None] + lanes, gpu.ml_tris.shape[0] - 1)]  # (C,96,3)
    tri_valid = (lanes < tcnt[:, None]) & slot_valid[:, None]
    cidx = jnp.arange(slots.shape[0])[:, None, None]
    tv = screen[cidx, lt]                 # (C,96,3,2)
    tz = zndc[cidx, lt]                   # (C,96,3)
    tok = vert_ok[cidx, lt].all(-1) & tri_valid
    return tv, tz, tok, lt


def bin_meshlets_to_tiles(screen, vert_ok, slot_valid, width, height,
                          max_per_tile: int,
                          ty0: int = 0, ty_count: int = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Meshlet screen AABB -> per-tile slot lists (TY*TX, K) + overflow count.

    ty0/ty_count select a horizontal band of tile rows (framebuffer row-sharding
    across the device mesh, SURVEY.md §5.8): only tiles in [ty0, ty0+ty_count)
    get lists."""
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

    gx = jnp.arange(tx, dtype=jnp.int32)
    gy = jnp.arange(ty, dtype=jnp.int32) + ty0
    cover_x = (gx[None, :] >= t0[:, 0:1]) & (gx[None, :] <= t1[:, 0:1])   # (C, TX)
    cover_y = (gy[None, :] >= t0[:, 1:2]) & (gy[None, :] <= t1[:, 1:2])   # (C, TY)
    cover = cover_y[:, :, None] & cover_x[:, None, :] & ok[:, None, None]  # (C, TY, TX)
    cover = cover.reshape(cover.shape[0], -1)                              # (C, T)
    slot_in_tile = jnp.cumsum(cover.astype(jnp.int32), axis=0) - 1         # (C, T)
    counts = jnp.sum(cover.astype(jnp.int32), axis=0)                      # (T,)
    overflow = jnp.sum(jnp.maximum(counts - max_per_tile, 0))
    T = cover.shape[1]
    flat = jnp.where(cover & (slot_in_tile < max_per_tile),
                     jnp.arange(T, dtype=jnp.int32)[None, :] * max_per_tile + slot_in_tile,
                     T * max_per_tile)
    lists = jnp.full((T * max_per_tile + 1,), -1, jnp.int32)
    src = jnp.broadcast_to(jnp.arange(cover.shape[0], dtype=jnp.int32)[:, None],
                           cover.shape)
    lists = lists.at[flat.reshape(-1)].set(src.reshape(-1), mode="drop")
    return lists[:-1].reshape(T, max_per_tile), overflow


def rasterize(gpu, vc, slots, width: int, height: int,
              max_per_tile: int = 48,
              double_sided_all: bool = False,
              y0: int = 0, shard_height: int = None) -> RasterOutput:
    """Rasterize visible meshlet slots into a visibility buffer.

    slots: (C,) i32 compacted visible pair ids (-1 padded) from ops.culling.
    y0/shard_height: rasterize only pixel rows [y0, y0+shard_height) — the
    per-device band under framebuffer row-sharding (y0 must be TILE-aligned).
    """
    if shard_height is None:
        shard_height = height
    if isinstance(y0, int):
        assert y0 % TILE == 0, "shard origin must be tile-aligned"
    slot_valid = slots >= 0
    screen, zndc, w, vert_ok, _vid = _transform_meshlet_vertices(gpu, vc, slots, slot_valid)
    tv, tz, tok, _lt = _gather_tri_setup(gpu, slots, slot_valid, screen, zndc, vert_ok)

    # single-sided backface cull (glTF CCW front in RH; screen y-down flips sign)
    e1 = tv[:, :, 1] - tv[:, :, 0]
    e2 = tv[:, :, 2] - tv[:, :, 0]
    area2 = e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0]      # (C, 96)
    if not double_sided_all:
        inst = jnp.where(slot_valid, gpu.pair_inst[slots], 0)
        ds = gpu.mat_i[gpu.inst_material[inst], MATI_DOUBLE_SIDED] > 0
        tok &= (area2 < 0.0) | ds[:, None]
    tok &= jnp.abs(area2) > 1e-12

    ty0 = y0 // TILE
    ty = -(-shard_height // TILE)
    tiles, overflow = bin_meshlets_to_tiles(screen, vert_ok, slot_valid,
                                            width, height, max_per_tile,
                                            ty0=ty0, ty_count=ty)
    tx = -(-width // TILE)
    T = tx * ty

    # per-tile pixel centers (T, TILE*TILE, 2), in GLOBAL pixel coordinates
    tix = jnp.arange(T, dtype=jnp.int32)
    org = jnp.stack([(tix % tx) * TILE, (tix // tx + ty0) * TILE], -1).astype(jnp.float32)
    ly, lx = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    local = jnp.stack([lx.reshape(-1), ly.reshape(-1)], -1).astype(jnp.float32) + 0.5
    px = org[:, None, :] + local[None, :, :]                       # (T, P, 2)

    PIX = TILE * TILE
    n_chunks = MESHLET_MAX_TRIS // TRI_CHUNK

    def tri_block(carry, ks):
        depth, vis = carry          # (T, P) f32, (T, P) i32
        k, c = ks                   # meshlet slot index in tile list, tri chunk index
        slot = tiles[:, k]                                           # (T,)
        valid_ml = slot >= 0
        s = jnp.where(valid_ml, slot, 0)
        tr0 = c * TRI_CHUNK
        v = jax.lax.dynamic_slice_in_dim(tv, tr0, TRI_CHUNK, axis=1)[s]   # (T, R, 3, 2)
        z = jax.lax.dynamic_slice_in_dim(tz, tr0, TRI_CHUNK, axis=1)[s]   # (T, R, 3)
        okt = jax.lax.dynamic_slice_in_dim(tok, tr0, TRI_CHUNK, axis=1)[s]  # (T, R)
        a2 = jax.lax.dynamic_slice_in_dim(area2, tr0, TRI_CHUNK, axis=1)[s]
        okt &= valid_ml[:, None]

        # edge functions at pixel centers: lambda_i = E_i / area2
        pa = px[:, None, :, :] - v[:, :, None, 0, :]                 # (T, R, P, 2)
        pb = px[:, None, :, :] - v[:, :, None, 1, :]
        pc = px[:, None, :, :] - v[:, :, None, 2, :]
        eab = v[:, :, 1] - v[:, :, 0]
        ebc = v[:, :, 2] - v[:, :, 1]
        eca = v[:, :, 0] - v[:, :, 2]
        w0 = ebc[..., None, 0] * pb[..., 1] - ebc[..., None, 1] * pb[..., 0]  # at edge bc -> lam_a
        w1 = eca[..., None, 0] * pc[..., 1] - eca[..., None, 1] * pc[..., 0]  # lam_b
        w2 = eab[..., None, 0] * pa[..., 1] - eab[..., None, 1] * pa[..., 0]  # lam_c
        inv_a = 1.0 / a2
        l0 = w0 * inv_a[..., None]
        l1 = w1 * inv_a[..., None]
        l2 = w2 * inv_a[..., None]
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & okt[..., None]   # (T, R, P)
        zpix = l0 * z[..., 0:1] + l1 * z[..., 1:2] + l2 * z[..., 2:3]
        zpix = jnp.where(inside, zpix, -1.0)
        # nearest triangle in this chunk (reversed-Z: max)
        best = jnp.argmax(zpix, axis=1)                               # (T, P)
        bz = jnp.take_along_axis(zpix, best[:, None, :], axis=1)[:, 0, :]
        tid = s[:, None] * MESHLET_MAX_TRIS + (tr0 + best)
        upd = bz > depth
        depth = jnp.where(upd, bz, depth)
        vis = jnp.where(upd, tid, vis)
        return (depth, vis), None

    depth0 = jnp.zeros((T, PIX), jnp.float32)
    vis0 = jnp.full((T, PIX), -1, jnp.int32)
    ks = jnp.stack(jnp.meshgrid(jnp.arange(max_per_tile), jnp.arange(n_chunks),
                                indexing="ij"), -1).reshape(-1, 2)
    (depth_t, vis_t), _ = jax.lax.scan(tri_block, (depth0, vis0),
                                       (ks[:, 0], ks[:, 1]))

    # un-tile: (T, P) -> (shard_height, W) (tiles may extend past the band; crop)
    Hp, Wp = ty * TILE, tx * TILE
    depth_img = depth_t.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3).reshape(Hp, Wp)
    vis_img = vis_t.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3).reshape(Hp, Wp)
    return RasterOutput(depth_img[:shard_height, :width], vis_img[:shard_height, :width],
                        overflow)


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


def resolve_gbuffer(gpu, vc, raster: RasterOutput, slots,
                    sample_textures=None, y0: int = 0) -> GBuffer:
    """Per-pixel attribute resolve from the visibility buffer.

    Recomputes the pixel's triangle, perspective-correct barycentrics, and
    interpolates quantized attributes (the reference does this in the raster
    pixel shader, BasePass.hlsl:271-518). Fully regular: every pixel does the
    same gathers + FMAs.
    """
    H, W = raster.depth.shape
    visid = raster.visid
    valid = visid >= 0
    vid0 = jnp.where(valid, visid, 0)
    slot_idx = vid0 // MESHLET_MAX_TRIS
    tri_idx = vid0 % MESHLET_MAX_TRIS

    pair = jnp.where(valid, slots[slot_idx], 0)
    inst = gpu.pair_inst[pair]
    ml = gpu.pair_meshlet[pair]
    mat = gpu.inst_material[inst]

    # triangle -> global vertex ids
    lt = gpu.ml_tris[gpu.ml_tri_offset[ml] + tri_idx]            # (H, W, 3) local
    gv = gpu.ml_vertices[gpu.ml_vert_offset[ml][..., None] + lt]  # (H, W, 3)

    p_obj = gpu.positions[gv]                                     # (H, W, 3, 3)
    Wm = gpu.inst_transform[inst]                                 # (H, W, 4, 4)
    p_world = jnp.einsum("hwij,hwvj->hwvi", Wm[..., :3, :3], p_obj) + Wm[..., None, :3, 3]
    VP = vc["view_proj"]
    w = jnp.einsum("j,hwvj->hwv", VP[3, :3], p_world) + VP[3, 3]
    w = jnp.maximum(w, 1e-6)
    clip = jnp.einsum("ij,hwvj->hwvi", VP[:3, :3], p_world) + VP[:3, 3]
    ndc = clip / w[..., None]
    width, height = vc["viewport"][0], vc["viewport"][1]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height

    # screen-space barycentrics at the pixel center (global pixel coords)
    pxc = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                                 jnp.arange(H, dtype=jnp.float32) + y0 + 0.5,
                                 indexing="xy"), -1)              # (H, W, 2)
    va = jnp.stack([sx[..., 0], sy[..., 0]], -1)
    vb = jnp.stack([sx[..., 1], sy[..., 1]], -1)
    vc2 = jnp.stack([sx[..., 2], sy[..., 2]], -1)
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
    # perspective-correct weights
    iw = 1.0 / w
    denom = l0 * iw[..., 0] + l1 * iw[..., 1] + l2 * iw[..., 2]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    b0 = l0 * iw[..., 0] / denom
    b1 = l1 * iw[..., 1] / denom
    b2 = l2 * iw[..., 2] / denom
    bary = jnp.stack([b0, b1, b2], -1)

    pos_w = jnp.einsum("hwv,hwvi->hwi", bary, p_world)

    # attributes (quantized unpack — ref BasePass.hlsl quantized vertex fetch)
    n_packed = gpu.vnormals[gv]
    n_obj, _sign = hm.unpack_normal_oct(n_packed, xp=jnp)          # (H, W, 3, 3)
    Nm = gpu.inst_normal_mat[inst]
    n_world = jnp.einsum("hwij,hwvj->hwvi", Nm, n_obj)
    n_shade = hm.normalize(jnp.einsum("hwv,hwvi->hwi", bary, n_world), xp=jnp)
    # geometric normal from the world-space triangle
    gn = jnp.cross(p_world[..., 1, :] - p_world[..., 0, :],
                   p_world[..., 2, :] - p_world[..., 0, :])
    gn = hm.normalize(gn, xp=jnp)
    # orient geometric normal along shading normal
    flip = jnp.sum(gn * n_shade, -1, keepdims=True) < 0
    gn = jnp.where(flip, -gn, gn)

    uv = hm.unpack_uv_half2(gpu.vuvs[gv], xp=jnp)                  # (H, W, 3, 2)
    uv_pix = jnp.einsum("hwv,hwvi->hwi", bary, uv)

    mf = gpu.mat_f[mat]
    base = mf[..., MAT_BASE_COLOR:MAT_BASE_COLOR + 4]
    albedo = base[..., :3]
    metallic = mf[..., MAT_METALLIC]
    rough = mf[..., MAT_ROUGHNESS]
    emissive = mf[..., MAT_EMISSIVE:MAT_EMISSIVE + 3]
    if sample_textures is not None:
        albedo, rough, metallic, emissive, n_shade = sample_textures(
            gpu, mat, uv_pix, albedo, rough, metallic, emissive, n_shade, gn)

    # motion vectors: prev-frame reprojection (ref motion RGBA16F target)
    Wp_m = gpu.inst_prev_transform[inst]
    p_prev = jnp.einsum("hwij,hwvj->hwvi", Wp_m[..., :3, :3], p_obj) + Wp_m[..., None, :3, 3]
    prev_pos = jnp.einsum("hwv,hwvi->hwi", bary, p_prev)
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
    return GBuffer(
        albedo=jnp.where(vmask, albedo, zero3),
        normal=jnp.where(vmask, n_shade, zero3),
        geo_normal=jnp.where(vmask, gn, zero3),
        orm=jnp.where(vmask, jnp.stack([jnp.ones_like(rough), rough, metallic], -1), zero3),
        emissive=jnp.where(vmask, emissive, zero3),
        motion=jnp.where(vmask, motion, jnp.zeros((H, W, 2), jnp.float32)),
        world_pos=jnp.where(vmask, pos_w, zero3),
        depth=jnp.where(valid, raster.depth, z),
        material=jnp.where(valid, mat, -1),
        valid=valid,
    )
