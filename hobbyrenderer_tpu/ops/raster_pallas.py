"""Pallas TPU tile-raster kernel: the hot inner loop of the software rasterizer.

Reference: the hardware rasterizer + ROP depth test consumed by
src/shaders/BasePass.hlsl:83-171. The XLA formulation in ops/raster.py evaluates
triangle planes into (batch, tris, pixels) HBM temporaries — measured ~255 ms of
a 272 ms raster at 1080p (HBM-bandwidth-bound). This kernel keeps the per-tile
depth/visid accumulator in VMEM and streams per-meshlet triangle records from
HBM with double-buffered DMA, so the only HBM traffic is one record read per
(tile, meshlet) work item plus the final 4 KB tile writes.

Data model:
- depth records (C, 96, 16) f32: per visible slot, per meshlet triangle, the
  affine plane equations [l1x l1y l1c  l2x l2y l2c  zx zy zc  pad...] of the two
  barycentrics and reversed-Z depth as functions of screen position. Invalid
  triangles (padding / backfacing / clipped) are encoded *never inside*
  (l1 === -1e9), so the kernel needs no validity lanes.
- full records (C, 96, 64): lanes 0:9 as above, lanes 16:64 the perspective
  attribute planes (see build_full_records).
- worklist: tile-sorted (tile, slot) pairs from ops.raster.build_worklist;
  tile_start (T+1,) row offsets via searchsorted.
- grid = (T,): one program per 32x32 screen tile, its 1024 pixels laid out as
  one (8, 128) vreg block (pixel p = sublane*128 + lane, row-major in-tile).
  The inner fori_loop walks the tile's work span with a 2-slot DMA pipeline;
  per item the plane evaluation is pure VPU broadcasting — (96,1)x(1,1024)
  FMAs. (v1 evaluated planes with a (96,9)x(9,3072) MXU matmul; at K=9 the
  systolic array runs at ~7% utilization, so the VPU form is faster AND frees
  the MXU for the resolve loop's one-hot gather.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32
PIX = TILE * TILE          # 1024 = one (8, 128) f32 block
MAX_TRIS = 96
# Most meshlets carry far fewer than 96 real triangles (LOD1+ averages ~52 on
# the stress scene), so callers split each 96-row record into 32-row CHUNKS
# and emit one worklist item per LIVE chunk (build_worklist sub_count): the
# kernel evaluates a fixed 32 rows per item with no inner loop (an in-kernel
# per-item chunk fori_loop was tried first and its scalar loop overhead cost
# more than the skipped rows saved). Triangle ids survive the re-indexing
# exactly: (slot*3 + chunk)*32 + row == slot*96 + tri.
TRI_CHUNK = 32
N_CHUNKS = MAX_TRIS // TRI_CHUNK
# Mosaic requires HBM slice minor dims aligned to the 128-lane tiling, so
# records are padded to full 128-lane rows (a plane-major re-layout could cut
# the DMA to 8 KB/record; deferred until the DMA stream shows up in profiles)
REC_LANES_DEPTH = 128
REC_LANES_FULL = 128

N_PLANES = 16          # 11 perspective numerators + 1/w + mat + gn (constants)
ATTR_ROWS = 16         # kernel attr output rows per pixel


def _raster_body(coeff: jnp.ndarray) -> jnp.ndarray:
    """(C, 96, 10) affine coeffs + ok flag -> (C, 96, 9) raster plane lanes."""
    ok = coeff[..., 9:10] > 0.5
    body = jnp.where(ok, coeff[..., 0:9], 0.0)
    # invalid: l1 = -1e9 everywhere -> fails `l1 >= 0` for every pixel
    l1c = jnp.where(ok[..., 0], body[..., 2], -1e9)
    return body.at[..., 2].set(l1c)


def build_tri_records(coeff: jnp.ndarray) -> jnp.ndarray:
    """(C, 96, 10) affine coeffs + ok flag -> (C, 96, 16) raster-only records.

    coeff layout per ops.raster._tri_affine_coeffs:
    [l1x,l1y,l1c, l2x,l2y,l2c, zx,zy,zc, ok]. Lanes 0:9 = raster planes."""
    C = coeff.shape[0]
    body = _raster_body(coeff)
    pad = jnp.zeros((C, MAX_TRIS, REC_LANES_DEPTH - 9), coeff.dtype)
    return jnp.concatenate([body, pad], axis=-1)


def build_full_records(coeff: jnp.ndarray, tri_screen: jnp.ndarray,
                       tri_attr: jnp.ndarray) -> jnp.ndarray:
    """Records carrying both raster planes AND attribute-interpolation planes.

    tri_screen (C, 96, 3, 4): screen x, y, z_ndc, 1/w per vertex.
    tri_attr (C, 96, 3, 12): pos3, nrm3, uv2, prevpos3, mat per vertex
    (ops.raster.RasterAux layout).

    Perspective-correct interpolation of attribute a: both a·(1/w) and 1/w are
    affine in screen space, so each becomes a plane; the kernel evaluates all
    planes at the pixel and divides (BasePass.hlsl does the same via the HW
    interpolators). Constant-per-tri quantities (material id, geometric
    normal) are stored as x=y=0 planes.

    Lane layout (64): [0:9 raster planes][16:64 = 16 x-coeffs | 16 y | 16 c]:
      planes 0..10: numerators a*invw for pos3, nrm3, uv2, prev3
      plane 11: invw (denominator)
      plane 12: material id (const)
      planes 13..15: geometric normal (const, unnormalized)
    """
    C = coeff.shape[0]
    body = _raster_body(coeff)                             # (C, 96, 9)
    l1x, l1y, l1c = coeff[..., 0], coeff[..., 1], coeff[..., 2]
    l2x, l2y, l2c = coeff[..., 3], coeff[..., 4], coeff[..., 5]

    iw = tri_screen[..., 3]                                # (C, 96, 3)
    a_iw = tri_attr[..., 0:11] * iw[..., None]             # (C, 96, 3, 11)
    vals = jnp.concatenate([a_iw, iw[..., None]], -1)      # (C, 96, 3, 12)
    v0, v1, v2 = vals[..., 0, :], vals[..., 1, :], vals[..., 2, :]
    d1 = v1 - v0                                           # (C, 96, 12)
    d2 = v2 - v0
    # plane(x,y) = v0 + l1(x,y)*d1 + l2(x,y)*d2  (l planes affine)
    px_ = l1x[..., None] * d1 + l2x[..., None] * d2
    py_ = l1y[..., None] * d1 + l2y[..., None] * d2
    pc_ = v0 + l1c[..., None] * d1 + l2c[..., None] * d2

    # constant planes: material id + geometric normal from world verts
    mat = tri_attr[..., 0, 11]                             # (C, 96)
    p0, p1, p2 = (tri_attr[..., 0, 0:3], tri_attr[..., 1, 0:3],
                  tri_attr[..., 2, 0:3])
    gn = jnp.cross(p1 - p0, p2 - p0)                       # unnormalized
    zc = jnp.zeros_like(mat)
    cx = jnp.stack([zc, zc, zc, zc], -1)                   # (C, 96, 4)
    cc = jnp.concatenate([mat[..., None], gn], -1)         # (C, 96, 4)

    plane_x = jnp.concatenate([px_, cx], -1)               # (C, 96, 16)
    plane_y = jnp.concatenate([py_, cx], -1)
    plane_c = jnp.concatenate([pc_, cc], -1)
    # grouped [16 x | 16 y | 16 c] so the kernel slices contiguous sublanes
    planes = jnp.concatenate([plane_x, plane_y, plane_c], -1)  # (C, 96, 48)

    pad0 = jnp.zeros((C, MAX_TRIS, 16 - 9), coeff.dtype)
    pad1 = jnp.zeros((C, MAX_TRIS, REC_LANES_FULL - 64), coeff.dtype)
    return jnp.concatenate([body, pad0, planes, pad1], -1)  # (C, 96, 128)


def _plane_eval(A, oxf, oyf, xl, yl):
    """VPU plane eval over the tile: A (96, >=9) -> l1, l2, z each (96, PIX).

    Plane constants are re-centered on the tile origin in exact f32 first so
    magnitudes stay small."""
    def ev(k):
        c = A[:, k + 0:k + 1] * oxf + A[:, k + 1:k + 2] * oyf + A[:, k + 2:k + 3]
        return A[:, k + 0:k + 1] * xl + A[:, k + 1:k + 2] * yl + c
    return ev(0), ev(3), ev(6)


def _raster_kernel(tile_start_ref, wslot_ref, recs_hbm, depth_ref,
                   vis_ref, rec_s, sem, *, tx: int, ty0: int, rows: int,
                   depth_only: bool):
    t = pl.program_id(0)
    s0 = tile_start_ref[t]
    s1 = tile_start_ref[t + 1]
    n = s1 - s0

    ox = (t % tx) * TILE
    oy = (t // tx + ty0) * TILE
    oxf = ox.astype(jnp.float32) + 0.5
    oyf = oy.astype(jnp.float32) + 0.5
    p_in = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    xl = (p_in % TILE).astype(jnp.float32)                 # tile-local coords
    yl = (p_in // TILE).astype(jnp.float32)

    def get_dma(buf, j):
        return pltpu.make_async_copy(recs_hbm.at[wslot_ref[s0 + j]],
                                     rec_s.at[buf], sem.at[buf])

    z_far = jnp.zeros((1, PIX), jnp.float32)               # reversed-Z: 0 = far
    id_none = jnp.full((1, PIX), -1, jnp.int32)

    def raster_span():
        get_dma(0, 0).start()

        def body(j, carry):
            z_acc, id_acc = carry
            cur = j % 2

            @pl.when(j + 1 < n)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(cur, j).wait()
            l1, l2, z = _plane_eval(rec_s[cur], oxf, oyf, xl, yl)
            inside = (l1 >= 0.0) & (l2 >= 0.0) & (l1 + l2 <= 1.0)
            zm = jnp.where(inside, z, -1.0)                # (rows, PIX)
            best = jnp.max(zm, axis=0, keepdims=True)      # (1, PIX)
            upd = best > z_acc
            z_acc = jnp.where(upd, best, z_acc)
            if not depth_only:
                tri_i = jax.lax.broadcasted_iota(jnp.int32, (rows, PIX), 0)
                ids = jnp.where(zm == best, tri_i, jnp.int32(0x7FFFFFFF))
                bid = jnp.min(ids, axis=0, keepdims=True)  # (1, PIX)
                gid = wslot_ref[s0 + j] * rows + bid
                id_acc = jnp.where(upd & (best > 0.0), gid, id_acc)
            return z_acc, id_acc

        zf, idf = jax.lax.fori_loop(0, n, body, (z_far, id_none))
        depth_ref[:] = jnp.maximum(zf, 0.0).reshape(1, 8, 128)
        vis_ref[:] = jnp.where(zf > 0.0, idf, -1).reshape(1, 8, 128)

    # empty tiles still clear their output block
    @pl.when(n > 0)
    def _():
        raster_span()

    @pl.when(n <= 0)
    def _():
        depth_ref[:] = z_far.reshape(1, 8, 128)
        vis_ref[:] = id_none.reshape(1, 8, 128)


def _raster_resolve_kernel(tile_start_ref, wslot_ref, recs_hbm,
                           depth_ref, vis_ref, attr_ref, rec_s, sem, *,
                           tx: int, ty0: int, rows: int):
    """Raster + attribute resolve fused: loop 1 finds the winning (depth, id)
    per pixel; loop 2 re-streams only the records whose meshlet won any pixel
    and interpolates its perspective-correct attribute planes (the reference
    does this in the raster pixel shader, BasePass.hlsl:271-518; the round-1
    XLA resolve did it with 2 HBM row-gathers per pixel — ~195 ms at 1080p)."""
    t = pl.program_id(0)
    s0 = tile_start_ref[t]
    s1 = tile_start_ref[t + 1]
    n = s1 - s0

    ox = (t % tx) * TILE
    oy = (t // tx + ty0) * TILE
    oxf = ox.astype(jnp.float32) + 0.5
    oyf = oy.astype(jnp.float32) + 0.5
    p_in = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    xl = (p_in % TILE).astype(jnp.float32)
    yl = (p_in // TILE).astype(jnp.float32)
    # global pixel coords for the attribute plane eval (exact f32 on VPU)
    pxg = xl + oxf
    pyg = yl + oyf

    def get_dma(buf, j):
        return pltpu.make_async_copy(recs_hbm.at[wslot_ref[s0 + j]],
                                     rec_s.at[buf], sem.at[buf])

    z_far = jnp.zeros((1, PIX), jnp.float32)
    id_none = jnp.full((1, PIX), -1, jnp.int32)
    attr_zero = jnp.zeros((ATTR_ROWS, PIX), jnp.float32)

    def both_spans():
        # ---- loop 1: depth + winner id ----
        get_dma(0, 0).start()

        def body(j, carry):
            z_acc, id_acc = carry
            cur = j % 2

            @pl.when(j + 1 < n)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(cur, j).wait()
            l1, l2, z = _plane_eval(rec_s[cur], oxf, oyf, xl, yl)
            inside = (l1 >= 0.0) & (l2 >= 0.0) & (l1 + l2 <= 1.0)
            zm = jnp.where(inside, z, -1.0)
            best = jnp.max(zm, axis=0, keepdims=True)
            upd = best > z_acc
            z_acc = jnp.where(upd, best, z_acc)
            tri_i = jax.lax.broadcasted_iota(jnp.int32, (rows, PIX), 0)
            ids = jnp.where(zm == best, tri_i, jnp.int32(0x7FFFFFFF))
            bid = jnp.min(ids, axis=0, keepdims=True)
            gid = wslot_ref[s0 + j] * rows + bid
            id_acc = jnp.where(upd & (best > 0.0), gid, id_acc)
            return z_acc, id_acc

        zf, idf = jax.lax.fori_loop(0, n, body, (z_far, id_none))
        idf = jnp.where(zf > 0.0, idf, -1)
        depth_ref[:] = jnp.maximum(zf, 0.0).reshape(1, 8, 128)
        vis_ref[:] = idf.reshape(1, 8, 128)

        # ---- loop 2: attribute planes for winning meshlets only ----
        win_slot = jnp.where(idf >= 0, idf // rows, -1)       # (1, PIX)
        get_dma(0, 0).start()

        def body2(j, attr_acc):
            cur = j % 2

            @pl.when(j + 1 < n)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(cur, j).wait()
            slot = wslot_ref[s0 + j]
            pxmask = win_slot == slot                          # (1, PIX)

            def interp(acc):
                local = jnp.where(pxmask, idf - slot * rows, -1)
                tri_i = jax.lax.broadcasted_iota(jnp.int32, (rows, PIX), 0)
                onehot = (tri_i == local).astype(jnp.float32)  # (rows, PIX)
                cofs = rec_s[cur][:, 16:64]                    # (rows, 48)
                csel = jax.lax.dot_general(
                    cofs, onehot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (48, PIX)
                vals = (csel[0:16] * pxg + csel[16:32] * pyg
                        + csel[32:48])                         # (16, PIX)
                inv_w = 1.0 / jnp.maximum(vals[11:12], 1e-12)
                out = jnp.concatenate(
                    [vals[0:11] * inv_w, vals[12:16],
                     jnp.zeros((1, PIX), jnp.float32)], axis=0)  # (16, PIX)
                return jnp.where(pxmask, out, acc)

            return jax.lax.cond(jnp.any(pxmask), interp, lambda a: a, attr_acc)

        attr_ref[:] = jax.lax.fori_loop(0, n, body2, attr_zero)[None]

    @pl.when(n > 0)
    def _():
        both_spans()

    @pl.when(n <= 0)
    def _():
        depth_ref[:] = z_far.reshape(1, 8, 128)
        vis_ref[:] = id_none.reshape(1, 8, 128)
        attr_ref[:] = attr_zero[None]


@functools.partial(jax.jit, static_argnames=("tiles", "tx", "ty0", "depth_only",
                                             "interpret"))
def raster_tiles(records, work_tile, work_slot, *,
                 tiles: int, tx: int,
                 ty0: int = 0, depth_only: bool = False,
                 interpret: bool = False):
    """Run the tile-raster kernel.

    records (S, rows, 16) f32 — one record per worklist-addressable slot, rows
    triangles each (callers chunk 96-tri meshlets into 3 x 32-row records and
    the worklist addresses chunks); work_tile/work_slot (Wcap,) i32 tile-sorted
    (pad: tile == tiles sentinel). Returns depth (tiles, 1024) f32, visid
    (tiles, 1024) i32 (id = slot * rows + row) in row-major 32x32 tile order."""
    T = tiles
    rows = records.shape[1]
    rec_lanes = records.shape[-1]
    tile_start = jnp.searchsorted(work_tile, jnp.arange(T + 1, dtype=jnp.int32)
                                  ).astype(jnp.int32)
    kern = functools.partial(_raster_kernel, tx=tx, ty0=ty0, rows=rows,
                             depth_only=depth_only)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows, rec_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, vis = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((T, 8, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(tile_start, work_slot, records)
    return depth.reshape(T, PIX), vis.reshape(T, PIX)


@functools.partial(jax.jit, static_argnames=("tiles", "tx", "ty0", "interpret"))
def raster_resolve_tiles(records, work_tile, work_slot, *,
                         tiles: int, tx: int,
                         ty0: int = 0, interpret: bool = False):
    """Fused raster + attribute resolve (records from build_full_records,
    optionally chunked to (3C, 32, 128) with chunk-granular worklist slots).

    Returns depth (T, 1024) f32, visid (T, 1024) i32, attrs (T, 16, 1024) f32:
    rows 0:3 world pos, 3:6 shading normal (unnormalized), 6:8 uv, 8:11 prev
    world pos, 11 material id, 12:15 geometric normal (unnormalized), 15 pad."""
    T = tiles
    rows = records.shape[1]
    rec_lanes = records.shape[-1]
    tile_start = jnp.searchsorted(work_tile, jnp.arange(T + 1, dtype=jnp.int32)
                                  ).astype(jnp.int32)
    kern = functools.partial(_raster_resolve_kernel, tx=tx, ty0=ty0, rows=rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ATTR_ROWS, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows, rec_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, vis, attr = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((T, 8, 128), jnp.int32),
                   jax.ShapeDtypeStruct((T, ATTR_ROWS, PIX), jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(tile_start, work_slot, records)
    return depth.reshape(T, PIX), vis.reshape(T, PIX), attr
