"""Pallas TPU tile-raster kernel: the hot inner loop of the software rasterizer.

Reference: the hardware rasterizer + ROP depth test consumed by
src/shaders/BasePass.hlsl:83-171. The XLA formulation in ops/raster.py evaluates
triangle planes into (batch, tris, pixels) HBM temporaries — measured ~255 ms of
a 272 ms raster at 1080p (HBM-bandwidth-bound). This kernel keeps the per-tile
depth/visid accumulator in VMEM and streams per-meshlet triangle records from
HBM with double-buffered DMA, so the only HBM traffic is one 6 KB record read
per (tile, meshlet) work item plus the final 4 KB tile writes.

Data model:
- records (C, 96, 16) f32: per visible slot, per meshlet triangle, the affine
  plane equations [l1x l1y l1c  l2x l2y l2c  zx zy zc  pad...] of the two
  barycentrics and reversed-Z depth as functions of screen position. Invalid
  triangles (padding / backfacing / clipped) are encoded *never inside*
  (l1 === -1e9), so the kernel needs no validity lanes.
- worklist: tile-sorted (tile, slot) pairs from ops.raster.build_worklist;
  tile_start (T+1,) row offsets via searchsorted.
- grid = (T,): one program per 32x32 screen tile, its 1024 pixels laid out as
  one (8, 128) vreg block (pixel p = sublane*128 + lane, row-major in-tile).
  The inner fori_loop walks the tile's work span with a 2-slot DMA pipeline;
  per item the evaluation is pure VPU: 6 FMAs + 4 compares on (96, 8, 128)
  + a leading-axis max/argmin fold.
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
# Mosaic requires HBM slice minor dims aligned to the 128-lane tiling, so the
# 9 plane coefficients are padded to a full 128-lane row (DMA is still only
# ~48 KB per (tile, meshlet) item — bandwidth-trivial next to the old path's
# (batch, tris, pixels) HBM temporaries).
REC_LANES = 128


def build_tri_records(coeff: jnp.ndarray) -> jnp.ndarray:
    """(C, 96, 10) affine coeffs + ok flag -> (C, 96, 16) kernel records.

    coeff layout per ops.raster._tri_affine_coeffs:
    [l1x,l1y,l1c, l2x,l2y,l2c, zx,zy,zc, ok]."""
    C = coeff.shape[0]
    ok = coeff[..., 9:10] > 0.5
    body = jnp.where(ok, coeff[..., 0:9], 0.0)
    # invalid: l1 = -1e9 everywhere -> fails `l1 >= 0` for every pixel
    l1c = jnp.where(ok[..., 0], body[..., 2], -1e9)
    body = body.at[..., 2].set(l1c)
    pad = jnp.zeros((C, MAX_TRIS, REC_LANES - 9), coeff.dtype)
    return jnp.concatenate([body, pad], axis=-1)


def _raster_kernel(tile_start_ref, wslot_ref, recs_hbm, depth_ref, vis_ref,
                   rec_s, sem, *, tx: int, ty0: int, depth_only: bool):
    t = pl.program_id(0)
    s0 = tile_start_ref[t]
    s1 = tile_start_ref[t + 1]
    n = s1 - s0

    ox = (t % tx) * TILE
    oy = (t // tx + ty0) * TILE
    oxf = ox.astype(jnp.float32) + 0.5
    oyf = oy.astype(jnp.float32) + 0.5
    # P matrix (9, 3*PIX): block-diagonal [x_local; y_local; 1] per plane
    # group, so ONE MXU matmul per work item evaluates l1|l2|z for all 96
    # triangles at once. Coordinates are TILE-LOCAL (<= 31.5) and the plane
    # constants are re-centered on the tile origin in exact f32 on the VPU —
    # keeping magnitudes small enough that the MXU's default f32 precision
    # (bf16x3 decomposition) introduces no depth-test-visible error.
    lane9 = jax.lax.broadcasted_iota(jnp.int32, (9, 3 * PIX), 1)
    row9 = jax.lax.broadcasted_iota(jnp.int32, (9, 3 * PIX), 0)
    p_in = lane9 % PIX                                     # in-tile pixel index
    grp = lane9 // PIX                                     # plane group 0/1/2
    pxf = (p_in % TILE).astype(jnp.float32)
    pyf = (p_in // TILE).astype(jnp.float32)
    kind = row9 - grp * 3                                  # 0=x, 1=y, 2=const
    Pm = jnp.where(kind == 0, pxf,
                   jnp.where(kind == 1, pyf,
                             jnp.where(kind == 2, 1.0, 0.0)))

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
            A = rec_s[cur][:, 0:9]                         # (96, 9) plane coeffs
            # re-center plane constants on the tile origin in exact f32
            def adj(k):                                    # (96, 1)
                return (A[:, k + 0:k + 1] * oxf + A[:, k + 1:k + 2] * oyf
                        + A[:, k + 2:k + 3])
            Aloc = jnp.concatenate(
                [A[:, 0:2], adj(0), A[:, 3:5], adj(3), A[:, 6:8], adj(6)],
                axis=1)                                    # (96, 9)
            L = jax.lax.dot_general(Aloc, Pm, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            l1 = L[:, 0:PIX]                               # (96, PIX)
            l2 = L[:, PIX:2 * PIX]
            z = L[:, 2 * PIX:3 * PIX]
            inside = (l1 >= 0.0) & (l2 >= 0.0) & (l1 + l2 <= 1.0)
            zm = jnp.where(inside, z, -1.0)                # (96, PIX)
            best = jnp.max(zm, axis=0, keepdims=True)      # (1, PIX)
            upd = best > z_acc
            z_acc = jnp.where(upd, best, z_acc)
            if not depth_only:
                tri_i = jax.lax.broadcasted_iota(jnp.int32, (MAX_TRIS, PIX), 0)
                ids = jnp.where(zm == best, tri_i, jnp.int32(0x7FFFFFFF))
                bid = jnp.min(ids, axis=0, keepdims=True)  # (1, PIX)
                gid = wslot_ref[s0 + j] * MAX_TRIS + bid
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


@functools.partial(jax.jit, static_argnames=("tiles", "tx", "ty0", "depth_only",
                                             "interpret"))
def raster_tiles(records, work_tile, work_slot, *, tiles: int, tx: int,
                 ty0: int = 0, depth_only: bool = False,
                 interpret: bool = False):
    """Run the tile-raster kernel.

    records (C, 96, 16) f32; work_tile/work_slot (Wcap,) i32 tile-sorted (pad:
    tile == tiles sentinel). Returns depth (tiles, 1024) f32, visid (tiles,
    1024) i32 in row-major 32x32 tile pixel order."""
    T = tiles
    tile_start = jnp.searchsorted(work_tile, jnp.arange(T + 1, dtype=jnp.int32)
                                  ).astype(jnp.int32)
    kern = functools.partial(_raster_kernel, tx=tx, ty0=ty0,
                             depth_only=depth_only)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, MAX_TRIS, REC_LANES), jnp.float32),
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
