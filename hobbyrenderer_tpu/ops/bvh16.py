"""16-wide BVH with 128-f32 rows: incoherent rays at TPU gather speed.

Reference: the RayQuery closest-hit/any-hit loops of
src/shaders/RaytracingCommon.hlsli (TraceRayStandard / shadow rays) — free
random access on GPU RT cores. On TPU every traversal step costs one random
HBM row gather, and the chained microbench (scripts/prim_bench.py) pins the
real law: gathers are ROW-RATE bound, ~62 Mrows/s from a 175k-row table and
~120 Mrows/s from a 16k-row one, nearly independent of row width up to
128 f32 (512 B) — beyond that the rate collapses (w256 runs 25-50 Mrows/s).

So the design maximizes tree fetched per row under the 128-f32 cap:

- 16-ARY implicit heap (children of q are 16q+1..16q+16, I = (16^m-1)/15
  interior rows then L = 16^m leaf rows). Depth m <= 4 for 12M tris: a ray
  resolves in ~6-14 gathers (measured mean 11.5, p50 9 on the 528k-tri
  stress scene with uniformly random rays) instead of the 4-ary walk's
  ~40-100.
- UNIFIED 128-f32 ROWS: interior rows hold all 16 children's AABBs (96 f32);
  leaf rows hold K=12 triangle records (120 f32). One gather per step either
  way. (Round 2's 16-ary attempt lost 7x with 640-f32 leaf rows — exactly the
  width cliff the microbench later exposed.)
- TRANSPOSED TABLE, CHILD-MAJOR MATH: the table is stored (128, N) and
  gathered along axis=1, so the step lands directly in SoA layout (128, R);
  box tests run as ~25 ops over (16, R) arrays and triangle tests as ~45 ops
  over (12, R) — NOT 16+12 separate (R,) chains. Measured: the scalar-chain
  form spent 4 of its 5.1 ms/step outside the gather at R=65k.
- BITMASK TRAIL instead of a node stack: per lane, one pending-children
  bitmask PER LEVEL ((R, m) i32, m <= 5); ancestor ids are implicit-heap
  arithmetic (parent(q) = (q-1)//16). A pop is count-trailing-zeros on the
  deepest non-empty mask. No (R, stack_depth) rewrites.
- NEAREST-FIRST descent: the closest hit child (slab-entry argmin) descends
  immediately; the other hit children wait in the mask (heap order). Stale
  subtrees die on their next box test against the tightened best_t.
- PHASED COMPACTION (as ops/bvh.py): the lockstep wavefront pays for its
  slowest lane (p99 is ~4x the median), so after a step budget the live
  lanes argsort-compact into a narrower wavefront.

Build is host-side vectorized numpy over the same median-split order as
ops/bvh.py; refit_bvh16 recomputes every row on device for dynamic scenes
(the per-frame TLAS-update analogue, ref src/CommonRenderers.cpp:186-250)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.ops.bvh import (HitRecord, _binary_level_boxes,
                                       _leaf_data, _median_split_order)
from hobbyrenderer_tpu.ops.intersect import INF, safe_inv_dir

LEAF16 = 12          # triangle records per leaf row (12 * 10 = 120 <= 128)
ROW_W = 128

# (steps, keep_fraction) wavefront phases, set from the measured drain on the
# stress scene (random rays): ~50% live @ 12 steps, ~8% @ 24, ~1.5% @ 48
PHASES16 = ((12, 1 / 2), (12, 1 / 8), (24, 1 / 32), (384, None))

# MXU-split phases: each iteration is EITHER an interior or a leaf step, so a
# ray's node visits spread over ~1.4x more lockstep iterations than the
# unified walk's — budgets scale accordingly
PHASES16_MXU = ((17, 1 / 2), (17, 1 / 8), (34, 1 / 32), (540, None))

BF16_SLOP = 1.0 / 256.0   # 2^-8 >= bf16 round-to-nearest rel. error (2^-9)


class BVH16(NamedTuple):
    """16-ary unified-table BVH (transposed storage). Shape facts derive from
    array shapes: I + L = table.shape[1], L = power of 16."""

    table: jnp.ndarray     # (128, I + L) f32 unified node rows, TRANSPOSED
    order: jnp.ndarray     # (L * K,) i32 leaf slot -> triangle id (-1 pad)
    root_box: jnp.ndarray  # (6,) f32 scene bounds (lo, hi)
    num_tris: int
    recs: jnp.ndarray = None      # (L * K, 9) f32 v0|e1|e2 row-major — for
    #                               the one-shot u/v/front recompute after
    #                               traversal (keeps them out of the loop)
    slot_of: jnp.ndarray = None   # (T,) i32 original tri id -> leaf slot
    int_bf: jnp.ndarray = None    # (96, Ip) bf16 CONSERVATIVE interior boxes
    #                               (lo rounded down / hi up) for the one-hot
    #                               MXU fetch path; Ip = I padded to 128
    leaf_rw: jnp.ndarray = None   # (L, 128) f32 ROW-major leaf rows — the
    #                               per-lane DMA source for the Pallas walk
    #                               (ops/wtrace.py); one row = one leaf

    @property
    def num_leaves(self) -> int:
        return (15 * self.table.shape[1] + 1) // 16

    @property
    def n_interior(self) -> int:
        return (self.num_leaves - 1) // 15

    @property
    def leaf_size(self) -> int:
        return self.order.shape[0] // self.num_leaves

    @property
    def depth(self) -> int:
        """16-ary levels below the root (= leaf level index m)."""
        L = self.num_leaves
        m = 0
        while 16 ** m < L:
            m += 1
        return m


def _assemble16(leaf_rows, levels, L: int, xp):
    """Binary level boxes + leaf rows -> TRANSPOSED (128, I + L) table.

    16-ary interior level k's children are binary level 4(k+1) below the
    root; binary level ell below the root is levels[n_bin - ell]."""
    n_bin = int(np.log2(L)) if L > 1 else 0
    m = n_bin // 4
    W = ROW_W
    if leaf_rows.shape[1] < W:
        leaf_rows = xp.concatenate(
            [leaf_rows, xp.zeros((leaf_rows.shape[0], W - leaf_rows.shape[1]),
                                 leaf_rows.dtype)], axis=1)
    rows = []
    for k in range(m):
        lo, hi = levels[n_bin - 4 * (k + 1)]          # (16^(k+1), 3)
        boxes = xp.concatenate([lo, hi], axis=1)      # (16^(k+1), 6) lo|hi
        r = boxes.reshape(16 ** k, 96)
        rows.append(xp.concatenate(
            [r, xp.zeros((r.shape[0], W - 96), r.dtype)], axis=1))
    if rows:
        interior = xp.concatenate(rows, axis=0)
        return xp.concatenate([interior, leaf_rows], axis=0).T
    return leaf_rows.T


def _int_bf16(table, I: int, xp):
    """Conservative bf16 interior-box table (96, Ip) from the unified
    transposed table: lo components rounded DOWN, hi components rounded UP
    (a 2^-8 relative slop before round-to-nearest guarantees containment,
    bf16's RTN error being <= 2^-9), so MXU-fetched boxes are only ever
    LOOSER than the f32 boxes — extra node visits, never a missed hit.
    Columns pad to a multiple of 128 (never selected by the one-hot)."""
    Ip = -(-max(I, 1) // 128) * 128
    t = table[:96, :I]
    is_hi = ((xp.arange(96) % 6) >= 3)[:, None]
    slop = xp.abs(t) * xp.float32(BF16_SLOP) + xp.float32(1e-33)
    t = xp.where(is_hi, t + slop, t - slop)
    if xp is np:
        import ml_dtypes
        t = t.astype(ml_dtypes.bfloat16)
        return np.concatenate(
            [t, np.zeros((96, Ip - I), ml_dtypes.bfloat16)], axis=1)
    t = t.astype(jnp.bfloat16)
    return jnp.concatenate([t, jnp.zeros((96, Ip - I), jnp.bfloat16)], axis=1)


def build_bvh16(tri_verts: np.ndarray, leaf_size: int = LEAF16,
                device_put: bool = True) -> BVH16:
    """tri_verts: (T, 3, 3) float32 triangles. T < 2^24 (f32-exact ids)."""
    assert tri_verts.shape[0] < (1 << 24), \
        "triangle ids are carried as f32; >= 2^24 tris are not representable"
    tri_verts = np.asarray(tri_verts, np.float32)
    T = tri_verts.shape[0]
    assert T > 0, "empty BVH"

    L = 1
    while L * leaf_size < T:
        L *= 16                    # power-of-16 leaf count (16-ary heap)
    N = L * leaf_size
    pad = N - T
    cent = tri_verts.mean(axis=1)
    if pad:
        cent = np.concatenate([cent, np.full((pad, 3), np.inf, np.float32)], 0)

    order = _median_split_order(cent, L, leaf_size)
    valid = order < T
    sorted_tris = np.where(valid[:, None, None],
                           tri_verts[np.minimum(order, T - 1)],
                           np.float32(1e30))
    tri_id = np.where(valid, order, -1).astype(np.int32)

    leaf_rows, vlo, vhi = _leaf_data(sorted_tris, tri_id, L, leaf_size, np)
    empty = ~(tri_id.reshape(L, leaf_size) >= 0).any(1)
    vlo[empty] = np.float32(1e30)       # inverted box: never descended
    vhi[empty] = np.float32(-1e30)

    levels = _binary_level_boxes(vlo, vhi, np)
    table = np.ascontiguousarray(
        _assemble16(leaf_rows, levels, L, np)).astype(np.float32)
    root_lo, root_hi = levels[-1]
    root_box = np.concatenate([root_lo[0], root_hi[0]]).astype(np.float32)

    recs = leaf_rows.reshape(L * leaf_size, 10)[:, :9].copy()
    slot_of = np.zeros(T, np.int32)
    slots = np.arange(N, dtype=np.int32)
    slot_of[tri_id[valid]] = slots[valid]

    I = (L - 1) // 15
    arrays = dict(table=table, order=tri_id, root_box=root_box,
                  recs=recs, slot_of=slot_of,
                  int_bf=_int_bf16(table, I, np),
                  leaf_rw=np.ascontiguousarray(table[:, I:].T))
    if device_put:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    return BVH16(num_tris=T, **arrays)


def refit_bvh16(bvh: BVH16, tri_verts) -> BVH16:
    """Device-side refit: same topology, new triangle positions (streaming
    min/max sweeps, no gathers of note)."""
    L = bvh.num_leaves
    K = bvh.leaf_size
    tri_id = bvh.order
    valid = tri_id >= 0
    st = tri_verts[jnp.maximum(tri_id, 0)]
    st = jnp.where(valid[:, None, None], st, jnp.float32(1e30))

    leaf_rows, vlo, vhi = _leaf_data(st, tri_id, L, K, jnp)
    empty = ~(valid.reshape(L, K)).any(1)
    vlo = jnp.where(empty[:, None], jnp.float32(1e30), vlo)
    vhi = jnp.where(empty[:, None], jnp.float32(-1e30), vhi)

    levels = _binary_level_boxes(vlo, vhi, jnp)
    table = _assemble16(leaf_rows, levels, L, jnp)
    root_lo, root_hi = levels[-1]
    root_box = jnp.concatenate([root_lo[0], root_hi[0]])
    recs = leaf_rows.reshape(L * K, 10)[:, :9]
    I = (L - 1) // 15
    return bvh._replace(table=table, root_box=root_box, recs=recs,
                        int_bf=_int_bf16(table, I, jnp),
                        leaf_rw=(table[:, I:].T
                                 if bvh.leaf_rw is not None else None))


def _ctz(lsb):
    """count-trailing-zeros of an isolated low bit (lsb = x & -x)."""
    return jax.lax.population_count(
        jnp.maximum(lsb, 1).astype(jnp.uint32) - 1).astype(jnp.int32)


def _level_of(cur, M):
    """Implicit-heap level of node id (root = 0): cheaper recomputed from 4
    compares than carried as loop state (one fewer (R,) array per step)."""
    lvl = jnp.zeros_like(cur)
    th = 1
    for k in range(M):
        lvl = lvl + (cur >= th).astype(jnp.int32)
        th = th * 16 + 1          # first id of level k+1: (16^(k+1)-1)/15
    return lvl


def _step16(table, I, M, leaf_size, o3, d3, inv3, t_min, any_hit, state):
    """One lockstep iteration: exactly one row gather per live lane, with the
    per-child/per-triangle math batched as (16, R) / (K, R) ops. Hit u/v/front
    are NOT tracked here — they are recomputed once per ray after traversal
    (saves 3 loop-carried arrays + 4 take_along_axis per step)."""
    cur, mask, live, best_t, best_tri = state
    R = cur.shape[0]
    lvl = _level_of(cur, M)
    do = live & (cur >= 0)
    cols = table[:, jnp.maximum(cur, 0)]                # (128, R) THE gather
    is_leaf = cur >= I

    # ---- leaf: K dense triangle tests, batched (K, R) ----------------------
    rec = cols[:10 * leaf_size].reshape(leaf_size, 10, R)
    v0x, v0y, v0z = rec[:, 0], rec[:, 1], rec[:, 2]     # (K, R) each
    e1x, e1y, e1z = rec[:, 3], rec[:, 4], rec[:, 5]
    e2x, e2y, e2z = rec[:, 6], rec[:, 7], rec[:, 8]
    tid = rec[:, 9]
    ox, oy, oz = o3
    dx, dy, dz = d3
    px = dy * e2z - dz * e2y                            # (K, R)
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    uu = (sx * px + sy * py + sz * pz) * inv_det
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    vv = (dx * qx + dy * qy + dz * qz) * inv_det
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    thit = ((jnp.abs(det) > 1e-12) & (uu >= -1e-7) & (vv >= -1e-7)
            & (uu + vv <= 1.0 + 1e-7) & (tt > t_min) & (tt < best_t)
            & (tid >= 0.0) & (do & is_leaf))
    tcand = jnp.where(thit, tt, INF)                    # (K, R)
    kbest = jnp.argmin(tcand, axis=0)                   # (R,)
    tmin_leaf = jnp.take_along_axis(tcand, kbest[None], 0)[0]
    lhit = tmin_leaf < best_t
    best_tri = jnp.where(
        lhit,
        jnp.take_along_axis(tid, kbest[None], 0)[0].astype(jnp.int32),
        best_tri)
    best_t = jnp.where(lhit, tmin_leaf, best_t)

    # ---- interior: 16 slab tests, batched (16, R) ---------------------------
    box = cols[:96].reshape(16, 6, R)
    lox, loy, loz = box[:, 0], box[:, 1], box[:, 2]     # (16, R)
    hix, hiy, hiz = box[:, 3], box[:, 4], box[:, 5]
    ix, iy, iz = inv3
    t0x, t1x = (lox - ox) * ix, (hix - ox) * ix
    t0y, t1y = (loy - oy) * iy, (hiy - oy) * iy
    t0z, t1z = (loz - oz) * iz, (hiz - oz) * iz
    t_en = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    t_ex = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    bhit = ((t_en <= t_ex * 1.00000024) & (t_ex > 0.0) & (t_en < best_t)
            # empty subtrees store INVERTED boxes; the slab min/max would
            # silently repair them, so test explicitly
            & (lox <= hix) & (do & ~is_leaf))           # (16, R)
    chw = (1 << jnp.arange(16, dtype=jnp.int32))[:, None]
    bits = jnp.sum(jnp.where(bhit, chw, 0), axis=0)     # (R,)
    if any_hit:
        lsb = bits & -bits                 # order irrelevant: first set bit
        near = _ctz(lsb)
        has_int = bits != 0
    else:
        tcand_b = jnp.where(bhit, jnp.maximum(t_en, 0.0), INF)
        near = jnp.argmin(tcand_b, axis=0).astype(jnp.int32)
        has_int = jnp.take_along_axis(tcand_b, near[None], 0)[0] < INF
    bits = bits & ~jnp.where(has_int, 1 << near, 0)     # nearest descends now

    descend = (do & ~is_leaf) & has_int
    ki = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1)
    at_lvl = ki == lvl[:, None]
    mask = jnp.where(at_lvl & descend[:, None], bits[:, None], mask)

    # ---- pop: deepest level with pending children ---------------------------
    need_pop = do & (is_leaf | ~has_int)
    pend = mask != 0                                    # (R, M)
    kstar = jnp.max(jnp.where(pend, ki, -1), axis=1)    # (R,) deepest, -1 none
    has_pend = kstar >= 0
    sel = ki == kstar[:, None]
    m_k = jnp.sum(jnp.where(sel, mask, 0), axis=1)
    # ancestor at level kstar: implicit-heap parent chain from cur
    # (parent(q) = (q-1) >> 4); cur sits at level `lvl`, unrolled M hops
    a_k = cur
    steps_up = lvl - kstar
    for _ in range(M):
        a_k = jnp.where(steps_up > 0, (a_k - 1) >> 4, a_k)
        steps_up = steps_up - 1
    lsb = m_k & -m_k
    cbit = _ctz(lsb)
    mask = jnp.where(sel & need_pop[:, None], mask & ~lsb[:, None], mask)

    pop = need_pop & has_pend
    cur = jnp.where(descend, 16 * cur + 1 + near,
                    jnp.where(pop, 16 * a_k + 1 + cbit,
                              jnp.where(need_pop, -1, cur)))
    live = live & ~(need_pop & ~has_pend)
    if any_hit:
        live = live & ~(best_tri >= 0)
    return cur, mask, live, best_t, best_tri


def _pop16(cur, mask, lvl, M, need_pop, descend, near):
    """Shared trail pop (see _step16): returns (cur', mask', died)."""
    R = cur.shape[0]
    ki = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1)
    pend = mask != 0
    kstar = jnp.max(jnp.where(pend, ki, -1), axis=1)
    has_pend = kstar >= 0
    sel = ki == kstar[:, None]
    m_k = jnp.sum(jnp.where(sel, mask, 0), axis=1)
    a_k = cur
    steps_up = lvl - kstar
    for _ in range(M):
        a_k = jnp.where(steps_up > 0, (a_k - 1) >> 4, a_k)
        steps_up = steps_up - 1
    lsb = m_k & -m_k
    cbit = _ctz(lsb)
    mask = jnp.where(sel & need_pop[:, None], mask & ~lsb[:, None], mask)
    pop = need_pop & has_pend
    cur = jnp.where(descend, 16 * cur + 1 + near,
                    jnp.where(pop, 16 * a_k + 1 + cbit,
                              jnp.where(need_pop, -1, cur)))
    return cur, mask, need_pop & ~has_pend


def _step16_int(int_bf, I, M, o3, inv3, any_hit, state):
    """Interior-only lockstep iteration: the 16 child boxes arrive via a
    one-hot bf16 MATMUL against the conservative interior table (int_bf,
    (96, Ip)) instead of an HBM row gather — the MXU fetches ~4369 x 96
    table elements per lane at matmul rate, which beats the measured
    ~60 Mrows/s gather ceiling at full wavefronts and costs near-nothing at
    the narrow phase tail. Lanes sitting at a leaf node WAIT (untouched)."""
    cur, mask, live, best_t, best_tri = state
    R = cur.shape[0]
    Ip = int_bf.shape[1]
    lvl = _level_of(cur, M)
    do = live & (cur >= 0) & (cur < I)
    idx = jnp.where(do, cur, -1)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (Ip, R), 0) == idx[None, :])
    cols = jax.lax.dot_general(int_bf, oh.astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (96, R)
    box = cols.reshape(16, 6, R)
    lox, loy, loz = box[:, 0], box[:, 1], box[:, 2]
    hix, hiy, hiz = box[:, 3], box[:, 4], box[:, 5]
    ox, oy, oz = o3[0], o3[1], o3[2]
    ix, iy, iz = inv3
    t0x, t1x = (lox - ox) * ix, (hix - ox) * ix
    t0y, t1y = (loy - oy) * iy, (hiy - oy) * iy
    t0z, t1z = (loz - oz) * iz, (hiz - oz) * iz
    t_en = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    t_ex = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    bhit = ((t_en <= t_ex * 1.00000024) & (t_ex > 0.0) & (t_en < best_t)
            & (lox <= hix) & do)
    chw = (1 << jnp.arange(16, dtype=jnp.int32))[:, None]
    bits = jnp.sum(jnp.where(bhit, chw, 0), axis=0)
    if any_hit:
        lsb = bits & -bits
        near = _ctz(lsb)
        has_int = bits != 0
    else:
        tcand_b = jnp.where(bhit, jnp.maximum(t_en, 0.0), INF)
        near = jnp.argmin(tcand_b, axis=0).astype(jnp.int32)
        has_int = jnp.take_along_axis(tcand_b, near[None], 0)[0] < INF
    bits = bits & ~jnp.where(has_int, 1 << near, 0)
    descend = do & has_int
    ki = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1)
    mask = jnp.where((ki == lvl[:, None]) & descend[:, None],
                     bits[:, None], mask)
    cur, mask, died = _pop16(cur, mask, lvl, M, do & ~has_int, descend, near)
    return cur, mask, live & ~died, best_t, best_tri


def _step16_leaf(table, I, M, leaf_size, o3, d3, t_min, any_hit, state):
    """Leaf-only lockstep iteration: ONE unified-table row gather, K dense
    triangle tests, then the trail pop. Interior lanes WAIT (they gather row
    0 — the gather costs per-index regardless, which is why the loop only
    schedules this step when enough live lanes sit at leaves)."""
    cur, mask, live, best_t, best_tri = state
    R = cur.shape[0]
    lvl = _level_of(cur, M)
    do = live & (cur >= I)
    cols = table[:, jnp.where(do, cur, 0)]
    rec = cols[:10 * leaf_size].reshape(leaf_size, 10, R)
    v0x, v0y, v0z = rec[:, 0], rec[:, 1], rec[:, 2]
    e1x, e1y, e1z = rec[:, 3], rec[:, 4], rec[:, 5]
    e2x, e2y, e2z = rec[:, 6], rec[:, 7], rec[:, 8]
    tid = rec[:, 9]
    ox, oy, oz = o3
    dx, dy, dz = d3
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    uu = (sx * px + sy * py + sz * pz) * inv_det
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    vv = (dx * qx + dy * qy + dz * qz) * inv_det
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    thit = ((jnp.abs(det) > 1e-12) & (uu >= -1e-7) & (vv >= -1e-7)
            & (uu + vv <= 1.0 + 1e-7) & (tt > t_min) & (tt < best_t)
            & (tid >= 0.0) & do)
    tcand = jnp.where(thit, tt, INF)
    kbest = jnp.argmin(tcand, axis=0)
    tmin_leaf = jnp.take_along_axis(tcand, kbest[None], 0)[0]
    lhit = tmin_leaf < best_t
    best_tri = jnp.where(
        lhit,
        jnp.take_along_axis(tid, kbest[None], 0)[0].astype(jnp.int32),
        best_tri)
    best_t = jnp.where(lhit, tmin_leaf, best_t)
    near0 = jnp.zeros(R, jnp.int32)
    cur, mask, died = _pop16(cur, mask, lvl, M, do,
                             jnp.zeros(R, bool), near0)
    live = live & ~died
    if any_hit:
        live = live & ~(best_tri >= 0)
    return cur, mask, live, best_t, best_tri


LEAF_FRAC_NUM = 4   # run a leaf step when at-leaf lanes >= 1/4 of live lanes


def _traverse16_mxu(bvh: BVH16, o, d, t_min, t_max, any_hit: bool,
                    max_steps: int = None):
    """MXU-split traversal: per lane the node-visit SEQUENCE is identical to
    _traverse16's (same descend/pop decisions — conservative bf16 boxes can
    only ADD visits, and added subtrees are culled by the same best_t rules),
    but each lockstep iteration is EITHER an interior step (one-hot matmul,
    no gather) or a leaf step (the one row gather), picked by a live-lane
    census: leaf steps fire once at-leaf lanes reach 1/4 of the live set."""
    R = o.shape[0]
    I = bvh.n_interior
    M = max(bvh.depth, 1)
    leaf_size = bvh.leaf_size
    if t_max is None:
        t_max = jnp.full((R,), INF)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    inv_d = safe_inv_dir(d)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    int_bf = bvh.int_bf

    state = (jnp.zeros(R, jnp.int32), jnp.zeros((R, M), jnp.int32),
             jnp.ones(R, bool), t_max, jnp.full(R, -1, jnp.int32))

    def run(state, o, d, inv_d, t_min, steps):
        o3 = (o[:, 0], o[:, 1], o[:, 2])
        d3 = (d[:, 0], d[:, 1], d[:, 2])
        inv3 = (inv_d[:, 0], inv_d[:, 1], inv_d[:, 2])

        def cond(c):
            s, i = c
            return s[2].any() & (i < steps)

        def body(c):
            s, i = c
            cur, _, live, _, _ = s
            n_leaf = jnp.sum((live & (cur >= I)).astype(jnp.int32))
            n_live = jnp.sum((live & (cur >= 0)).astype(jnp.int32))
            do_leaf = (LEAF_FRAC_NUM * n_leaf >= n_live) \
                | (n_leaf == n_live)
            s = jax.lax.cond(
                do_leaf,
                lambda st: _step16_leaf(bvh.table, I, M, leaf_size, o3, d3,
                                        t_min, any_hit, st),
                lambda st: _step16_int(int_bf, I, M, o3, inv3, any_hit, st),
                s)
            return (s, i + 1)

        s, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
        return s

    total_steps = max_steps if max_steps is not None else \
        sum(s for s, _ in PHASES16_MXU)
    if R < 16384:
        phases = [(total_steps, None)]
    else:
        phases = []
        left = total_steps
        for steps, keep in PHASES16_MXU:
            phases.append((min(steps, left), keep if left > steps else None))
            left -= min(steps, left)
            if left <= 0:
                break

    out_t = t_max
    out_tri = jnp.full(R, -1, jnp.int32)
    ridx = jnp.arange(R, dtype=jnp.int32)

    for steps, keep in phases:
        state = run(state, o, d, inv_d, t_min, steps)
        cur, mask, live, best_t, best_tri = state
        out_t = out_t.at[ridx].set(best_t)
        out_tri = out_tri.at[ridx].set(best_tri)
        if keep is None:
            break
        Rk = max(int(round(R * keep)), 128) if R > 128 else R
        if Rk >= o.shape[0]:
            continue
        Rc = o.shape[0]
        live_i = live.astype(jnp.int32)
        n_live = jnp.sum(live_i)
        rank = jnp.where(live, jnp.cumsum(live_i) - 1,
                         n_live + jnp.cumsum(1 - live_i) - 1)
        sel = jnp.zeros(Rc, jnp.int32).at[rank].set(
            jnp.arange(Rc, dtype=jnp.int32))[:Rk]
        state = (cur[sel], mask[sel], live[sel], best_t[sel], best_tri[sel])
        o, d, inv_d, t_min = o[sel], d[sel], inv_d[sel], t_min[sel]
        ridx = ridx[sel]

    return out_t, out_tri


def _traverse16(bvh: BVH16, o, d, t_min, t_max, any_hit: bool,
                max_steps: int = None):
    R = o.shape[0]
    I = bvh.n_interior
    M = max(bvh.depth, 1)
    leaf_size = bvh.leaf_size
    if t_max is None:
        t_max = jnp.full((R,), INF)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    inv_d = safe_inv_dir(d)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))

    state = (jnp.zeros(R, jnp.int32), jnp.zeros((R, M), jnp.int32),
             jnp.ones(R, bool), t_max, jnp.full(R, -1, jnp.int32))

    def run(state, o, d, inv_d, t_min, steps):
        o3 = (o[:, 0], o[:, 1], o[:, 2])
        d3 = (d[:, 0], d[:, 1], d[:, 2])
        inv3 = (inv_d[:, 0], inv_d[:, 1], inv_d[:, 2])

        def cond(c):
            s, i = c
            return s[2].any() & (i < steps)

        def body(c):
            s, i = c
            return (_step16(bvh.table, I, M, leaf_size, o3, d3, inv3,
                            t_min, any_hit, s), i + 1)

        s, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
        return s

    total_steps = max_steps if max_steps is not None else \
        sum(s for s, _ in PHASES16)
    if R < 16384:
        phases = [(total_steps, None)]
    else:
        phases = []
        left = total_steps
        for steps, keep in PHASES16:
            phases.append((min(steps, left), keep if left > steps else None))
            left -= min(steps, left)
            if left <= 0:
                break

    out_t = t_max
    out_tri = jnp.full(R, -1, jnp.int32)
    ridx = jnp.arange(R, dtype=jnp.int32)

    for steps, keep in phases:
        state = run(state, o, d, inv_d, t_min, steps)
        cur, mask, live, best_t, best_tri = state
        out_t = out_t.at[ridx].set(best_t)
        out_tri = out_tri.at[ridx].set(best_tri)
        if keep is None:
            break
        Rk = max(int(round(R * keep)), 128) if R > 128 else R
        if Rk >= o.shape[0]:
            continue
        # stable live-first partition WITHOUT a sort: live lanes keep order
        # at ranks 0..n_live-1, dead lanes fill the tail (argsort on (R,) is
        # several ms at R=256k; two cumsums + one scatter are ~free)
        Rc = o.shape[0]
        live_i = live.astype(jnp.int32)
        n_live = jnp.sum(live_i)
        rank = jnp.where(live, jnp.cumsum(live_i) - 1,
                         n_live + jnp.cumsum(1 - live_i) - 1)
        sel = jnp.zeros(Rc, jnp.int32).at[rank].set(
            jnp.arange(Rc, dtype=jnp.int32))[:Rk]
        state = (cur[sel], mask[sel], live[sel], best_t[sel], best_tri[sel])
        o, d, inv_d, t_min = o[sel], d[sel], inv_d[sel], t_min[sel]
        ridx = ridx[sel]

    return out_t, out_tri


def _dispatch16(bvh, o, d, t_min, t_max, any_hit, max_steps, mxu):
    if mxu is None:
        mxu = bvh.int_bf is not None
    if mxu and bvh.int_bf is not None:
        # the split walk spreads a ray's visits over ~1.4x more iterations
        ms = None if max_steps is None else int(max_steps * 1.4)
        return _traverse16_mxu(bvh, o, d, t_min, t_max, any_hit=any_hit,
                               max_steps=ms)
    return _traverse16(bvh, o, d, t_min, t_max, any_hit=any_hit,
                       max_steps=max_steps)


def bvh16_closest_hit(bvh: BVH16, o, d, t_min=1e-4, t_max=None,
                      max_steps: int = None, mxu=None) -> HitRecord:
    """Closest-hit traversal. o, d: (R, 3). u/v/front are recomputed ONCE from
    the winning triangle's record after traversal (two R-row gathers) instead
    of being carried through every lockstep step."""
    best_t, best_tri = _dispatch16(bvh, o, d, t_min, t_max,
                                   any_hit=False, max_steps=max_steps,
                                   mxu=mxu)
    miss = best_tri < 0
    rec = bvh.recs[bvh.slot_of[jnp.maximum(best_tri, 0)]]       # (R, 9)
    v0, e1, e2 = rec[:, 0:3], rec[:, 3:6], rec[:, 6:9]
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, -1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = o - v0
    q = jnp.cross(s, e1)
    bu = jnp.sum(s * p, -1) * inv_det
    bv = jnp.sum(d * q, -1) * inv_det
    return HitRecord(t=jnp.where(miss, INF, best_t), tri=best_tri,
                     u=jnp.where(miss, 0.0, bu),
                     v=jnp.where(miss, 0.0, bv),
                     front=jnp.where(miss, False, det > 0))


def bvh16_any_hit(bvh: BVH16, o, d, t_min=1e-4, t_max=None,
                  max_steps: int = None, mxu=None):
    """Shadow-ray traversal: occluded (R,) bool, per-lane early exit."""
    best_t, best_tri = _dispatch16(bvh, o, d, t_min, t_max,
                                   any_hit=True, max_steps=max_steps,
                                   mxu=mxu)
    limit = t_max if t_max is not None else INF
    return (best_tri >= 0) & (best_t < limit)
