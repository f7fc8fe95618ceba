"""BVH build (host, vectorized numpy LBVH) + device traversal (jnp wavefront).

Reference: Scene::BuildAccelerationStructures (src/Scene.cpp:67-214) builds a BLAS
per primitive per LOD + a TLAS over instances via D3D12 hardware; traversal is
RayQuery in HLSL (RaytracingCommon.hlsli). On TPU both are software:

- BUILD: Morton-ordered implicit balanced binary tree ("treelet LBVH"): triangles
  sorted by centroid Morton code, grouped into K-triangle leaves, interior nodes in
  heap layout (children of i are 2i+1, 2i+2) with AABBs computed bottom-up, fully
  vectorized. No pointers: the topology is implicit in the array index, which makes
  the traversal loop branch-light — the property that matters for the lockstep TPU
  wavefront.
- TRAVERSAL: a lax.while_loop over a wavefront of rays in lockstep, per-ray explicit
  stack (R, DEPTH) in registers/VMEM. Near-child-first ordering via per-ray swap.
  Leaf hits test K triangles vectorized (SURVEY.md §7 "BVH traversal divergence").

The two-level (TLAS/BLAS) layout with per-instance transforms + LOD selection is
layered on top in ops/tlas.py; the flattened world-space BVH here is used by the
path tracer's "static snapshot" mode and as the BLAS representation."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.ops.intersect import INF, ray_aabb, ray_triangle, safe_inv_dir

LEAF_SIZE = 4


class BVH(NamedTuple):
    """Heap-layout BVH. L leaves (pow2), 2L-1 nodes; node i's children are
    2i+1/2i+2; leaves are nodes >= L-1, leaf j holds sorted tris [j*K, (j+1)*K).

    TPU memory layout: gathers cost ~20ns per ROW regardless of row width, so
    every per-step fetch is ONE row:
    - child_boxes[i] = both children's AABBs of interior node i (12 floats);
    - leaf_rows[j]   = all K triangles of leaf j, 10 floats each
                       (v0, e1, e2, tid-as-float; f32 holds ids < 2^24 exactly).
    This cut traversal gathers per lockstep iteration from ~14 to 2."""

    child_boxes: jnp.ndarray  # (L-1, 12) f32: c0.lo, c0.hi, c1.lo, c1.hi (or (1,12) if L==1)
    leaf_rows: jnp.ndarray    # (L, K*10) f32
    root_box: jnp.ndarray     # (6,) f32 scene bounds (lo, hi)
    num_tris: int             # original triangle count

    @property
    def num_leaves(self) -> int:
        return self.leaf_rows.shape[0]

    @property
    def leaf_size(self) -> int:
        return self.leaf_rows.shape[1] // 10

    @property
    def depth(self) -> int:
        return int(np.log2(self.num_leaves)) + 1


def _morton3(x: np.ndarray) -> np.ndarray:
    """(N, 3) ints in [0, 1024) -> 30-bit Morton codes."""

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v

    return spread(x[:, 0]) | (spread(x[:, 1]) << np.uint64(1)) | (spread(x[:, 2]) << np.uint64(2))


def build_bvh(tri_verts: np.ndarray, leaf_size: int = LEAF_SIZE,
              device_put: bool = True) -> BVH:
    """tri_verts: (T, 3, 3) float32 world/object-space triangles.

    Partitioning: level-wise MEDIAN SPLIT along each node's widest centroid
    axis — balanced (fits the implicit heap exactly) with good spatial
    separation. (A Morton-ordered balanced tree had catastrophically
    overlapping siblings: grazing rays visited 10k+ nodes.)"""
    tri_verts = np.asarray(tri_verts, np.float32)
    T = tri_verts.shape[0]
    assert T > 0, "empty BVH"

    L = 1
    while L * leaf_size < T:
        L *= 2
    N = L * leaf_size
    pad = N - T
    cent = tri_verts.mean(axis=1)
    if pad:
        # padding sorts to +inf: clusters into the rightmost leaves
        cent = np.concatenate([cent, np.full((pad, 3), np.inf, np.float32)], 0)
    order = np.arange(N)

    n_levels = int(np.log2(L))
    for lvl in range(n_levels):
        seg_size = N >> lvl
        starts = np.arange(0, N, seg_size)
        c = cent[order]
        cf = np.where(np.isfinite(c), c, np.nan)
        seg_lo = np.full((len(starts), 3), np.inf, np.float32)
        seg_hi = np.full((len(starts), 3), -np.inf, np.float32)
        # nan-aware segment extents (padding ignored)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            for ax in range(3):
                col = cf[:, ax].reshape(len(starts), seg_size)
                seg_lo[:, ax] = np.nanmin(col, axis=1)
                seg_hi[:, ax] = np.nanmax(col, axis=1)
        seg_lo = np.where(np.isfinite(seg_lo), seg_lo, 0.0)
        seg_hi = np.where(np.isfinite(seg_hi), seg_hi, 0.0)
        axis = np.argmax(seg_hi - seg_lo, axis=1)                    # per segment
        seg_of = np.arange(N) // seg_size
        key = c[np.arange(N), axis[seg_of]]
        key = np.where(np.isfinite(key), key, np.inf)
        perm = np.lexsort((key, seg_of))
        order = order[perm]

    valid = order < T
    sorted_tris = np.where(valid[:, None, None],
                           tri_verts[np.minimum(order, T - 1)],
                           np.float32(1e30))
    tri_id = np.where(valid, order, -1).astype(np.int32)

    # leaf AABBs (padding leaves become inverted/huge but finite via masking)
    leaf_tris = sorted_tris.reshape(L, leaf_size, 3, 3)
    valid = (tri_id.reshape(L, leaf_size) >= 0)[..., None, None]
    big = np.float32(1e30)
    vlo = np.where(valid, leaf_tris, big).reshape(L, -1, 3).min(1)
    vhi = np.where(valid, leaf_tris, -big).reshape(L, -1, 3).max(1)
    # fully-empty leaves: inverted box (never hit)
    empty = ~valid.reshape(L, -1).any(1)
    vlo[empty] = big
    vhi[empty] = -big

    n_nodes = 2 * L - 1
    node_lo = np.empty((n_nodes, 3), np.float32)
    node_hi = np.empty((n_nodes, 3), np.float32)
    node_lo[L - 1:] = vlo
    node_hi[L - 1:] = vhi
    # bottom-up levels (vectorized per level)
    start = L - 1
    while start > 0:
        parent_start = (start - 1) // 2
        n_par = start - parent_start
        ch = np.arange(parent_start, start) * 2 + 1
        node_lo[parent_start:start] = np.minimum(node_lo[ch], node_lo[ch + 1])
        node_hi[parent_start:start] = np.maximum(node_hi[ch], node_hi[ch + 1])
        start = parent_start

    v0 = sorted_tris[:, 0]
    e1 = sorted_tris[:, 1] - v0
    e2 = sorted_tris[:, 2] - v0
    # pack leaf rows: K tris x [v0(3), e1(3), e2(3), tid(1 as f32; -1 padding)]
    tri_rec = np.concatenate([v0, e1, e2, tri_id.astype(np.float32)[:, None]],
                             axis=1)                          # (L*K, 10)
    leaf_rows = tri_rec.reshape(L, leaf_size * 10)
    # pack interior rows: both children's boxes
    if L > 1:
        ch = np.arange(0, L - 1) * 2 + 1
        child_boxes = np.concatenate(
            [node_lo[ch], node_hi[ch], node_lo[ch + 1], node_hi[ch + 1]],
            axis=1).astype(np.float32)                        # (L-1, 12)
    else:
        child_boxes = np.zeros((1, 12), np.float32)
    root_box = np.concatenate([node_lo[0], node_hi[0]]).astype(np.float32)
    arrays = dict(child_boxes=child_boxes, leaf_rows=leaf_rows,
                  root_box=root_box)
    if device_put:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    return BVH(num_tris=T, **arrays)


class HitRecord(NamedTuple):
    t: jnp.ndarray        # (R,) f32, INF = miss
    tri: jnp.ndarray      # (R,) i32 ORIGINAL triangle id, -1 = miss
    u: jnp.ndarray        # (R,) f32 barycentric of v1
    v: jnp.ndarray        # (R,) f32 barycentric of v2
    front: jnp.ndarray    # (R,) bool det>0 (front-facing per winding)


def _traverse(bvh: BVH, o, d, t_min, t_max, any_hit: bool,
              max_steps: int = None):
    """Stackless bit-trail lockstep traversal over the implicit heap BVH.

    Per-lane state is just (node, trail) uint32 scalars — no per-ray stack array.
    Heap indices are 1-based inside the loop: parent^k(x) = x >> k, sibling = x^1.
    The backtrack uses count-trailing-zeros on the trail bitmask, so there is no
    inner pop loop. This keeps the while_loop body tiny + scatter-free (fast XLA
    compile, pure VPU elementwise on TPU) — the SIMT-emulation strategy from
    SURVEY.md §7 with the stack optimized away."""
    R = o.shape[0]
    L = bvh.num_leaves
    leaf_size = bvh.leaf_size
    if max_steps is None:
        # typical lockstep drain is < 256 steps with the median-split tree and
        # subdivided giant triangles; the cap bounds worst-case dispatches so a
        # pathological lane can never wedge the TPU worker (bias is ~1e-4 px)
        max_steps = 1024
    if t_max is None:
        t_max = jnp.full((R,), INF)
    else:
        t_max = jnp.broadcast_to(t_max, (R,))

    inv_d = safe_inv_dir(d)
    u32 = jnp.uint32

    def ctz(x):
        # count trailing zeros via popcount((x & -x) - 1); ctz(0) = 32
        low = x & (~x + u32(1))
        return jax.lax.population_count(low - u32(1)) | jnp.where(x == 0, u32(32), u32(0))

    def cond(state):
        node1, trail, live, best_t, best_tri, bu, bv, bf, steps = state
        return live.any() & (steps < max_steps)

    def body(state):
        node1, trail, live, best_t, best_tri, bu, bv, bf, steps = state
        node0 = node1.astype(jnp.int32) - 1
        is_leaf = node0 >= (L - 1)

        # --- interior: ONE row gather fetches both children's boxes ---
        c0 = jnp.clip(2 * node0 + 1, 0, 2 * L - 2)
        c1 = c0 + 1
        irow = bvh.child_boxes[jnp.clip(node0, 0, max(L - 2, 0))]   # (R, 12)
        h0, t0 = ray_aabb(o, inv_d, irow[:, 0:3], irow[:, 3:6], best_t)
        h1, t1 = ray_aabb(o, inv_d, irow[:, 6:9], irow[:, 9:12], best_t)
        h0 &= ~is_leaf & live
        h1 &= ~is_leaf & live
        both = h0 & h1
        near0 = jnp.where(both & (t1 < t0), c1, jnp.where(h1 & ~h0, c1, c0))
        any_child = h0 | h1

        # --- leaf: ONE row gather fetches all K triangle records ---
        leaf_id = jnp.clip(node0 - (L - 1), 0, L - 1)
        lrow = bvh.leaf_rows[leaf_id]                               # (R, K*10)
        lt, ltri, lu, lv, lf = best_t, best_tri, bu, bv, bf
        do_leaf = is_leaf & live
        for k in range(leaf_size):
            rec = lrow[:, k * 10:(k + 1) * 10]
            tid = rec[:, 9]
            t, tu, tv, hit, front = _tri_hit(o, d, rec[:, 0:3], rec[:, 3:6],
                                             rec[:, 6:9], t_min, lt)
            hit &= do_leaf & (tid >= 0.0)
            lt = jnp.where(hit, t, lt)
            ltri = jnp.where(hit, tid.astype(jnp.int32), ltri)
            lu = jnp.where(hit, tu, lu)
            lv = jnp.where(hit, tv, lv)
            lf = jnp.where(hit, front, lf)
        best_t, best_tri, bu, bv, bf = lt, ltri, lu, lv, lf

        # --- next node: descend (interior w/ hit child) or backtrack ---
        descend = ~is_leaf & any_child & live
        trail_desc = (trail << u32(1)) | jnp.where(both, u32(1), u32(0))
        node_desc = (near0 + 1).astype(u32)

        tz = ctz(trail)
        exhausted = trail == 0
        node_pop = (((node1 >> jnp.minimum(tz, u32(31)))) ^ u32(1))
        trail_pop = (trail >> jnp.minimum(tz, u32(31))) ^ u32(1)

        if any_hit:
            # early per-lane exit on any accepted hit
            found = best_tri >= 0
            live_new = live & ~found & jnp.where(descend, True, ~exhausted)
        else:
            live_new = live & jnp.where(descend, True, ~exhausted)
        node_new = jnp.where(descend, node_desc, node_pop)
        trail_new = jnp.where(descend, trail_desc, trail_pop)
        node_new = jnp.where(live_new, node_new, node1)
        trail_new = jnp.where(live_new, trail_new, trail)
        return (node_new, trail_new, live_new, best_t, best_tri, bu, bv, bf,
                steps + 1)

    init = (jnp.ones(R, u32), jnp.zeros(R, u32), jnp.ones(R, bool),
            t_max, jnp.full(R, -1, jnp.int32),
            jnp.zeros(R), jnp.zeros(R), jnp.zeros(R, bool), jnp.int32(0))
    _, _, _, best_t, best_tri, bu, bv, bf, _ = jax.lax.while_loop(cond, body, init)
    return best_t, best_tri, bu, bv, bf


def bvh_closest_hit(bvh: BVH, o, d, t_min=1e-4, t_max=None,
                    max_steps: int = None) -> HitRecord:
    """Closest-hit traversal. o, d: (R, 3). Lanes run in lockstep until all done."""
    best_t, best_tri, bu, bv, bf = _traverse(bvh, o, d, t_min, t_max,
                                             any_hit=False, max_steps=max_steps)
    miss = best_tri < 0
    return HitRecord(t=jnp.where(miss, INF, best_t), tri=best_tri,
                     u=bu, v=bv, front=bf)


def bvh_any_hit(bvh: BVH, o, d, t_min=1e-4, t_max=None, max_steps: int = None):
    """Shadow-ray traversal: occluded (R,) bool, early per-lane exit on first hit
    (reference: any-hit RayQuery for shadows)."""
    best_t, best_tri, _, _, _ = _traverse(bvh, o, d, t_min, t_max,
                                          any_hit=True, max_steps=max_steps)
    limit = t_max if t_max is not None else INF
    return (best_tri >= 0) & (best_t < limit)


def _tri_hit(o, d, v0, e1, e2, t_min, t_max):
    """Möller-Trumbore with precomputed edges."""
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, -1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = o - v0
    u = jnp.sum(s * p, -1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(d * q, -1) * inv_det
    t = jnp.sum(e2 * q, -1) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= -1e-7) & (v >= -1e-7)
           & (u + v <= 1.0 + 1e-7) & (t > t_min) & (t < t_max))
    return t, u, v, hit, det > 0
