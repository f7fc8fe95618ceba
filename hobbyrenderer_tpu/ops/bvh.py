"""BVH build (host, vectorized numpy) + device traversal (jnp wavefront).

Reference: Scene::BuildAccelerationStructures (src/Scene.cpp:67-214) builds a BLAS
per primitive per LOD + a TLAS over instances via D3D12 hardware; traversal is
RayQuery in HLSL (RaytracingCommon.hlsli). On TPU both are software, and the
design is driven by one measured number: random HBM row gathers cost ~10 ns per
ROW regardless of row width, so traversal cost ~= rays x steps x gathers/step.

- SHAPE: 4-wide BVH in an implicit complete 4-ary heap (L = 4^m leaves,
  I = (L-1)/3 interior nodes; children of q are 4q+1..4q+4; node q >= I is leaf
  q - I). Quarter the depth-2 steps of a binary tree per ray.
- UNIFIED NODE TABLE: interior rows hold all four children's AABBs (24 f32),
  leaf rows hold K=4 triangle records (v0, e1, e2, id) x 4 = 40 f32 — both in
  ONE (I+L, 40) table, so every traversal step costs exactly ONE row gather
  (the previous binary layout fetched child boxes AND leaf rows every step).
- TRAVERSAL: lockstep lax.while_loop; per-lane explicit stack (R, D) with
  one-hot push/pop (D = 3*depth+2); children visited near-first via a 4-wide
  sorting network on slab-entry t.
- COMPACTION: the lockstep wavefront pays for its slowest lane, so traversal
  runs in PHASES — after a fixed step budget the still-live rays (typically a
  small fraction) are argsort-compacted into a narrower wavefront and continue.
  Cost drops from R x max_steps to ~ R x mean_steps.
- REFIT (dynamic scenes): the tree TOPOLOGY (triangle order) is host-built
  once; refit_bvh() recomputes leaf rows and all box rows on device from
  transformed world triangles — pure streaming min/max sweeps, no gathers of
  note — the TPU analogue of the reference's per-frame TLAS rebuild
  (src/CommonRenderers.cpp:186-250).

Partitioning is level-wise MEDIAN SPLIT along each node's widest centroid axis
(balanced => fits the implicit heap exactly; a Morton-ordered balanced tree had
catastrophically overlapping siblings)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.ops.intersect import INF, safe_inv_dir

LEAF_SIZE = 4

# (steps, keep_fraction) wavefront phases: after `steps` lockstep iterations,
# compact the still-live lanes into R * keep lanes and continue. Live rays
# beyond the narrowed width keep their best-so-far (same failure mode as the
# step cap — measured live fractions at each boundary are well under the keep:
# random-ray drain on the 528k-tri stress scene is 60% live @ 16 steps, 4.7%
# @ 48, 0.2% @ 96).
PHASES = ((24, 1 / 2), (48, 1 / 16), (160, 1 / 32), (800, None))


class BVH(NamedTuple):
    """4-wide unified-table BVH. Static shape facts derive from array shapes:
    L = (3 * table.rows + 1) // 4, I = (L - 1) // 3, K = order.size // L.

    table_w is an OPTIONAL 16-ary view of the SAME tree (same sorted triangle
    order, same binary box levels): interior rows hold 16 child AABBs (96 f32),
    leaf rows hold leaf_w triangle records. The idea was that a random HBM row
    gather costs per-ROW (nearly width-independent), so one 16-ary step
    fetches 4x the tree; MEASURED it loses 7x anyway — the per-step compute
    over all lanes dominates (see build_bvh). Not built by default."""

    table: jnp.ndarray     # (I + L, 40) f32 unified node rows
    order: jnp.ndarray     # (L * K,) i32 leaf slot -> triangle id (-1 pad)
    root_box: jnp.ndarray  # (6,) f32 scene bounds (lo, hi)
    num_tris: int          # original triangle count
    table_w: jnp.ndarray = None  # (Iw + Lw, max(96, 10*leaf_w)) or None

    @property
    def leaf_w(self) -> int:
        # 16-wide leaf triangle count from the row width (160 -> 16, 640 -> 64);
        # a shape fact, so it stays static under jit
        return self.table_w.shape[1] // 10 if self.table_w is not None else 0

    @property
    def num_leaves(self) -> int:
        return (3 * self.table.shape[0] + 1) // 4

    @property
    def n_interior(self) -> int:
        return (self.num_leaves - 1) // 3

    @property
    def leaf_size(self) -> int:
        return self.order.shape[0] // self.num_leaves

    @property
    def depth(self) -> int:
        # 4-ary levels below the root
        return max(1, (int(np.log2(max(self.num_leaves, 1))) + 1) // 2)


def _median_split_order(cent: np.ndarray, L: int, leaf_size: int) -> np.ndarray:
    """Level-wise widest-axis median split -> permutation of N=L*K slots."""
    N = L * leaf_size
    order = np.arange(N)
    n_levels = int(np.log2(L)) if L > 1 else 0
    import warnings
    for lvl in range(n_levels):
        seg_size = N >> lvl
        starts = np.arange(0, N, seg_size)
        c = cent[order]
        cf = np.where(np.isfinite(c), c, np.nan)
        seg_lo = np.full((len(starts), 3), np.inf, np.float32)
        seg_hi = np.full((len(starts), 3), -np.inf, np.float32)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            for ax in range(3):
                col = cf[:, ax].reshape(len(starts), seg_size)
                seg_lo[:, ax] = np.nanmin(col, axis=1)
                seg_hi[:, ax] = np.nanmax(col, axis=1)
        seg_lo = np.where(np.isfinite(seg_lo), seg_lo, 0.0)
        seg_hi = np.where(np.isfinite(seg_hi), seg_hi, 0.0)
        axis = np.argmax(seg_hi - seg_lo, axis=1)
        seg_of = np.arange(N) // seg_size
        key = c[np.arange(N), axis[seg_of]]
        key = np.where(np.isfinite(key), key, np.inf)
        perm = np.lexsort((key, seg_of))
        order = order[perm]
    return order


def _binary_level_boxes(vlo, vhi, xp):
    """Leaf boxes (L, 3) -> list of (lo, hi) per binary level, bottom-up
    (index 0 = leaves, last = root)."""
    levels = [(vlo, vhi)]
    lo, hi = vlo, vhi
    while lo.shape[0] > 1:
        lo = xp.minimum(lo[0::2], lo[1::2])
        hi = xp.maximum(hi[0::2], hi[1::2])
        levels.append((lo, hi))
    return levels


def _assemble_table(leaf_rows, levels, L: int, xp):
    """Interior rows from binary-level boxes + leaf rows -> (I+L, W) table.

    4-ary level k's CHILDREN are binary level 2(k+1); binary level ell (from
    the root) is levels[n_bin - ell] where n_bin = log2(L)."""
    W = leaf_rows.shape[1]
    n_bin = int(np.log2(L)) if L > 1 else 0
    m = n_bin // 2
    rows = []
    for k in range(m):
        lo, hi = levels[n_bin - 2 * (k + 1)]       # (4^(k+1), 3) each
        boxes = xp.concatenate([lo, hi], axis=1)   # (4^(k+1), 6) lo|hi
        rows.append(boxes.reshape(-1, 24))         # 4 children -> (4^k, 24)
    if rows:
        interior = xp.concatenate(rows, axis=0)
        pad = xp.zeros((interior.shape[0], W - 24), interior.dtype)
        interior = xp.concatenate([interior, pad], axis=1)
        return xp.concatenate([interior, leaf_rows], axis=0)
    return leaf_rows


def _assemble_table_wide(leaf_rows4, levels, L4: int, leaf_w: int, xp):
    """16-ary view over the same binary levels: (Iw + Lw, max(96, 10*leaf_w)).

    leaf_rows4 (L4, 40) reshapes contiguously into (Lw, 10*leaf_w); 16-ary
    interior level k's children are binary level 4(k+1) below the root."""
    N = L4 * 4
    Lw = N // leaf_w
    n_bin = int(np.log2(L4)) if L4 > 1 else 0
    W = max(96, 10 * leaf_w)
    leaf_rows = leaf_rows4.reshape(Lw, 10 * leaf_w)
    if leaf_rows.shape[1] < W:
        leaf_rows = xp.concatenate(
            [leaf_rows, xp.zeros((Lw, W - leaf_rows.shape[1]),
                                 leaf_rows.dtype)], axis=1)
    m = 0
    while 16 ** (m + 1) <= Lw:
        m += 1
    rows = []
    for k in range(m):
        ell = n_bin - 4 * (k + 1)    # levels[ell] holds 16^(k+1) boxes
        lo, hi = levels[ell]
        boxes = xp.concatenate([lo, hi], axis=1)       # (16^(k+1), 6)
        rows.append(boxes.reshape(16 ** k, 96))
    if rows:
        interior = xp.concatenate(rows, axis=0)
        pad = xp.zeros((interior.shape[0], W - 96), interior.dtype)
        interior = xp.concatenate([interior, pad], axis=1)
        return xp.concatenate([interior, leaf_rows], axis=0)
    return leaf_rows


def _wide_leaf_size(L4: int):
    """leaf_w so that Lw = L4*4/leaf_w is a power of 16 (implicit heap)."""
    if L4 < 4:
        return None
    n_bin = int(np.log2(L4))
    if n_bin % 4 == 2:
        return 16
    if n_bin % 4 == 0:
        return 64
    return None


def _leaf_data(sorted_tris, tri_id, L: int, leaf_size: int, xp):
    """Sorted triangles -> (leaf_rows (L, 40), leaf lo/hi (L, 3))."""
    v0 = sorted_tris[:, 0]
    e1 = sorted_tris[:, 1] - v0
    e2 = sorted_tris[:, 2] - v0
    tid = tri_id.astype(sorted_tris.dtype)[:, None]
    tri_rec = xp.concatenate([v0, e1, e2, tid], axis=1)       # (L*K, 10)
    leaf_rows = tri_rec.reshape(L, leaf_size * 10)

    leaf_tris = sorted_tris.reshape(L, leaf_size, 3, 3)
    valid = (tri_id.reshape(L, leaf_size) >= 0)[..., None, None]
    vlo = xp.where(valid, leaf_tris, 1e30).reshape(L, -1, 3).min(1)
    vhi = xp.where(valid, leaf_tris, -1e30).reshape(L, -1, 3).max(1)
    return leaf_rows, vlo.astype(sorted_tris.dtype), \
        vhi.astype(sorted_tris.dtype)


def build_bvh(tri_verts: np.ndarray, leaf_size: int = LEAF_SIZE,
              device_put: bool = True, wide: bool = False) -> BVH:
    """tri_verts: (T, 3, 3) float32 world/object-space triangles.

    T must stay below 2^24: triangle ids ride the f32 node table and larger
    ids are not exactly representable (asserted below).

    wide=True additionally builds the 16-ary table_w view. MEASURED SLOWER on
    TPU for incoherent wavefronts (0.06 vs 0.43 Mrays/s on the 236k-tri stress
    scene, 1M random rays): the per-step VPU work (16 box tests + up to 64
    dense leaf triangle tests + a 63-comparator sorting network, all over every
    lane) swamps the 2.5x gather-count saving. Off by default; kept for
    narrow-wavefront / coherent experiments."""
    assert tri_verts.shape[0] < (1 << 24), \
        "triangle ids are carried as f32; >= 2^24 tris are not representable"
    tri_verts = np.asarray(tri_verts, np.float32)
    T = tri_verts.shape[0]
    assert T > 0, "empty BVH"

    L = 1
    while L * leaf_size < T:
        L *= 4                     # power-of-4 leaf count (4-ary heap)
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
    # fully-empty leaves: inverted box (never hit)
    empty = ~(tri_id.reshape(L, leaf_size) >= 0).any(1)
    vlo[empty] = np.float32(1e30)
    vhi[empty] = np.float32(-1e30)

    levels = _binary_level_boxes(vlo, vhi, np)
    table = _assemble_table(leaf_rows, levels, L, np).astype(np.float32)
    root_lo, root_hi = levels[-1]
    root_box = np.concatenate([root_lo[0], root_hi[0]]).astype(np.float32)

    leaf_w = _wide_leaf_size(L) if wide else None
    arrays = dict(table=table, order=tri_id, root_box=root_box)
    if leaf_w is not None:
        arrays["table_w"] = _assemble_table_wide(
            leaf_rows, levels, L, leaf_w, np).astype(np.float32)
    if device_put:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    return BVH(num_tris=T, **arrays)


def refit_bvh(bvh: BVH, tri_verts) -> BVH:
    """Device-side refit: same topology, new triangle positions.

    tri_verts (T, 3, 3) jnp f32 — the triangles build_bvh was given, moved.
    Recomputes leaf rows + every box level with streaming min/max sweeps (the
    per-frame TLAS-update analogue; ref src/CommonRenderers.cpp:186-250)."""
    L = bvh.num_leaves
    K = bvh.leaf_size
    tri_id = bvh.order
    valid = tri_id >= 0
    st = tri_verts[jnp.maximum(tri_id, 0)]                    # (L*K, 3, 3)
    st = jnp.where(valid[:, None, None], st, jnp.float32(1e30))

    leaf_rows, vlo, vhi = _leaf_data(st, tri_id, L, K, jnp)
    empty = ~(valid.reshape(L, K)).any(1)
    vlo = jnp.where(empty[:, None], jnp.float32(1e30), vlo)
    vhi = jnp.where(empty[:, None], jnp.float32(-1e30), vhi)

    levels = _binary_level_boxes(vlo, vhi, jnp)
    table = _assemble_table(leaf_rows, levels, L, jnp)
    root_lo, root_hi = levels[-1]
    root_box = jnp.concatenate([root_lo[0], root_hi[0]])
    bvh = bvh._replace(table=table, root_box=root_box)
    if bvh.table_w is not None:
        bvh = bvh._replace(table_w=_assemble_table_wide(
            leaf_rows, levels, L, bvh.leaf_w, jnp))
    return bvh


class HitRecord(NamedTuple):
    t: jnp.ndarray        # (R,) f32, INF = miss
    tri: jnp.ndarray      # (R,) i32 ORIGINAL triangle id, -1 = miss
    u: jnp.ndarray        # (R,) f32 barycentric of v1
    v: jnp.ndarray        # (R,) f32 barycentric of v2
    front: jnp.ndarray    # (R,) bool det>0 (front-facing per winding)


def _sort4(keys, vals):
    """4-wide sorting network (5 compare-swaps) on parallel lanes."""
    def cs(i, j):
        swap = keys[i] > keys[j]
        keys[i], keys[j] = (jnp.where(swap, keys[j], keys[i]),
                            jnp.where(swap, keys[i], keys[j]))
        vals[i], vals[j] = (jnp.where(swap, vals[j], vals[i]),
                            jnp.where(swap, vals[i], vals[j]))
    cs(0, 1); cs(2, 3); cs(0, 2); cs(1, 3); cs(1, 2)
    return keys, vals


def _batcher_pairs(n: int):
    """Batcher odd-even mergesort comparator pairs (63 for n=16)."""
    pairs = []

    def merge(lo, m, r):
        step = r * 2
        if step < m:
            merge(lo, m, step)
            merge(lo + r, m, step)
            for i in range(lo + r, lo + m - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, m):
        if m > 1:
            h = m // 2
            sort(lo, h)
            sort(lo + h, h)
            merge(lo, m, 1)

    sort(0, n)
    return pairs


def _sortn(keys, vals, n: int):
    """n-wide sorting network on parallel lanes (Batcher odd-even)."""
    for i, j in _batcher_pairs(n):
        swap = keys[i] > keys[j]
        keys[i], keys[j] = (jnp.where(swap, keys[j], keys[i]),
                            jnp.where(swap, keys[i], keys[j]))
        vals[i], vals[j] = (jnp.where(swap, vals[j], vals[i]),
                            jnp.where(swap, vals[i], vals[j]))
    return keys, vals


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _tri_hit_soa(o3, d3, c, base, t_min, t_max):
    """Möller-Trumbore on component (R,) arrays. c: (40, R) record columns;
    base: column offset of [v0(3), e1(3), e2(3), tid]. TPU note: (R, 3)-shaped
    vector math runs at 3/128 VPU lane occupancy; the SoA form is full-width."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    v0x, v0y, v0z = c[base + 0], c[base + 1], c[base + 2]
    e1x, e1y, e1z = c[base + 3], c[base + 4], c[base + 5]
    e2x, e2y, e2z = c[base + 6], c[base + 7], c[base + 8]
    px, py, pz = _cross(dx, dy, dz, e2x, e2y, e2z)
    det = _dot(e1x, e1y, e1z, px, py, pz)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = _dot(sx, sy, sz, px, py, pz) * inv_det
    qx, qy, qz = _cross(sx, sy, sz, e1x, e1y, e1z)
    v = _dot(dx, dy, dz, qx, qy, qz) * inv_det
    t = _dot(e2x, e2y, e2z, qx, qy, qz) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= -1e-7) & (v >= -1e-7)
           & (u + v <= 1.0 + 1e-7) & (t > t_min) & (t < t_max))
    return t, u, v, hit, det > 0


def _ray_aabb_soa(o3, inv3, c, base, t_max):
    """Slab test on component arrays; c[base:base+6] = lo3, hi3 columns."""
    ox, oy, oz = o3
    ix, iy, iz = inv3
    t0x = (c[base + 0] - ox) * ix
    t0y = (c[base + 1] - oy) * iy
    t0z = (c[base + 2] - oz) * iz
    t1x = (c[base + 3] - ox) * ix
    t1y = (c[base + 4] - oy) * iy
    t1z = (c[base + 5] - oz) * iz
    t_enter = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                      jnp.minimum(t0y, t1y)),
                          jnp.minimum(t0z, t1z))
    t_exit = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
    hit = (t_enter <= t_exit * 1.00000024) & (t_exit > 0.0) & (t_enter < t_max)
    return hit, jnp.maximum(t_enter, 0.0)


def _step(bvh, o3, d3, inv3, t_min, any_hit, leaf_size, I, D, state):
    """One lockstep traversal iteration over the live wavefront."""
    node, sp, live, stack, best_t, best_tri, bu, bv, bf = state
    row = bvh.table[node]                                     # (R, 40) 1 gather
    c = row.T                                                 # (40, R) SoA cols
    is_leaf = node >= I

    # --- leaf: test K triangle records (lanes 0:40) ---
    do_leaf = is_leaf & live
    lt, ltri, lu, lv, lf = best_t, best_tri, bu, bv, bf
    for k in range(leaf_size):
        tid = c[k * 10 + 9]
        t, tu, tv, hit, front = _tri_hit_soa(o3, d3, c, k * 10, t_min, lt)
        hit &= do_leaf & (tid >= 0.0)
        lt = jnp.where(hit, t, lt)
        ltri = jnp.where(hit, tid.astype(jnp.int32), ltri)
        lu = jnp.where(hit, tu, lu)
        lv = jnp.where(hit, tv, lv)
        lf = jnp.where(hit, front, lf)
    best_t, best_tri, bu, bv, bf = lt, ltri, lu, lv, lf

    # --- interior: slab-test all four children from the same row ---
    keys, cidx = [], []
    for ch in range(4):
        h, tc = _ray_aabb_soa(o3, inv3, c, 6 * ch, best_t)
        # empty subtrees store INVERTED boxes (lo > hi); the slab test's
        # per-axis min/max would silently "repair" them, so test explicitly
        h &= ~is_leaf & live & (c[6 * ch] <= c[6 * ch + 3])
        keys.append(jnp.where(h, tc, INF))
        cidx.append(4 * node + 1 + ch)
    if not any_hit:
        keys, cidx = _sort4(keys, cidx)        # near-first visit order
    hitc = [k < INF for k in keys]

    # push children [3], [2], [1] (far to near) so nearer pops first
    lane = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
    for slot in (3, 2, 1):
        pm = hitc[slot]
        stack = jnp.where(pm[:, None] & (lane == sp[:, None]),
                          cidx[slot][:, None], stack)
        sp = sp + pm.astype(jnp.int32)
    descend = hitc[0]

    # pop (leaf processed, or interior with no hit child)
    need_pop = live & (is_leaf | ~descend)
    can_pop = sp > 0
    spm1 = jnp.maximum(sp - 1, 0)
    popped = jnp.sum(jnp.where(lane == spm1[:, None], stack, 0), axis=1)
    node = jnp.where(descend & ~is_leaf, cidx[0],
                     jnp.where(need_pop & can_pop, popped, node))
    sp = jnp.where(need_pop & can_pop, spm1, sp)
    live = live & ~(need_pop & ~can_pop)
    if any_hit:
        live = live & ~(best_tri >= 0)
    return node, sp, live, stack, best_t, best_tri, bu, bv, bf


def _step_wide(table_w, I, leaf_w, o3, d3, inv3, t_min, any_hit, D, state):
    """One lockstep iteration over the 16-ary wide table (ONE row gather for
    16 child boxes or leaf_w triangles — the gather-count optimization)."""
    node, sp, live, stack, best_t, best_tri, bu, bv, bf = state
    row = table_w[node]                                       # 1 gather
    c = row.T
    is_leaf = node >= I

    do_leaf = is_leaf & live
    for k in range(leaf_w):
        tid = c[k * 10 + 9]
        t, tu, tv, hit, front = _tri_hit_soa(o3, d3, c, k * 10, t_min, best_t)
        hit &= do_leaf & (tid >= 0.0)
        best_t = jnp.where(hit, t, best_t)
        best_tri = jnp.where(hit, tid.astype(jnp.int32), best_tri)
        bu = jnp.where(hit, tu, bu)
        bv = jnp.where(hit, tv, bv)
        bf = jnp.where(hit, front, bf)

    keys, cidx = [], []
    for ch in range(16):
        h, tc = _ray_aabb_soa(o3, inv3, c, 6 * ch, best_t)
        h &= ~is_leaf & live & (c[6 * ch] <= c[6 * ch + 3])
        keys.append(jnp.where(h, tc, INF))
        cidx.append(16 * node + 1 + ch)
    if not any_hit:
        keys, cidx = _sortn(keys, cidx, 16)   # near-first visit order
    hitc = [k < INF for k in keys]

    lane = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
    for slot in range(15, 0, -1):             # far to near
        pm = hitc[slot]
        stack = jnp.where(pm[:, None] & (lane == sp[:, None]),
                          cidx[slot][:, None], stack)
        sp = sp + pm.astype(jnp.int32)
    descend = hitc[0]

    need_pop = live & (is_leaf | ~descend)
    can_pop = sp > 0
    spm1 = jnp.maximum(sp - 1, 0)
    popped = jnp.sum(jnp.where(lane == spm1[:, None], stack, 0), axis=1)
    node = jnp.where(descend & ~is_leaf, cidx[0],
                     jnp.where(need_pop & can_pop, popped, node))
    sp = jnp.where(need_pop & can_pop, spm1, sp)
    live = live & ~(need_pop & ~can_pop)
    if any_hit:
        live = live & ~(best_tri >= 0)
    return node, sp, live, stack, best_t, best_tri, bu, bv, bf


# wide-table phases: depth is ~half the 4-ary tree's, so step budgets shrink
# accordingly (measured live fractions drain ~2x faster per step)
PHASES_W = ((12, 1 / 2), (24, 1 / 16), (80, 1 / 32), (400, None))


def _traverse(bvh: BVH, o, d, t_min, t_max, any_hit: bool,
              max_steps: int = None):
    """Phased wavefront traversal (see module docstring)."""
    R = o.shape[0]
    L = bvh.num_leaves
    I = bvh.n_interior
    leaf_size = bvh.leaf_size
    D = 3 * bvh.depth + 2
    wide = bvh.table_w is not None
    if wide:
        Lw = (bvh.order.shape[0]) // bvh.leaf_w
        I_w = (Lw - 1) // 15
        depth_w = max(1, int(round(np.log2(max(Lw, 2)) / 4)))
        D = 15 * depth_w + 2
    if t_max is None:
        t_max = jnp.full((R,), INF)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    inv_d = safe_inv_dir(d)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    root = jnp.zeros(R, jnp.int32)          # node 0 (leaf if L == 1 => I == 0)
    state = (root, jnp.zeros(R, jnp.int32), jnp.ones(R, bool),
             jnp.zeros((R, D), jnp.int32),
             t_max, jnp.full(R, -1, jnp.int32),
             jnp.zeros(R), jnp.zeros(R), jnp.zeros(R, bool))

    def run(state, o, d, inv_d, t_min, steps):
        o3 = (o[:, 0], o[:, 1], o[:, 2])
        d3 = (d[:, 0], d[:, 1], d[:, 2])
        inv3 = (inv_d[:, 0], inv_d[:, 1], inv_d[:, 2])

        def cond(c):
            s, i = c
            return s[2].any() & (i < steps)

        def body(c):
            s, i = c
            if wide:
                return (_step_wide(bvh.table_w, I_w, bvh.leaf_w, o3, d3, inv3,
                                   t_min, any_hit, D, s), i + 1)
            return (_step(bvh, o3, d3, inv3, t_min, any_hit, leaf_size,
                          I, D, s), i + 1)

        s, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
        return s

    # compaction only pays for itself on real wavefronts: below ~16k lanes the
    # extra while_loop dispatches + argsorts cost more than the tail they save
    # (GI's half-rate grids sit at ~65k lanes and measurably need the phases)
    PH = PHASES_W if wide else PHASES
    total_steps = max_steps if max_steps is not None else \
        sum(s for s, _ in PH)
    if R < 16384:
        phases = [(total_steps, None)]
    else:
        phases = []
        left = total_steps
        for steps, keep in PH:
            phases.append((min(steps, left), keep if left > steps else None))
            left -= min(steps, left)
            if left <= 0:
                break

    # final results live at the original ray indices; each phase scatters its
    # lanes' best-so-far back (finished and unfinished alike; survivors of the
    # compaction overwrite later with their final values)
    out_t = t_max
    out_tri = jnp.full(R, -1, jnp.int32)
    out_u = jnp.zeros(R)
    out_v = jnp.zeros(R)
    out_f = jnp.zeros(R, bool)
    ridx = jnp.arange(R, dtype=jnp.int32)

    for steps, keep in phases:
        state = run(state, o, d, inv_d, t_min, steps)
        node, sp, live, stack, best_t, best_tri, bu, bv, bf = state
        out_t = out_t.at[ridx].set(best_t)
        out_tri = out_tri.at[ridx].set(best_tri)
        out_u = out_u.at[ridx].set(bu)
        out_v = out_v.at[ridx].set(bv)
        out_f = out_f.at[ridx].set(bf)
        if keep is None:
            break
        Rk = max(int(round(R * keep)), 128) if R > 128 else R
        if Rk >= o.shape[0]:
            continue
        sel = jnp.argsort(~live)[:Rk]       # live lanes first, stable
        node, sp, stack = node[sel], sp[sel], stack[sel]
        live = live[sel]
        best_t, best_tri = best_t[sel], best_tri[sel]
        bu, bv, bf = bu[sel], bv[sel], bf[sel]
        o, d, inv_d, t_min = o[sel], d[sel], inv_d[sel], t_min[sel]
        ridx = ridx[sel]
        state = (node, sp, live, stack, best_t, best_tri, bu, bv, bf)

    return out_t, out_tri, out_u, out_v, out_f


def bvh_closest_hit(bvh: BVH, o, d, t_min=1e-4, t_max=None,
                    max_steps: int = None) -> HitRecord:
    """Closest-hit traversal. o, d: (R, 3)."""
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


