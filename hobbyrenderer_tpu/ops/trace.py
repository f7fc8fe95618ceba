"""Sorted-block CLOSEST-HIT BVH traversal: incoherent rays at TPU speed.

Reference: the closest-hit RayQuery loops of src/shaders/RaytracingCommon.hlsli
(TraceRayStandard) feeding PathTracer.hlsl, the ReSTIR-GI bounce rays and the
DDGI probe rays — free random access on GPU RT cores, hostile on TPU where the
lockstep XLA wavefront (ops/bvh.py) pays one ~10 ns random HBM row gather per
ray per traversal step (~0.5 Mrays/s incoherent).

TPU-first redesign, building on the beam-occlusion kernel (ops/beam.py):

1. SORT FOR COHERENCE (host of the idea: ray-stream reordering; done in XLA):
   incoherent rays are argsorted by a (coarse origin morton << 6 | octahedral
   direction cell) key. Consecutive 1024-ray blocks then share a compact
   origin box and a narrow direction cone — manufactured coherence.
2. BEAM-TRAVERSE EACH BLOCK: one kernel program per block walks the 4-wide
   BVH once with scalar control flow, interval-bound box tests (origin AABB x
   direction AABB over the block), each node row ONE DMA shared by all 1024
   lanes. Reached leaves are Möller-Trumbore-tested densely on the VPU.
3. CLOSEST-HIT ACCUMULATORS: per-lane best (t, tri, u, v, front) in VMEM;
   node culling tightens as hits land — a node whose beam-interval entry
   exceeds the block's current worst accepted t is skipped (the any-hit
   early-out analogue for closest hits).

The sort is O(R log R) in XLA (fast radix path) and the inverse scatter puts
results back in caller order, so the API is a drop-in for bvh_closest_hit.

Block layout matches ops/beam.py: rays (T, 8, PIX) rows [ox oy oz dx dy dz
tmax act]; node table from ops.beam.beam_table (interior rows: 4 child AABBs
in lanes 0:24; leaf rows: 4 x 16-lane triangle records [v0 e1 e2 tid pad])."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hobbyrenderer_tpu.ops.bvh import HitRecord
from hobbyrenderer_tpu.ops.intersect import INF

TILE_PIX = 1024   # rays per block (matches beam.PIX)
PIX = TILE_PIX
NBUF = 8          # DMA pipeline depth (node rows in flight)
FCAP = 4096       # frontier capacity (nodes per BFS level; incoherent blocks
                  # reach more of the tree than screen tiles — 2x beam.FCAP)
BIG = 3.0e37
TMAX_CAP = 1e30   # finite stand-in for "no t_max" (keeps interval math finite)

# incoherent-dispatch choice: the on-chip Pallas walk (ops/wtrace) keeps the
# whole interior traversal on-chip. Env-gated for A/B benching on TPU
# (HR_WTRACE=0 restores the pure-XLA bvh16 walk).
import os as _os
_WTRACE_DEFAULT = _os.environ.get("HR_WTRACE", "1") == "1"


def _use_wtrace(rt) -> bool:
    bvh = getattr(rt, "bvh16", None)
    return (_WTRACE_DEFAULT and bvh is not None and bvh.depth >= 1
            and bvh.int_bf is not None and bvh.leaf_rw is not None)


def _closest_kernel(rays_ref, table_hbm, t_ref, tri_ref, u_ref, v_ref, f_ref,
                    ovf_ref, nodebuf, sem, frontier, bt_acc, btri_acc, bu_acc,
                    bv_acc, bf_acc, ovf_s, *, I: int, N: int, t_min: float):
    """One program per 1024-ray block. rays_ref (1, 8, PIX); outputs
    (1, 8, 128) f32 each: best t (tmax if miss), tri id (-1 miss), u, v,
    front (0/1), overflow flag (frontier overflow => hits may be MISSED —
    callers surface this; same failure contract as beam.py)."""
    rays = rays_ref[0]
    ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]          # (1, PIX)
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    tmax = rays[6:7]
    act = rays[7:8] > 0.5

    # ---- scalar beam bounds over the block's active lanes -----------------
    def rng(v, lo_pad=BIG, hi_pad=-BIG):
        lo = jnp.min(jnp.where(act, v, lo_pad))
        hi = jnp.max(jnp.where(act, v, hi_pad))
        return lo, hi

    olo = [0.0] * 3
    ohi = [0.0] * 3
    dlo = [0.0] * 3
    dhi = [0.0] * 3
    for a, (o_c, d_c) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
        olo[a], ohi[a] = rng(o_c)
        dlo[a], dhi[a] = rng(d_c)
    any_act = jnp.any(act)

    EPS = 1e-8
    ivalid = [None] * 3
    ilo = [None] * 3
    ihi = [None] * 3
    for a in range(3):
        pos = dlo[a] > EPS
        neg = dhi[a] < -EPS
        ivalid[a] = pos | neg
        lo_s = jnp.where(pos, 1.0 / jnp.maximum(dhi[a], EPS),
                         1.0 / jnp.minimum(dlo[a], -EPS))
        hi_s = jnp.where(pos, 1.0 / jnp.maximum(dlo[a], EPS),
                         1.0 / jnp.minimum(dhi[a], -EPS))
        ilo[a] = lo_s
        ihi[a] = hi_s

    GW = 8
    rowi = jax.lax.broadcasted_iota(jnp.int32, (GW, 1), 0)
    wlow = jnp.where(rowi < 4, jnp.exp2(4.0 * rowi.astype(jnp.float32)), 0.0)
    whigh = jnp.where(rowi >= 4,
                      jnp.exp2(4.0 * (rowi - 4).astype(jnp.float32)), 0.0)

    def group_phase(buf, rem):
        """Vector work for one 8-node group: box tests -> scalar child-hit
        bitmasks; leaf rows fold their triangles into the best-hit accs."""
        B = nodebuf[buf]                                   # (8, 128)
        rowok = rowi < rem
        isleaf = (B[:, 127:128] > 0.5) & rowok

        # closest-hit cull bound: the worst accepted t over active lanes —
        # any node the whole beam enters later than this cannot improve
        cur_hi = jnp.max(jnp.where(act, bt_acc[:], 0.0))

        bits = jnp.zeros((GW, 1), jnp.float32)
        for ch in range(4):
            base = 6 * ch
            t_en = jnp.zeros((GW, 1), jnp.float32)
            t_ex = jnp.full((GW, 1), cur_hi)
            ok = jnp.ones((GW, 1), jnp.bool_)
            for a in range(3):
                blo = B[:, base + a:base + a + 1]          # (8, 1)
                bhi = B[:, base + 3 + a:base + 4 + a]
                ok &= blo <= bhi        # inverted box = empty subtree
                p_lo = blo - ohi[a]
                p_hi = bhi - olo[a]
                c1, c2 = p_lo * ilo[a], p_lo * ihi[a]
                c3, c4 = p_hi * ilo[a], p_hi * ihi[a]
                lo4 = jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4))
                hi4 = jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4))
                t_en = jnp.where(ivalid[a], jnp.maximum(t_en, lo4), t_en)
                t_ex = jnp.where(ivalid[a], jnp.minimum(t_ex, hi4), t_ex)
                # dir spans 0 on this axis: conservative reachable interval
                # over t in [0, cur_hi] must overlap the slab (see beam.py)
                reach_lo = olo[a] + jnp.minimum(dlo[a], 0.0) * cur_hi
                reach_hi = ohi[a] + jnp.maximum(dhi[a], 0.0) * cur_hi
                o_overlap = (reach_hi >= blo) & (reach_lo <= bhi)
                ok &= ivalid[a] | o_overlap
            hit = ok & (t_en <= t_ex) & (t_ex > 0.0) & rowok & ~isleaf
            bits = bits + jnp.where(hit, float(1 << ch), 0.0)
        bits_lo = jnp.sum(bits * wlow)
        bits_hi = jnp.sum(bits * whigh)

        any_leaf = jnp.max(jnp.where(isleaf, 1.0, 0.0)) > 0.5

        @pl.when(any_leaf)
        def _():
            for k in range(4):
                b = 16 * k
                v0x, v0y, v0z = (B[:, b:b + 1], B[:, b + 1:b + 2],
                                 B[:, b + 2:b + 3])
                e1x, e1y, e1z = (B[:, b + 3:b + 4], B[:, b + 4:b + 5],
                                 B[:, b + 5:b + 6])
                e2x, e2y, e2z = (B[:, b + 6:b + 7], B[:, b + 7:b + 8],
                                 B[:, b + 8:b + 9])
                tid = B[:, b + 9:b + 10]
                px = dy * e2z - dz * e2y                   # (8, PIX)
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
                u = (sx * px + sy * py + sz * pz) * inv_det
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                hit = ((jnp.abs(det) > 1e-12) & (u >= -1e-7)
                       & (vv >= -1e-7) & (u + vv <= 1.0 + 1e-7)
                       & (t > t_min) & (t < tmax) & (t < bt_acc[:])
                       & (tid >= 0.0) & isleaf & act)
                cand = jnp.where(hit, t, BIG)              # (8, PIX)
                m = jnp.min(cand, axis=0, keepdims=True)   # (1, PIX)
                upd = m < bt_acc[:]
                sel = cand == m                            # argmin rows

                def pick(attr):
                    return jnp.max(jnp.where(sel, attr, -BIG),
                                   axis=0, keepdims=True)

                btri_acc[:] = jnp.where(upd, pick(tid + 0.0 * cand),
                                        btri_acc[:])
                bu_acc[:] = jnp.where(upd, pick(u), bu_acc[:])
                bv_acc[:] = jnp.where(upd, pick(vv), bv_acc[:])
                bf_acc[:] = jnp.where(
                    upd, pick(jnp.where(det > 0, 1.0, 0.0)), bf_acc[:])
                bt_acc[:] = jnp.where(upd, m, bt_acc[:])
        return bits_lo, bits_hi

    def traverse():
        ovf_s[0] = 0
        frontier[0, 0] = 0

        def issue_group(cur, g, cnt, buf):
            for r in range(GW):
                i = g * GW + r

                @pl.when(i < cnt)
                def _():
                    pltpu.make_async_copy(
                        table_hbm.at[frontier[cur, i]],
                        nodebuf.at[buf, r], sem.at[buf, r]).start()

        def wait_group(cur, g, cnt, buf):
            for r in range(GW):
                i = g * GW + r

                @pl.when(i < cnt)
                def _():
                    pltpu.make_async_copy(
                        table_hbm.at[frontier[cur, i]],
                        nodebuf.at[buf, r], sem.at[buf, r]).wait()

        def level_cond(c):
            cur, cnt = c
            return cnt > 0

        def level_body(c):
            cur, cnt = c
            nxt = 1 - cur
            n_groups = (cnt + GW - 1) // GW
            issue_group(cur, 0, cnt, 0)

            def gbody(g, cnt_nxt):
                buf = g % 2

                @pl.when(g + 1 < n_groups)
                def _():
                    issue_group(cur, g + 1, cnt, 1 - buf)

                wait_group(cur, g, cnt, buf)
                rem = jnp.minimum(cnt - g * GW, GW)
                bits_lo, bits_hi = group_phase(buf, rem)
                bl = bits_lo.astype(jnp.int32)
                bh = bits_hi.astype(jnp.int32)
                for r in range(GW):
                    i = g * GW + r
                    nid = frontier[cur, jnp.minimum(i, FCAP - 1)]
                    word = bl if r < 4 else bh
                    for ch in range(4):
                        hit = ((word >> (4 * (r % 4) + ch)) & 1) > 0
                        drop = hit & (cnt_nxt >= FCAP - 1)
                        ovf_s[0] = jnp.where(drop, 1, ovf_s[0])
                        idx = jnp.minimum(cnt_nxt, FCAP - 1)
                        frontier[nxt, idx] = jnp.where(
                            hit, 4 * nid + 1 + ch, frontier[nxt, idx])
                        cnt_nxt = jnp.minimum(
                            cnt_nxt + jnp.where(hit, 1, 0), FCAP - 1)
                return cnt_nxt

            cnt_nxt = jax.lax.fori_loop(0, n_groups, gbody, jnp.int32(0))
            return nxt, cnt_nxt

        jax.lax.while_loop(level_cond, level_body, (jnp.int32(0),
                                                    jnp.int32(1)))

    # accumulator init (misses keep t = tmax, tri = -1)
    bt_acc[:] = tmax
    btri_acc[:] = jnp.full((1, PIX), -1.0)
    bu_acc[:] = jnp.zeros((1, PIX))
    bv_acc[:] = jnp.zeros((1, PIX))
    bf_acc[:] = jnp.zeros((1, PIX))
    ovf_s[0] = 0

    @pl.when(any_act)
    def _():
        traverse()

    t_ref[:] = bt_acc[:].reshape(1, 8, 128)
    tri_ref[:] = btri_acc[:].reshape(1, 8, 128)
    u_ref[:] = bu_acc[:].reshape(1, 8, 128)
    v_ref[:] = bv_acc[:].reshape(1, 8, 128)
    f_ref[:] = bf_acc[:].reshape(1, 8, 128)
    ovf_ref[:] = jnp.full((1, 8, 128), ovf_s[0].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def closest_hit_blocks(btable: jnp.ndarray, rays: jnp.ndarray,
                       t_min: float = 1e-4, interpret: bool = False):
    """rays (T, 8, PIX) f32 [ox oy oz dx dy dz tmax act] -> per-lane closest
    hit: (t, tri, u, v, front, ovf) with shapes (T, PIX) x5 + (T,).
    btable from ops.beam.beam_table."""
    T = rays.shape[0]
    n = btable.shape[0]
    L = (3 * n + 1) // 4
    I = (L - 1) // 3
    kern = functools.partial(_closest_kernel, I=I, N=n, t_min=t_min)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, PIX), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, NBUF, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, NBUF)),
            pltpu.SMEM((2, FCAP), jnp.int32),
            pltpu.VMEM((1, PIX), jnp.float32),   # best t
            pltpu.VMEM((1, PIX), jnp.float32),   # best tri (f32 id)
            pltpu.VMEM((1, PIX), jnp.float32),   # best u
            pltpu.VMEM((1, PIX), jnp.float32),   # best v
            pltpu.VMEM((1, PIX), jnp.float32),   # best front
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((T, 8, 128), jnp.float32)
                        for _ in range(6)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(rays, btable)
    t, tri, u, v, f, ovf = outs
    return (t.reshape(T, PIX), tri.reshape(T, PIX), u.reshape(T, PIX),
            v.reshape(T, PIX), f.reshape(T, PIX), ovf[:, 0, 0])


# ---------------------------------------------------------------------------
# coherence sort + block packing
# ---------------------------------------------------------------------------

def coherence_key(o, d, root_box) -> jnp.ndarray:
    """5D joint morton over (origin xyz, octahedral direction uv), 4 bits per
    dimension, MSB-first interleaved (x y z u v | x y z u v | ...).

    The interleave is the point: ANY consecutive run of sorted keys is tight
    in origin AND direction proportionally to its length — so 1024-ray blocks
    get a compact origin box and a narrow direction cone simultaneously,
    whatever the ray count. (A concatenated origin<<6|dir key degenerates:
    blocks come out origin-tight but direction-unbounded once rays-per-origin-
    cell exceeds the block size.) A stable argsort keeps the caller's screen
    order within equal keys, inheriting its adjacency for free."""
    NB = 4
    lo = root_box[:3]
    inv = 1.0 / jnp.maximum(root_box[3:] - lo, 1e-6)
    q = jnp.clip(((o - lo) * inv * (1 << NB)).astype(jnp.int32),
                 0, (1 << NB) - 1)                                 # (R, 3)
    # octahedral direction coords (NB bits each)
    nrm = jnp.maximum(jnp.abs(d).sum(-1), 1e-12)
    px, py = d[:, 0] / nrm, d[:, 1] / nrm
    fold = d[:, 2] < 0
    fx = jnp.where(fold, (1 - jnp.abs(py)) * jnp.where(px >= 0, 1.0, -1.0), px)
    fy = jnp.where(fold, (1 - jnp.abs(px)) * jnp.where(py >= 0, 1.0, -1.0), py)
    cu = jnp.clip(((fx * 0.5 + 0.5) * (1 << NB)).astype(jnp.int32),
                  0, (1 << NB) - 1)
    cv = jnp.clip(((fy * 0.5 + 0.5) * (1 << NB)).astype(jnp.int32),
                  0, (1 << NB) - 1)
    dims = (q[:, 0], q[:, 1], q[:, 2], cu, cv)
    key = jnp.zeros(o.shape[0], jnp.int32)
    for j in range(NB - 1, -1, -1):              # MSB first
        for c in dims:
            key = (key << 1) | ((c >> j) & 1)
    return key


def pack_rays_sorted(o, d, t_max, active, root_box):
    """Flat rays (R, 3)/(R,) -> (blocks (T, 8, PIX), sort permutation (R,)).

    Rays are stable-sorted by coherence_key; blocks are consecutive runs of
    1024 sorted rays, padded (act=0) up to a full block."""
    R = o.shape[0]
    key = coherence_key(o, d, root_box)
    order = jnp.argsort(key)                          # stable
    T = -(-R // PIX)
    padn = T * PIX - R

    def prep(x, fill):
        x = x[order]
        return jnp.pad(x, ((0, padn),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    o_s, d_s = prep(o, 0.0), prep(d, 0.0)
    t_s = prep(t_max.astype(jnp.float32), 0.0)
    a_s = prep(active.astype(jnp.float32), 0.0)
    comp = jnp.stack([o_s[:, 0], o_s[:, 1], o_s[:, 2],
                      d_s[:, 0], d_s[:, 1], d_s[:, 2], t_s, a_s])  # (8, T*PIX)
    return comp.reshape(8, T, PIX).transpose(1, 0, 2), order


def unpack_sorted(vals, order, R: int):
    """(T, PIX) block results -> (R,) in original caller order."""
    flat = vals.reshape(-1)[:R]
    return jnp.zeros(R, flat.dtype).at[order].set(flat)


def trace_closest(btable, root_box, o, d, t_min: float = 1e-4, t_max=None,
                  active=None, interpret: bool = False,
                  return_overflow: bool = False):
    """Drop-in for ops.bvh.bvh_closest_hit via sorted beam blocks.

    btable: ops.beam.beam_table(bvh.table); root_box: bvh.root_box."""
    R = o.shape[0]
    if t_max is None:
        t_max = jnp.full((R,), TMAX_CAP)
    else:
        t_max = jnp.minimum(
            jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,)), TMAX_CAP)
    if active is None:
        active = jnp.ones((R,), bool)
    rays, order = pack_rays_sorted(o, d, t_max, active, root_box)
    t, tri, u, v, f, ovf = closest_hit_blocks(btable, rays, t_min=t_min,
                                              interpret=interpret)
    tri_o = unpack_sorted(tri, order, R).astype(jnp.int32)
    miss = tri_o < 0
    rec = HitRecord(
        t=jnp.where(miss, INF, unpack_sorted(t, order, R)),
        tri=jnp.where(miss, -1, tri_o),
        u=unpack_sorted(u, order, R),
        v=unpack_sorted(v, order, R),
        front=unpack_sorted(f, order, R) > 0.5)
    if return_overflow:
        return rec, jnp.sum(ovf > 0.5).astype(jnp.int32)
    return rec


def closest_hit_auto(rt, o, d, t_min: float = 1e-4, t_max=None,
                     max_steps=None, active=None, force_kernel: bool = False):
    """Backend dispatch for incoherent closest-hit rays. Drop-in HitRecord.

    TPU: the 16-ary fat-row walk (ops/bvh16) — measured the fastest incoherent
    path by a wide margin (gathers are row-rate-bound; bvh16 needs 6-14 rows
    per ray vs the 4-ary walk's ~40-100 and the sorted-block beam kernel
    cannot cull wide direction cones). force_kernel keeps the sorted-block
    Pallas path testable in interpret mode. CPU: the 4-ary wavefront."""
    from hobbyrenderer_tpu.ops import bvh as bvhops
    if force_kernel and getattr(rt, "btable", None) is not None:
        return trace_closest(
            rt.btable, rt.bvh.root_box, o, d, t_min=t_min, t_max=t_max,
            active=active, interpret=jax.default_backend() != "tpu")
    if getattr(rt, "bvh16", None) is not None \
            and jax.default_backend() == "tpu":
        from hobbyrenderer_tpu.ops import bvh16 as b16ops
        if active is not None:
            # inactive lanes get t_max 0: the root box test fails and they
            # drain in one lockstep step (they report miss, as before)
            R = o.shape[0]
            tm = jnp.full((R,), TMAX_CAP) if t_max is None else \
                jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
            t_max = jnp.where(active, tm, 0.0)
        if _use_wtrace(rt):
            from hobbyrenderer_tpu.ops import wtrace as wtops
            # same iteration-budget conversion as the MXU-split walk
            ms = max(34, int(max_steps * 1.4) // 4) \
                if max_steps is not None else None
            return wtops.wtrace_closest_hit(rt.bvh16, o, d, t_min=t_min,
                                            t_max=t_max, max_steps=ms)
        # the 16-ary tree drains ~4x faster per lockstep step
        ms16 = max(24, max_steps // 4) if max_steps is not None else None
        return b16ops.bvh16_closest_hit(rt.bvh16, o, d, t_min=t_min,
                                        t_max=t_max, max_steps=ms16)
    return bvhops.bvh_closest_hit(rt.bvh, o, d, t_min=t_min, t_max=t_max,
                                  max_steps=max_steps)


def any_hit_auto(rt, o, d, t_max=None, active=None,
                 force_kernel: bool = False, max_steps=None):
    """Backend dispatch for incoherent shadow rays (occluded (R,) bool).

    max_steps: 4-ary-walk step budget (the bvh16 path drains ~4x faster per
    lockstep step and converts accordingly). Callers on the real-time paths
    cap it so one straggler lane cannot spin the phase tail; uncapped
    traversal remains the default for the reference-quality PT path."""
    from hobbyrenderer_tpu.ops import bvh as bvhops
    if force_kernel and getattr(rt, "btable", None) is not None:
        return trace_any_hit(
            rt.btable, rt.bvh.root_box, o, d, t_max=t_max, active=active,
            interpret=jax.default_backend() != "tpu")
    if getattr(rt, "bvh16", None) is not None \
            and jax.default_backend() == "tpu":
        from hobbyrenderer_tpu.ops import bvh16 as b16ops
        if active is not None:
            R = o.shape[0]
            tm = jnp.full((R,), TMAX_CAP) if t_max is None else \
                jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
            t_max = jnp.where(active, tm, 0.0)
        if _use_wtrace(rt):
            from hobbyrenderer_tpu.ops import wtrace as wtops
            ms = max(34, int(max_steps * 1.4) // 4) \
                if max_steps is not None else None
            return wtops.wtrace_any_hit(rt.bvh16, o, d, t_max=t_max,
                                        max_steps=ms)
        ms16 = max(24, max_steps // 4) if max_steps is not None else None
        return b16ops.bvh16_any_hit(rt.bvh16, o, d, t_max=t_max,
                                    max_steps=ms16)
    return bvhops.bvh_any_hit(rt.bvh, o, d, t_max=t_max,
                              max_steps=max_steps)


def trace_any_hit(btable, root_box, o, d, t_max=None, active=None,
                  interpret: bool = False, return_overflow: bool = False):
    """Sorted-block ANY-HIT occlusion for incoherent shadow rays (PT NEE at
    depth, GI sample visibility): same coherence sort, ops.beam kernel."""
    from hobbyrenderer_tpu.ops.beam import beam_any_hit_tiles
    R = o.shape[0]
    if t_max is None:
        t_max = jnp.full((R,), TMAX_CAP)
    else:
        t_max = jnp.minimum(
            jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,)), TMAX_CAP)
    if active is None:
        active = jnp.ones((R,), bool)
    rays, order = pack_rays_sorted(o, d, t_max, active, root_box)
    occ, ovf = beam_any_hit_tiles(btable, rays, interpret=interpret)
    res = unpack_sorted(occ, order, R) > 0.5
    if return_overflow:
        return res, jnp.sum(ovf > 0.5).astype(jnp.int32)
    return res
