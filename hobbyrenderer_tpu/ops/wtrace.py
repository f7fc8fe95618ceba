"""Pallas interior-advance kernel for bvh16: incoherent rays past the
XLA-step overhead wall.

Reference capability: RayQuery closest/any-hit traversal
(src/shaders/RaytracingCommon.hlsli:138-199) — free random access on RT
cores. The r3 TPU substrate (ops/bvh16.py) walks a 16-ary implicit heap in
XLA lockstep steps; profiling shows the per-step cost is NOT the leaf-row
gather (~15%) but everything around it: the (Ip, R) one-hot for the interior
MXU fetch materializes through HBM (hundreds of MB/step), and every step is
several XLA kernel launches round-tripping (R,)-state through HBM.

This kernel keeps the WHOLE interior walk on-chip:

- the conservative bf16 interior-box table (96, Ip) — 860 KB for a 528k-tri
  scene — lives in VMEM for the kernel's entire run (constant block index);
- blocks of RB=1024 rays are resident in VMEM/registers; each in-kernel
  iteration fetches all 16 child boxes of every lane's node with 8 one-hot
  (96, Ip) x (Ip, 128) MXU matmuls whose one-hots never exist in HBM;
- descend/pop bookkeeping (nearest-first + per-level bitmask trail, exactly
  ops/bvh16._step16_int) runs as (8, 128) VPU ops with zero HBM traffic;
- a block exits as soon as none of its lanes has interior work left.

Leaf rows stay OUT of the kernel (hybrid): the XLA driver alternates
  [Pallas: advance every live lane to its next leaf]  ->
  [XLA ops/bvh16._step16_leaf: ONE row gather + 12 dense triangle tests+pop]
so the only remaining HBM random access runs at the measured gather rate
with every fetch useful. Node-visit decisions are IDENTICAL to
_traverse16_mxu's (same conservative boxes, same nearest-first/pop rules),
so results match ops/bvh16 exactly (see tests/test_wtrace.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hobbyrenderer_tpu.ops.bvh import HitRecord
from hobbyrenderer_tpu.ops.bvh16 import BVH16, _step16_leaf
from hobbyrenderer_tpu.ops.intersect import INF, safe_inv_dir

RB = 1024          # rays per block: (8, 128) lanes
SUB, LANE = 8, 128

# phased compaction in ROUNDS (one round = advance-to-leaf + one leaf step);
# a ray visits ~3-4 leaves (mean) on the stress scene, stragglers more
PHASES_W = ((5, 1 / 2), (5, 1 / 8), (8, 1 / 32), (48, None))


def _advance_kernel(rays_ref, cur_ref, mask_ref, live_ref, bt_ref,
                    int_ref, cur_o, mask_o, live_o,
                    *, I: int, Ip: int, M: int, any_hit: bool,
                    max_iters: int):
    """Advance every live lane to its next leaf (or trail exhaustion).

    rays_ref (1, 8, 8, 128): planes [ox oy oz dx dy dz tmin unused];
    cur/live (1, 8, 128) i32; mask (1, M, 8, 128) i32; bt (1, 8, 128) f32;
    int_ref (96, Ip) bf16 — VMEM-resident interior boxes."""
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    # EXACTLY ops/intersect.safe_inv_dir — identical box hit/miss decisions
    # to the XLA walk are required for the exact-agreement contract
    inv = lambda v: jnp.where(jnp.abs(v) > 1e-12, 1.0 / v,
                              jnp.where(v >= 0, 1e12, -1e12))
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    cur_o[0] = cur_ref[0]
    mask_o[0] = mask_ref[0]
    live_o[0] = live_ref[0]
    bt = bt_ref[0]

    def level_of(cur):
        lvl = jnp.zeros_like(cur)
        th = 1
        for _ in range(M):
            lvl = lvl + (cur >= th).astype(jnp.int32)
            th = th * 16 + 1
        return lvl

    def n_interior():
        cur = cur_o[0]
        live = live_o[0] > 0
        do = live & (cur >= 0) & (cur < I)
        return jnp.sum(do.astype(jnp.int32))

    def cond(c):
        i, n_int = c
        return (n_int > 0) & (i < max_iters)

    def body(c):
        i, _ = c
        cur = cur_o[0]                       # (8, 128) i32
        live = live_o[0] > 0
        do = live & (cur >= 0) & (cur < I)
        lvl = level_of(cur)
        idx = jnp.where(do, cur, -1)

        # ---- 16 child boxes via one-hot MXU fetch, per 128-lane group ----
        bits_rows = []
        near_rows = []
        hasint_rows = []
        for g in range(SUB):
            idx_g = idx[g]                                   # (128,)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (Ip, LANE), 0)
                  == idx_g[None, :]).astype(jnp.bfloat16)
            cols = jax.lax.dot_general(int_ref[...], oh,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            box = cols.reshape(16, 6, LANE)
            lox, loy, loz = box[:, 0], box[:, 1], box[:, 2]
            hix, hiy, hiz = box[:, 3], box[:, 4], box[:, 5]
            oxg, oyg, ozg = ox[g][None], oy[g][None], oz[g][None]
            ixg, iyg, izg = ix[g][None], iy[g][None], iz[g][None]
            t0x, t1x = (lox - oxg) * ixg, (hix - oxg) * ixg
            t0y, t1y = (loy - oyg) * iyg, (hiy - oyg) * iyg
            t0z, t1z = (loz - ozg) * izg, (hiz - ozg) * izg
            t_en = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            t_ex = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            bhit = ((t_en <= t_ex * 1.00000024) & (t_ex > 0.0)
                    & (t_en < bt[g][None]) & (lox <= hix)
                    & do[g][None])                            # (16, 128)
            chw = (1 << jnp.arange(16, dtype=jnp.int32))[:, None]
            bits_g = jnp.sum(jnp.where(bhit, chw, 0), axis=0)  # (128,)
            if any_hit:
                lsb = bits_g & -bits_g
                near_g = jax.lax.population_count(
                    jnp.maximum(lsb, 1).astype(jnp.uint32) - 1) \
                    .astype(jnp.int32)
                has_g = bits_g != 0
            else:
                big = 3.0e38    # python literal (device consts can't be captured)
                tc = jnp.where(bhit, jnp.maximum(t_en, 0.0), big)
                near_g = jnp.argmin(tc, axis=0).astype(jnp.int32)
                best = jnp.min(tc, axis=0)
                has_g = best < big
            bits_rows.append(bits_g)
            near_rows.append(near_g)
            hasint_rows.append(has_g)
        bits = jnp.stack(bits_rows, 0)                        # (8, 128)
        near = jnp.stack(near_rows, 0)
        has_int = jnp.stack(hasint_rows, 0)
        bits = bits & ~jnp.where(has_int, 1 << near, 0)

        descend = do & has_int
        # write pending children at this level
        for k in range(M):
            at_k = (lvl == k) & descend
            mask_o[0, k] = jnp.where(at_k, bits, mask_o[0, k])

        # ---- pop: deepest pending level (only for interior lanes that
        # found nothing; leaf lanes WAIT for the XLA leaf step) ----
        need_pop = do & ~has_int
        kstar = jnp.full_like(cur, -1)
        m_k = jnp.zeros_like(cur)
        for k in range(M):
            mk = mask_o[0, k]
            sel = mk != 0
            kstar = jnp.where(sel, k, kstar)
            m_k = jnp.where(sel, mk, m_k)
        has_pend = kstar >= 0
        a_k = cur
        steps_up = lvl - kstar
        for _ in range(M):
            a_k = jnp.where(steps_up > 0, (a_k - 1) >> 4, a_k)
            steps_up = steps_up - 1
        lsb = m_k & -m_k
        cbit = jax.lax.population_count(
            jnp.maximum(lsb, 1).astype(jnp.uint32) - 1).astype(jnp.int32)
        for k in range(M):
            sel_k = (kstar == k) & need_pop
            mask_o[0, k] = jnp.where(sel_k, mask_o[0, k] & ~lsb,
                                     mask_o[0, k])

        pop = need_pop & has_pend
        new_cur = jnp.where(descend, 16 * cur + 1 + near,
                            jnp.where(pop, 16 * a_k + 1 + cbit,
                                      jnp.where(need_pop, -1, cur)))
        cur_o[0] = new_cur
        live_o[0] = jnp.where(need_pop & ~has_pend, 0, live_o[0])
        return i + 1, n_interior()

    jax.lax.while_loop(cond, body, (jnp.int32(0), n_interior()))


@functools.partial(jax.jit,
                   static_argnames=("I", "Ip", "M", "any_hit", "max_iters",
                                    "interpret"))
def advance_to_leaf(rays, cur, mask, live, bt, int_bf, *, I, Ip, M,
                    any_hit, max_iters, interpret=False):
    """rays (G, 8, 8, 128); cur/live (G, 8, 128) i32; mask (G, M, 8, 128);
    bt (G, 8, 128) f32; int_bf (96, Ip) bf16. Returns (cur, mask, live)."""
    G = rays.shape[0]
    kern = functools.partial(_advance_kernel, I=I, Ip=Ip, M=M,
                             any_hit=any_hit, max_iters=max_iters)
    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, SUB, LANE), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, SUB, LANE), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant index map: Mosaic fetches the table once, not per block
            pl.BlockSpec((96, Ip), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, SUB, LANE), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((G, SUB, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((G, M, SUB, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((G, SUB, LANE), jnp.int32)),
        interpret=interpret,
    )(rays, cur, mask, live, bt, int_bf)


def _pack_blocks(o, d, t_min, R):
    """(R, 3) rays -> (G, 8, 8, 128) plane-packed blocks (pad lanes dead)."""
    Rp = -(-R // RB) * RB
    G = Rp // RB

    def pad1(v):
        return jnp.pad(v, (0, Rp - R))

    planes = [pad1(o[:, 0]), pad1(o[:, 1]), pad1(o[:, 2]),
              pad1(d[:, 0]), pad1(d[:, 1]), pad1(d[:, 2]),
              pad1(t_min), jnp.zeros(Rp, jnp.float32)]
    rays = jnp.stack([p.reshape(G, SUB, LANE) for p in planes], 1)
    return rays, G, Rp


def _traverse_w(bvh: BVH16, o, d, t_min, t_max, any_hit: bool,
                max_rounds: int = None, interpret: bool = False):
    """Hybrid rounds: Pallas advance-to-leaf + XLA leaf step, with phased
    live-lane compaction between rounds (same scheme as ops/bvh16)."""
    R = o.shape[0]
    I = bvh.n_interior
    M = max(bvh.depth, 1)
    K = bvh.leaf_size
    Ip = bvh.int_bf.shape[1]
    if t_max is None:
        t_max = jnp.full((R,), INF)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))

    total = max_rounds if max_rounds is not None else \
        sum(s for s, _ in PHASES_W)
    if R < 16384:
        phases = [(total, None)]
    else:
        phases = []
        left = total
        for steps, keep in PHASES_W:
            phases.append((min(steps, left), keep if left > steps else None))
            left -= min(steps, left)
            if left <= 0:
                break

    out_t = t_max
    out_tri = jnp.full(R, -1, jnp.int32)
    ridx = jnp.arange(R, dtype=jnp.int32)
    state = None
    int_bf = bvh.int_bf

    def run_phase(o_p, d_p, t_min_p, state, rounds):
        Rc = o_p.shape[0]
        rays, G, Rp = _pack_blocks(o_p, d_p, t_min_p, Rc)

        def blk(v, fill=0):
            vp = jnp.pad(v, ((0, Rp - Rc),) + ((0, 0),) * (v.ndim - 1),
                         constant_values=fill)
            return vp.reshape((G, SUB, LANE) + v.shape[1:])

        def unblk(vb):
            return vb.reshape((Rp,) + vb.shape[3:])[:Rc]

        cur, mask, live, best_t, best_tri = state
        o3 = (o_p[:, 0], o_p[:, 1], o_p[:, 2])
        d3 = (d_p[:, 0], d_p[:, 1], d_p[:, 2])

        def round_body(c):
            r, cur, mask, live, best_t, best_tri = c
            cb, maskb, liveb = advance_to_leaf(
                rays, blk(cur), blk(mask).transpose(0, 3, 1, 2),
                blk(live.astype(jnp.int32)), blk(best_t),
                int_bf, I=I, Ip=Ip, M=M, any_hit=any_hit,
                max_iters=4 * M + 8, interpret=interpret)
            cur = unblk(cb)
            mask = unblk(maskb.transpose(0, 2, 3, 1))
            live = unblk(liveb) > 0
            # one leaf step: gather + 12 triangle tests + trail pop
            s2 = _step16_leaf(bvh.table, I, M, K, o3, d3, t_min_p,
                              any_hit, (cur, mask, live, best_t, best_tri))
            cur, mask, live, best_t, best_tri = s2
            return r + 1, cur, mask, live, best_t, best_tri

        def round_cond(c):
            r, cur, mask, live, best_t, best_tri = c
            return live.any() & (r < rounds)

        _, cur, mask, live, best_t, best_tri = jax.lax.while_loop(
            round_cond, round_body,
            (jnp.int32(0), cur, mask, live, best_t, best_tri))
        return cur, mask, live, best_t, best_tri

    o_p, d_p, t_min_p = o, d, t_min
    state = (jnp.zeros(R, jnp.int32), jnp.zeros((R, M), jnp.int32),
             jnp.ones(R, bool), t_max, jnp.full(R, -1, jnp.int32))
    for rounds, keep in phases:
        state = run_phase(o_p, d_p, t_min_p, state, rounds)
        cur, mask, live, best_t, best_tri = state
        out_t = out_t.at[ridx].set(best_t)
        out_tri = out_tri.at[ridx].set(best_tri)
        if keep is None:
            break
        Rc = o_p.shape[0]
        Rk = max(int(round(R * keep)), RB) if R > RB else Rc
        if Rk >= Rc:
            continue
        live_i = live.astype(jnp.int32)
        n_live = jnp.sum(live_i)
        rank = jnp.where(live, jnp.cumsum(live_i) - 1,
                         n_live + jnp.cumsum(1 - live_i) - 1)
        sel = jnp.zeros(Rc, jnp.int32).at[rank].set(
            jnp.arange(Rc, dtype=jnp.int32))[:Rk]
        state = (cur[sel], mask[sel], live[sel], best_t[sel], best_tri[sel])
        o_p, d_p, t_min_p = o_p[sel], d_p[sel], t_min_p[sel]
        ridx = ridx[sel]

    return out_t, out_tri


def wtrace_closest_hit(bvh: BVH16, o, d, t_min=1e-4, t_max=None,
                       max_rounds: int = None,
                       interpret: bool = False) -> HitRecord:
    """Closest-hit via the hybrid Pallas/XLA walk. API mirrors
    ops/bvh16.bvh16_closest_hit; u/v/front recomputed once post-traversal."""
    best_t, best_tri = _traverse_w(bvh, o, d, t_min, t_max, any_hit=False,
                                   max_rounds=max_rounds, interpret=interpret)
    miss = best_tri < 0
    rec = bvh.recs[bvh.slot_of[jnp.maximum(best_tri, 0)]]
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


def wtrace_any_hit(bvh: BVH16, o, d, t_min=1e-4, t_max=None,
                   max_rounds: int = None, interpret: bool = False):
    best_t, best_tri = _traverse_w(bvh, o, d, t_min, t_max, any_hit=True,
                                   max_rounds=max_rounds, interpret=interpret)
    limit = t_max if t_max is not None else INF
    return (best_tri >= 0) & (best_t < limit)
