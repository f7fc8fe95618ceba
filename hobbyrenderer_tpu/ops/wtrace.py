"""Pallas bvh16 traversal: the WHOLE walk on-chip.

Reference capability: RayQuery closest/any-hit traversal
(src/shaders/RaytracingCommon.hlsli:138-199) — free random access on RT
cores. The r3 TPU substrate (ops/bvh16.py) walks the 16-ary implicit heap in
XLA lockstep steps; per-step attribution on TPU (scripts/diag_steps16.py,
528k-tri stress scene) shows the fetches are NOT the cost:

    R=262k   raw leaf-row gather   ~2.8 ms   (94 Mrows/s)
             XLA interior step     ~4.6 ms   (one-hot through HBM)
             XLA leaf step        ~15   ms   (gather is 1/5th of it)

Everything else is XLA overhead: the (Ip, R) one-hot materializing through
HBM, (K, R)/(16, R) intermediates round-tripping, multi-kernel launches per
step. This kernel keeps all of it in VMEM/registers:

- the conservative bf16 interior-box table (96, Ip) — 860 KB at 528k tris —
  is VMEM-resident for the kernel's entire run (constant block index);
- blocks of RB=2048 rays are VMEM-resident; every iteration either
  * INTERIOR step: 8 one-hot (96, Ip) x (Ip, 128) MXU matmuls fetch all 16
    child boxes per lane (the one-hots never exist anywhere but VMEM), then
    slab tests + nearest-first descend/bitmask-trail pop as (8, 128) VPU ops;
  * LEAF step: every at-leaf lane's 512 B leaf row arrives by per-lane async
    DMA from the row-major leaf table (lane indices staged VMEM->SMEM, one
    scalar issue loop), then per-sublane (128, 128) transposes lay the rows
    out lane-major for the 12 dense Möller-Trumbore tests, then the pop;
  chosen by the same live-lane census as ops/bvh16._traverse16_mxu
  (LEAF_FRAC_NUM) — node-visit decisions are IDENTICAL to the XLA walk,
  so results agree exactly (tests/test_wtrace.py).
- a block exits its while-loop as soon as all its lanes are done.

The XLA driver only phases the wavefront (the ops/bvh16 compaction schedule)
and recomputes u/v/front once per ray after traversal."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hobbyrenderer_tpu.ops.bvh import HitRecord
from hobbyrenderer_tpu.ops.bvh16 import BVH16, PHASES16_MXU
from hobbyrenderer_tpu.ops.intersect import INF

RB = 2048          # rays per block: (16, 128) lanes — larger blocks amortize
#                    the per-iteration fixed costs (census reductions,
#                    while-loop control, leaf index staging) over 2x lanes
SUB, LANE = RB // 128, 128
LEAF_FRAC_NUM = 2  # census: leaf step when leaves >= 1/2 of live (TPU sweep winner)
DMA_UNROLL = 8     # scalar issue/drain loop unroll (TPU sweep winner)
NQ = 8             # DMA semaphore stripes for the leaf-row fetches (neutral
#                    in the r5 measurement — kept for the bulk-wait structure)
WIN = 1            # leaf rows fetched per descriptor. The r5 step census pins
#                    the leaf step at ~60 us ~= RB x ~29 ns of scalar
#                    descriptor issue (drain removal, DMA striping, packed MT
#                    and int-overlap were ALL neutral). WIN>1 fetches a
#                    window of following sibling leaves per descriptor and
#                    multi-clears their trail bits (safe: a pruned box cannot
#                    contain a valid hit and best_t culls the rest; exact
#                    agreement measured 1.0000 at WIN=4) — but WIN=4 was
#                    ALSO speed-neutral on the 528k-tri stress scene (visited
#                    siblings are rarely within +3 ids), so it defaults off;
#                    the mechanism stays for fatter-leaf builds where
#                    clustering is denser.
BIG = 3.0e38


def _wtrace_kernel(rays_ref, cur_ref, mask_ref, live_ref, bt_ref, btri_ref,
                   int_ref, leaf_hbm,
                   cur_o, mask_o, live_o, bt_o, btri_o, steps_o,
                   idx_vmem, idx_smem, leafbuf, stage_vmem, dsem, ssem,
                   *, I: int, Ip: int, M: int, K: int, any_hit: bool,
                   max_iters: int, leaf_frac: int = LEAF_FRAC_NUM,
                   unroll: int = DMA_UNROLL):
    """One ray block. rays_ref (1, 8, SUB, 128): planes [ox oy oz dx dy dz
    tmin unused]; cur/live/btri (1, SUB, 128) i32; mask (1, M, SUB, 128);
    bt (1, SUB, 128) f32. int_ref (96, Ip) bf16 VMEM; leaf_hbm (L, 128) f32.

    Census-triggered iterations are COMBINED steps: the at-leaf lanes' row
    DMAs are issued first (one scalar loop), the interior lanes' one-hot
    matmul step runs while those DMAs fly, then ONE bulk semaphore wait
    drains all of them and the leaf triangle tests run. Versus the r4
    either/or schedule this (a) hides the DMA flight time under MXU work,
    (b) advances interior lanes during leaf iterations (fewer total
    iterations), and (c) replaces the per-copy drain loop (RB scalar
    iterations) with a single wait. The scalar ISSUE loop stays at census
    cadence — the r4 measured dead end (issue every iteration, reverted
    commit 473d976) is not reintroduced."""
    L = leaf_hbm.shape[0]
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    tmin = rays_ref[0, 6]
    # EXACTLY ops/intersect.safe_inv_dir — identical box hit/miss decisions
    inv = lambda v: jnp.where(jnp.abs(v) > 1e-12, 1.0 / v,
                              jnp.where(v >= 0, 1e12, -1e12))
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    cur_o[0] = cur_ref[0]
    mask_o[0] = mask_ref[0]
    live_o[0] = live_ref[0]
    bt_o[0] = bt_ref[0]
    btri_o[0] = btri_ref[0]

    def level_of(cur):
        lvl = jnp.zeros_like(cur)
        th = 1
        for _ in range(M):
            lvl = lvl + (cur >= th).astype(jnp.int32)
            th = th * 16 + 1
        return lvl

    def counts():
        cur = cur_o[0]
        live = live_o[0] > 0
        n_leaf = jnp.sum((live & (cur >= I)).astype(jnp.int32))
        n_int = jnp.sum((live & (cur >= 0) & (cur < I)).astype(jnp.int32))
        return n_leaf, n_int

    def trail_pop(cur, lvl, need_pop, descend, near):
        """Shared descend/pop (exactly ops/bvh16._pop16) on the output refs."""
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
        cur_o[0] = jnp.where(descend, 16 * cur + 1 + near,
                             jnp.where(pop, 16 * a_k + 1 + cbit,
                                       jnp.where(need_pop, -1, cur)))
        live_o[0] = jnp.where(need_pop & ~has_pend, 0, live_o[0])

    def int_step():
        cur = cur_o[0]
        live = live_o[0] > 0
        bt = bt_o[0]
        do = live & (cur >= 0) & (cur < I)
        lvl = level_of(cur)
        idx = jnp.where(do, cur, -1)
        bits_rows = []
        near_rows = []
        hasint_rows = []
        for g in range(SUB):
            idx_g = idx[g]
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
                tc = jnp.where(bhit, jnp.maximum(t_en, 0.0), BIG)
                near_g = jnp.argmin(tc, axis=0).astype(jnp.int32)
                has_g = jnp.min(tc, axis=0) < BIG
            bits_rows.append(bits_g)
            near_rows.append(near_g)
            # i32, not bool: Mosaic can't bitcast stacked i1 vregs
            hasint_rows.append(has_g.astype(jnp.int32))
        bits = jnp.stack(bits_rows, 0)                        # (8, 128)
        near = jnp.stack(near_rows, 0)
        has_int = jnp.stack(hasint_rows, 0) > 0
        bits = bits & ~jnp.where(has_int, 1 << near, 0)

        descend = do & has_int
        for k in range(M):
            at_k = (lvl == k) & descend
            mask_o[0, k] = jnp.where(at_k, bits, mask_o[0, k])
        trail_pop(cur, lvl, do & ~has_int, descend, near)
        return jnp.int32(0)

    def leaf_issue():
        """Snapshot the at-leaf lane set and fire their row DMAs."""
        cur = cur_o[0]
        live = live_o[0] > 0
        do = live & (cur >= I)
        # the snapshot matters: the interior step running while these DMAs
        # fly may descend interior lanes INTO leaves — those lanes have no
        # row in flight and must wait for the next census
        stage_vmem[...] = do.astype(jnp.int32)
        WN = min(WIN, L)
        # stage lane -> leaf-row indices into SMEM for the scalar issue loop.
        # EVERY lane issues a DMA (non-leaf lanes fetch row 0 — masked out by
        # the snapshot below). MEASURED r5: a pl.when-conditional issue
        # (skip dead lanes, ~5/6 of the block) ran 1.4x SLOWER than this
        # branch-free loop — per-lane scalar branches cost more than the
        # skipped descriptor setups, with the drain as a single bulk wait
        # either way. Branch-free stays.
        idx_vmem[...] = jnp.clip(jnp.where(do, cur - I, 0), 0, L - WN)
        cp = pltpu.make_async_copy(idx_vmem, idx_smem, ssem)
        cp.start()
        cp.wait()

        def issue(j, n):
            r = j * unroll
            for u in range(unroll):
                rr = r + u
                pltpu.make_async_copy(
                    leaf_hbm.at[pl.ds(idx_smem[rr // LANE, rr % LANE], WN)],
                    leafbuf.at[rr], dsem.at[rr % NQ]).start()
            return n

        jax.lax.fori_loop(0, RB // unroll, issue, jnp.int32(0))
        return jnp.int32(0)

    def leaf_finish():
        # ONE bulk wait per stripe: the DMA semaphore counts bytes, so a
        # wait sized as that stripe's share of the destination drains every
        # per-row copy issued on it (the r4 kernel's per-copy drain loop was
        # RB more scalar iterations for the same barrier). rr % NQ striping
        # keeps each stripe's share exactly RB/NQ rows (RB % NQ == 0).
        for q in range(NQ):
            pltpu.make_async_copy(leafbuf.at[pl.ds(0, RB // NQ)],
                                  leafbuf.at[pl.ds(0, RB // NQ)],
                                  dsem.at[q]).wait()

        WN = min(WIN, L)
        cur = cur_o[0]
        do = stage_vmem[...] > 0
        lvl = level_of(cur)
        bt = bt_o[0]
        btri = btri_o[0]
        bt_rows = []
        tri_rows = []
        krow = jax.lax.broadcasted_iota(jnp.int32, (K, LANE), 0)
        for s in range(SUB):
          # running best across the WN window rows: strict-< keeps the
          # FIRST minimal hit in w order = ascending sibling id order =
          # exactly the XLA walk's visit order
          cur_bt = bt[s][None]                                # (1, 128)
          cur_tri = btri[s][None].astype(jnp.float32)
          do_s = do[s][None]                                  # (1, 128)
          oxs, oys, ozs = ox[s][None], oy[s][None], oz[s][None]
          dxs, dys, dzs = dx[s][None], dy[s][None], dz[s][None]
          for w in range(WN):
            chunk = leafbuf[pl.ds(s * LANE, LANE), w, :]      # (128, 128)
            T = jnp.transpose(chunk)                          # cols -> lanes
            # SUBLANE-PACKED Moller-Trumbore: all K triangle records stacked
            # as (K, 128) arrays, so the ~45-op test runs once over 2-vreg
            # tiles instead of K times over (1, 128) rows — argmin picks the
            # same first-minimal k the sequential strict-< scan did
            stk = lambda j: jnp.stack([T[10 * k + j] for k in range(K)])
            v0x, v0y, v0z = stk(0), stk(1), stk(2)            # (K, 128)
            e1x, e1y, e1z = stk(3), stk(4), stk(5)
            e2x, e2y, e2z = stk(6), stk(7), stk(8)
            tid = stk(9)
            px = dys * e2z - dzs * e2y
            py = dzs * e2x - dxs * e2z
            pz = dxs * e2y - dys * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            sx, sy, sz = oxs - v0x, oys - v0y, ozs - v0z
            uu = (sx * px + sy * py + sz * pz) * inv_det
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = (dxs * qx + dys * qy + dzs * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            thit = ((jnp.abs(det) > 1e-12) & (uu >= -1e-7)
                    & (vv >= -1e-7) & (uu + vv <= 1.0 + 1e-7)
                    & (tt > tmin[s][None]) & (tt < cur_bt)
                    & (tid >= 0.0) & do_s)                    # (K, 128)
            tc = jnp.where(thit, tt, BIG)
            kbest = jnp.argmin(tc, axis=0).astype(jnp.int32)  # (128,) first
            tmin_leaf = jnp.min(tc, axis=0)[None]             # (1, 128)
            tid_b = jnp.sum(jnp.where(krow == kbest[None], tid, 0.0),
                            axis=0)[None]                     # (1, 128)
            lhit = tmin_leaf < cur_bt
            cur_bt = jnp.where(lhit, tmin_leaf, cur_bt)
            cur_tri = jnp.where(lhit, tid_b, cur_tri)
          bt_rows.append(cur_bt[0])
          tri_rows.append(cur_tri[0])
        bt_o[0] = jnp.stack(bt_rows, 0)
        btri_o[0] = jnp.round(jnp.stack(tri_rows, 0)).astype(jnp.int32)

        # multi-clear: every pending SIBLING leaf inside the fetched window
        # was fully tested above — drop its trail bit so the walk never
        # re-fetches it (this is the descriptor-count lever: one WIN-row DMA
        # retires up to WIN leaf visits)
        if WN > 1:
            wstart = jnp.clip(cur - I, 0, L - WN)             # staged rows
            par = (cur - 1) >> 4
            base_c = (I + wstart) - (16 * par + 1)            # child of row 0
            clear = jnp.zeros_like(cur)
            for j in range(WN):
                cj = base_c + j
                okj = (cj >= 0) & (cj < 16)
                clear = clear | jnp.where(okj,
                                          1 << jnp.clip(cj, 0, 15), 0)
            mask_o[0, M - 1] = jnp.where(do, mask_o[0, M - 1] & ~clear,
                                         mask_o[0, M - 1])

        near0 = jnp.zeros((SUB, LANE), jnp.int32)
        trail_pop(cur, lvl, do, jnp.zeros((SUB, LANE), bool), near0)
        if any_hit:
            live_o[0] = jnp.where(btri_o[0] >= 0, 0, live_o[0])
        return jnp.int32(0)

    def combined_step(n_int):
        leaf_issue()
        # interior lanes advance while the leaf-row DMAs are in flight —
        # the matmul step never touches leafbuf or the staged lane set
        jax.lax.cond(n_int > 0, int_step, lambda: jnp.int32(0))
        return leaf_finish()

    def cond(c):
        i, n_work, _ = c
        return (n_work > 0) & (i < max_iters)

    def body(c):
        i, _, n_leafsteps = c
        n_leaf, n_int = counts()
        do_leaf = (leaf_frac * n_leaf >= n_leaf + n_int) | (n_int == 0)
        jax.lax.cond(do_leaf, lambda: combined_step(n_int), int_step)
        nl, ni = counts()
        return i + 1, nl + ni, n_leafsteps + do_leaf.astype(jnp.int32)

    n_leaf0, n_int0 = counts()
    it, _, nls = jax.lax.while_loop(
        cond, body, (jnp.int32(0), n_leaf0 + n_int0, jnp.int32(0)))
    # per-block schedule observability: [iterations, census leaf steps]
    # (iota masks, not .at[].set — Mosaic has no scatter)
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    steps_o[0] = jnp.where((row == 0) & (col == 0), it,
                           jnp.where((row == 0) & (col == 1), nls, 0))


@functools.partial(jax.jit,
                   static_argnames=("I", "Ip", "M", "K", "any_hit",
                                    "max_iters", "interpret", "leaf_frac",
                                    "unroll"))
def wtrace_phase(rays, cur, mask, live, bt, btri, int_bf, leaf_rw, *,
                 I, Ip, M, K, any_hit, max_iters, interpret=False,
                 leaf_frac=None, unroll=None):
    """Run up to max_iters census-scheduled steps on every block.

    rays (G, 8, SUB, 128); cur/live/btri (G, SUB, 128) i32;
    mask (G, M, SUB, 128); bt (G, SUB, 128) f32, SUB = RB/128.
    Returns (cur, mask, live, bt, btri, steps) where steps (G, SUB, LANE)
    carries [iterations, census leaf steps] in lanes [0,0]/[0,1]."""
    G = rays.shape[0]
    L = leaf_rw.shape[0]
    kern = functools.partial(_wtrace_kernel, I=I, Ip=Ip, M=M, K=K,
                             any_hit=any_hit, max_iters=max_iters,
                             leaf_frac=(LEAF_FRAC_NUM if leaf_frac is None
                                        else leaf_frac),
                             unroll=(DMA_UNROLL if unroll is None
                                     else unroll))
    blk3 = pl.BlockSpec((1, SUB, LANE), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, SUB, LANE), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            blk3,
            pl.BlockSpec((1, M, SUB, LANE), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            blk3, blk3, blk3,
            # constant index map: Mosaic fetches the table once, not per block
            pl.BlockSpec((96, Ip), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # leaf rows stay in HBM
        ],
        out_specs=[
            blk3,
            pl.BlockSpec((1, M, SUB, LANE), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            blk3, blk3, blk3, blk3,
        ],
        scratch_shapes=[
            pltpu.VMEM((SUB, LANE), jnp.int32),       # idx staging
            pltpu.SMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((RB, min(WIN, L), LANE), jnp.float32),  # leaf rows
            pltpu.VMEM((SUB, LANE), jnp.int32),       # staged at-leaf set
            pltpu.SemaphoreType.DMA((NQ,)),           # leaf-row DMA stripes
            pltpu.SemaphoreType.DMA(()),              # idx VMEM->SMEM
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((G, SUB, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((G, M, SUB, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((G, SUB, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((G, SUB, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((G, SUB, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((G, SUB, LANE), jnp.int32)),
        interpret=interpret,
    )(rays, cur, mask, live, bt, btri, int_bf, leaf_rw)


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
                max_steps: int = None, interpret: bool = False):
    """Phased driver: the ops/bvh16 compaction schedule around the kernel."""
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

    total = max_steps if max_steps is not None else \
        sum(s for s, _ in PHASES16_MXU)
    if R < 16384:
        phases = [(total, None)]
    else:
        phases = []
        left = total
        for steps, keep in PHASES16_MXU:
            phases.append((min(steps, left), keep if left > steps else None))
            left -= min(steps, left)
            if left <= 0:
                break

    out_t = t_max
    out_tri = jnp.full(R, -1, jnp.int32)
    ridx = jnp.arange(R, dtype=jnp.int32)
    int_bf = bvh.int_bf
    leaf_rw = bvh.leaf_rw

    o_p, d_p, t_min_p = o, d, t_min
    state = (jnp.zeros(R, jnp.int32), jnp.zeros((R, M), jnp.int32),
             jnp.ones(R, bool), t_max, jnp.full(R, -1, jnp.int32))
    for steps, keep in phases:
        cur, mask, live, best_t, best_tri = state
        Rc = o_p.shape[0]
        rays, G, Rp = _pack_blocks(o_p, d_p, t_min_p, Rc)

        def blk(v, fill=0):
            vp = jnp.pad(v, ((0, Rp - Rc),) + ((0, 0),) * (v.ndim - 1),
                         constant_values=fill)
            return vp.reshape((G, SUB, LANE) + v.shape[1:])

        def unblk(vb):
            return vb.reshape((Rp,) + vb.shape[3:])[:Rc]

        cb, maskb, liveb, btb, btrib, _steps = wtrace_phase(
            rays, blk(cur), blk(mask).transpose(0, 3, 1, 2),
            blk(live.astype(jnp.int32)), blk(best_t), blk(best_tri, -1),
            int_bf, leaf_rw, I=I, Ip=Ip, M=M, K=K, any_hit=any_hit,
            max_iters=steps, interpret=interpret,
            leaf_frac=LEAF_FRAC_NUM, unroll=DMA_UNROLL)
        cur = unblk(cb)
        mask = unblk(maskb.transpose(0, 2, 3, 1))
        live = unblk(liveb) > 0
        best_t = unblk(btb)
        best_tri = unblk(btrib)
        state = (cur, mask, live, best_t, best_tri)

        out_t = out_t.at[ridx].set(best_t)
        out_tri = out_tri.at[ridx].set(best_tri)
        if keep is None:
            break
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
                       max_steps: int = None,
                       interpret: bool = False) -> HitRecord:
    """Closest-hit via the on-chip Pallas walk. API mirrors
    ops/bvh16.bvh16_closest_hit; u/v/front recomputed once post-traversal."""
    best_t, best_tri = _traverse_w(bvh, o, d, t_min, t_max, any_hit=False,
                                   max_steps=max_steps, interpret=interpret)
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
                   max_steps: int = None, interpret: bool = False):
    best_t, best_tri = _traverse_w(bvh, o, d, t_min, t_max, any_hit=True,
                                   max_steps=max_steps, interpret=interpret)
    limit = t_max if t_max is not None else INF
    return (best_tri >= 0) & (best_t < limit)
