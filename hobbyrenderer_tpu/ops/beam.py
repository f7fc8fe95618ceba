"""Beam (tile-packet) BVH occlusion: coherent shadow rays at TPU speed.

Reference: the per-pixel any-hit RayQuery shadow rays of
src/shaders/ShadowMask.hlsl / RaytracingCommon.hlsli — free random access on
GPU RT cores, hostile on TPU where one 1080p per-ray node gather costs ~45 ms
and a full traversal needs dozens of them (ops/bvh.py measures ~0.5 Mrays/s).

TPU-first redesign: rays from one 32x32 screen tile are traversed TOGETHER as
a BEAM. The kernel walks the 4-wide BVH ONCE per tile with scalar control
flow, testing each node's child boxes against a conservative interval bound of
the whole beam (origin AABB x direction AABB interval arithmetic); each node
row is ONE DMA shared by all 1024 rays — amortizing the per-row fetch 1024x.
Reached leaves are Möller-Trumbore-tested densely on the VPU against every
lane. Conservative beam-box false positives only add triangle tests; per-ray
hit tests are exact. Early-out: once every active lane is occluded the whole
tile stops (the any-hit analogue, strongest exactly where shadows are dense).

Coherence is the contract: sun-shadow beams (shared direction, compact origin
footprint) traverse a near-minimal node set; incoherent wavefronts (GI bounce
rays) should keep using ops/bvh.py.

Table layout (derived from ops.bvh.BVH, padded to 128 lanes for Mosaic DMA
alignment): interior rows lanes 0:24 = 4 child AABBs (lo3|hi3); leaf rows =
4 triangle records of 16 lanes [v0(3) e1(3) e2(3) tid pad(6)]."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32
PIX = TILE * TILE
NBUF = 8          # DMA pipeline depth (node rows in flight)
FCAP = 2048      # frontier capacity (nodes per BFS level)
BIG = 3.0e37


def beam_table(table) -> jnp.ndarray:
    """ops.bvh.BVH.table (I+L, 40) -> beam layout (I+L, 128) (np or jnp).

    Interior rows: first 24 lanes already are the 4 child boxes. Leaf rows:
    (40,) = 4 tris x 10 -> 4 x 16-lane records so the kernel reads each
    triangle at a fixed 16-lane stride."""
    xp = jnp if isinstance(table, jnp.ndarray) else __import__("numpy")
    n, w = table.shape
    assert w == 40, "beam_table expects 4-wide unified rows"
    I = (((3 * n + 1) // 4) - 1) // 3
    tris = table.reshape(n, 4, 10)
    pad6 = xp.zeros((n, 4, 6), table.dtype)
    leaf64 = xp.concatenate([tris, pad6], -1).reshape(n, 64)
    interior64 = xp.concatenate(
        [table[:, :24], xp.zeros((n, 40), table.dtype)], -1)
    # one row per node: rows < I carry the 4 child boxes, rows >= I the 4
    # triangle records; lane 127 is a LEAF MARKER so the kernel's vector
    # phase can mask leaf rows without any scalar id lookups
    is_leaf = (xp.arange(n) >= I)[:, None]
    body = xp.where(is_leaf, leaf64, interior64)
    pad = xp.zeros((n, 63), table.dtype)
    marker = is_leaf.astype(table.dtype)
    return xp.concatenate([body, pad, marker], -1).astype(
        jnp.float32 if xp is jnp else "float32")


def _beam_kernel(rays_ref, table_hbm, occ_ref, ovf_ref, nodebuf, sem,
                 frontier, occ_acc, ovf_s, *, I: int, N: int,
                 profile: str = ""):
    """One program per tile. rays_ref (1, 8, PIX): rows ox oy oz dx dy dz
    tmax act; occ_ref (1, 8, 128) f32 out (1 = occluded); ovf_ref (1, 8, 128)
    f32 out (nonzero = the tile's BFS frontier overflowed FCAP and subtrees
    were dropped — occlusion may be UNDER-reported; callers surface this).

    profile: '' normal; 'noleaf' skip leaf MT; 'nobox' treat every box as
    missed after the root (traversal machinery + DMA only) — perf attribution
    knobs, not for rendering."""
    if profile == "empty":
        occ_ref[:] = jnp.zeros((1, 8, 128), jnp.float32)
        ovf_ref[:] = jnp.zeros((1, 8, 128), jnp.float32)
        return
    rays = rays_ref[0]
    ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]          # (1, PIX)
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    tmax = rays[6:7]
    act = rays[7:8] > 0.5

    # ---- scalar beam bounds -------------------------------------------
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
    t_hi = jnp.max(jnp.where(act, tmax, 0.0))
    any_act = jnp.any(act)

    # inverse-direction intervals; axis unconstrained when dir spans 0
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

    # ---- grouped vector phases (no per-node scalar VMEM reads) ----------
    # Nodes are processed in groups of GW = 8: their rows sit in one
    # (8, 128) buffer, so box tests and leaf Möller-Trumbore run as (8, ·)
    # VPU column ops. Box results leave the vector domain as ONE exact f32
    # bitmask reduce per 4 rows (4 child bits x 4 rows = 16 bits < 2^24).
    GW = 8
    rowi = jax.lax.broadcasted_iota(jnp.int32, (GW, 1), 0)
    wlow = jnp.where(rowi < 4, jnp.exp2(4.0 * rowi.astype(jnp.float32)), 0.0)
    whigh = jnp.where(rowi >= 4,
                      jnp.exp2(4.0 * (rowi - 4).astype(jnp.float32)), 0.0)

    def group_phase(buf, rem):
        """Vector work for one 8-node group: returns (bits_lo, bits_hi)
        scalar child-hit masks (4 bits per row), ORs leaf hits into occ."""
        B = nodebuf[buf]                                   # (8, 128)
        rowok = rowi < rem
        isleaf = (B[:, 127:128] > 0.5) & rowok

        bits = jnp.zeros((GW, 1), jnp.float32)
        if profile != "nobox":
            for ch in range(4):
                base = 6 * ch
                t_en = jnp.zeros((GW, 1), jnp.float32)
                t_ex = jnp.full((GW, 1), t_hi)
                ok = jnp.ones((GW, 1), jnp.bool_)
                for a in range(3):
                    blo = B[:, base + a:base + a + 1]      # (8, 1)
                    bhi = B[:, base + 3 + a:base + 4 + a]
                    ok &= blo <= bhi    # inverted box = empty subtree
                    p_lo = blo - ohi[a]
                    p_hi = bhi - olo[a]
                    c1, c2 = p_lo * ilo[a], p_lo * ihi[a]
                    c3, c4 = p_hi * ilo[a], p_hi * ihi[a]
                    lo4 = jnp.minimum(jnp.minimum(c1, c2),
                                      jnp.minimum(c3, c4))
                    hi4 = jnp.maximum(jnp.maximum(c1, c2),
                                      jnp.maximum(c3, c4))
                    t_en = jnp.where(ivalid[a], jnp.maximum(t_en, lo4), t_en)
                    t_ex = jnp.where(ivalid[a], jnp.minimum(t_ex, hi4), t_ex)
                    # dir spans 0 on this axis: the conservative reachable
                    # interval over t in [0, t_hi] must overlap the slab (the
                    # origin slab alone is NOT conservative — rays still
                    # travel into the box; that cull lost shadows around
                    # local lights whose winner rays flip sign across a tile)
                    reach_lo = olo[a] + jnp.minimum(dlo[a], 0.0) * t_hi
                    reach_hi = ohi[a] + jnp.maximum(dhi[a], 0.0) * t_hi
                    o_overlap = (reach_hi >= blo) & (reach_lo <= bhi)
                    ok &= ivalid[a] | o_overlap
                hit = (ok & (t_en <= t_ex) & (t_ex > 0.0)
                       & rowok & ~isleaf)
                bits = bits + jnp.where(hit, float(1 << ch), 0.0)
        bits_lo = jnp.sum(bits * wlow)
        bits_hi = jnp.sum(bits * whigh)

        if profile != "noleaf":
            any_leaf = jnp.max(jnp.where(isleaf, 1.0, 0.0)) > 0.5

            @pl.when(any_leaf)
            def _():
                hits = jnp.zeros((GW, PIX), jnp.float32)
                for k in range(4):
                    b = 16 * k
                    v0x, v0y, v0z = (B[:, b:b + 1], B[:, b + 1:b + 2],
                                     B[:, b + 2:b + 3])
                    e1x, e1y, e1z = (B[:, b + 3:b + 4], B[:, b + 4:b + 5],
                                     B[:, b + 5:b + 6])
                    e2x, e2y, e2z = (B[:, b + 6:b + 7], B[:, b + 7:b + 8],
                                     B[:, b + 8:b + 9])
                    tid = B[:, b + 9:b + 10]
                    px = dy * e2z - dz * e2y              # (8, PIX)
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
                           & (t > 1e-4) & (t < tmax)
                           & (tid >= 0.0) & isleaf)
                    hits = jnp.where(hit, 1.0, hits)
                occ_acc[:] = jnp.maximum(
                    occ_acc[:], jnp.max(hits, axis=0, keepdims=True))
        return bits_lo, bits_hi

    def traverse():
        occ_acc[:] = jnp.zeros((1, PIX), jnp.float32)
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
            done = jnp.min(jnp.where(act, occ_acc[:], 1.0)) > 0.5
            return (cnt > 0) & ~done

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
                        # append; overflow drops the subtree AND raises the
                        # tile's overflow flag (occlusion under-reported)
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

    @pl.when(any_act & (t_hi > 0.0))
    def _():
        traverse()

    @pl.when(~(any_act & (t_hi > 0.0)))
    def _():
        occ_acc[:] = jnp.zeros((1, PIX), jnp.float32)
        ovf_s[0] = 0

    occ_ref[:] = occ_acc[:].reshape(1, 8, 128)
    ovf_ref[:] = jnp.full((1, 8, 128), ovf_s[0].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret", "profile"))
def beam_any_hit_tiles(btable: jnp.ndarray, rays: jnp.ndarray,
                       interpret: bool = False,
                       profile: str = "") -> jnp.ndarray:
    """rays (T, 8, PIX) f32 [ox oy oz dx dy dz tmax act] -> occluded (T, PIX).

    btable from beam_table(). One kernel program per tile; see module doc."""
    T = rays.shape[0]
    n = btable.shape[0]
    L = (3 * n + 1) // 4
    I = (L - 1) // 3
    kern = functools.partial(_beam_kernel, I=I, N=n, profile=profile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, PIX), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NBUF, 128), jnp.float32),   # double-buffered groups
            pltpu.SemaphoreType.DMA((2, NBUF)),
            pltpu.SMEM((2, FCAP), jnp.int32),   # frontier: scalar stores
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),        # frontier-overflow flag
        ],
    )
    occ, ovf = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((T, 8, 128), jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(rays, btable)
    return occ.reshape(T, PIX), ovf[:, 0, 0]


def pack_rays_tiles(o, d, t_max, active, H: int, W: int):
    """(H, W, 3) origins/dirs + (H, W) t_max/active -> (T, 8, PIX) ray blocks
    in 32x32 tile order (pads the framebuffer up to full tiles)."""
    ty = -(-H // TILE)
    tx = -(-W // TILE)
    Hp, Wp = ty * TILE, tx * TILE

    def padhw(img, fill):
        return jnp.pad(img, ((0, Hp - H), (0, Wp - W)) + ((0, 0),) * (img.ndim - 2),
                       constant_values=fill)

    o = padhw(o, 0.0)
    d = padhw(d, 0.0)
    t_max = padhw(t_max, 0.0)
    active = padhw(active.astype(jnp.float32), 0.0)
    packed = jnp.concatenate([o, d, t_max[..., None], active[..., None]], -1)
    # (Hp, Wp, 8) -> (ty, TILE, tx, TILE, 8) -> (T, 8, PIX)
    packed = packed.reshape(ty, TILE, tx, TILE, 8).transpose(0, 2, 4, 1, 3)
    return packed.reshape(ty * tx, 8, PIX)


def unpack_tiles(img_t, H: int, W: int):
    """(T, PIX) tile-order -> (H, W)."""
    ty = -(-H // TILE)
    tx = -(-W // TILE)
    out = img_t.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3)
    return out.reshape(ty * TILE, tx * TILE)[:H, :W]


def tile_majority_mask(key, H: int, W: int, probes: int = 8,
                       exclude: int | None = None):
    """(H, W) i32 keys -> bool (H, W): lanes matching their 32x32 tile's
    approximate modal key (mode estimated by counting matches of `probes`
    evenly-spaced candidate lanes — exact when the tile holds <= `probes`
    distinct majority runs, which post-ReSTIR-spatial-reuse winner ids do).

    `exclude`: a sentinel key (e.g. -1 = "no winner") that must never be
    elected modal nor matched — without it, a mostly-idle tile elects the
    sentinel and its few REAL winner lanes all fall to the straggler path.

    The beam kernel's cost is driven by each tile's direction CONE: one
    mixed-winner lane widens the cone to the whole light pool and the BFS
    frontier degenerates to a near-full tree sweep (measured 1.46 s for the
    1080p winner-visibility pass vs ~0.1 s coherent). Splitting the modal
    majority (beam) from stragglers (wavefront walk on the compacted few)
    restores the tile coherence the kernel was built for."""
    ty = -(-H // TILE)
    tx = -(-W // TILE)
    Hp, Wp = ty * TILE, tx * TILE
    kp = jnp.pad(key, ((0, Hp - H), (0, Wp - W)),
                 constant_values=-(2 ** 30))
    t = kp.reshape(ty, TILE, tx, TILE).transpose(0, 2, 1, 3) \
        .reshape(ty * tx, PIX)
    step = PIX // probes
    cand = t[:, ::step][:, :probes]                       # (T, P)
    cnt = jnp.sum(t[:, None, :] == cand[:, :, None], -1)  # (T, P)
    if exclude is not None:
        cnt = jnp.where(cand == exclude, -1, cnt)
    rep = jnp.take_along_axis(cand, jnp.argmax(cnt, -1)[:, None], 1)
    m = t == rep
    if exclude is not None:
        m &= rep != exclude
    return unpack_tiles(m.astype(jnp.float32), H, W) > 0.5


def beam_any_hit(btable, o, d, t_max, active, H: int, W: int,
                 interpret: bool = False, return_overflow: bool = False):
    """Convenience: (H, W) image-space any-hit occlusion via tile beams.

    return_overflow=True additionally returns the number of tiles whose BFS
    frontier overflowed (their occlusion may be under-reported)."""
    rays = pack_rays_tiles(o, d, t_max, active, H, W)
    occ, ovf = beam_any_hit_tiles(btable, rays, interpret=interpret)
    res = unpack_tiles(occ, H, W) > 0.5
    if return_overflow:
        return res, jnp.sum(ovf > 0.5).astype(jnp.int32)
    return res
