"""Fused ReSTIR DI initial-candidate kernel (Pallas).

Reference: RTXDI GenerateInitialSamples (src/RTXDIRenderer.cpp:2105) — per
pixel, draw N presampled light candidates, evaluate the target function
p-hat = luminance(BRDF * incident radiance), and keep one via streaming RIS.

The XLA formulation costs ~16 ms per candidate at 1080p: every stage round-
trips (H, W, 18) candidate rows and a dozen (R,) temporaries through HBM.
This kernel fuses the WHOLE stage: each program covers an (8 rows x 128 px)
block, DMAs the 8 scanline presample chunks (one (18, 128) slab per row,
slots on the lane axis) into VMEM once, and runs all N candidates —
counter RNG, polymorphic light evaluation (analytic + emissive triangle),
GGX BRDF p-hat, reservoir update — entirely in registers. Candidate c of the
pixel at segment rank r reads slot (r + 17c) % 128, realized as a lane roll
(ops/restir.py draws the same slots, so the two paths agree statistically).

HBM traffic: one 9 KB chunk per scanline-segment + the G-buffer planes in,
the selected reservoir state out. Zero per-pixel gathers, zero temporaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8          # scanlines per program (one f32 sublane tile)
SEG = 128         # pixels per segment == presample tile slots (lane width)
CH = 18           # packed light row channels: row(16) + inv_pdf + id

_LUM = (0.2126, 0.7152, 0.0722)
_MIN_ROUGH = 0.03
_F0 = 0.04


def _pcg3d(x, y, z):
    """pcg3d (Jarzynski & Olano) on three uint32 arrays (utils/rng.pcg3d,
    componentwise so it stays in VPU registers)."""
    x = x * jnp.uint32(1664525) + jnp.uint32(1013904223)
    y = y * jnp.uint32(1664525) + jnp.uint32(1013904223)
    z = z * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


def _u01(bits):
    # Mosaic has no uint32->f32 cast: use the TOP 24 bits via int32 (always
    # positive, exact in f32). Differs from utils.rng.uniform_from_bits by
    # < 2^-24 — below any take/uv decision granularity that matters.
    return ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(5.960464477539063e-08))


def _kernel(tsel_ref, meta_ref, cam_ref, flat_ref,
            px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref,
            ar_ref, ag_ref, ab_ref, rg_ref, mt_ref, va_ref,
            y_ref, u_ref, v_ref, w_ref, row_ref,
            tilebuf, sem, *, num_candidates: int, nseg: int, w_log: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # ---- fetch the 8 scanline chunks (slots on lanes) -------------------
    for r in range(ROWS):
        tid = tsel_ref[(i * ROWS + r) * nseg + j]
        pltpu.make_async_copy(flat_ref.at[tid], tilebuf.at[r],
                              sem.at[r]).start()

    frame = meta_ref[0, 0].astype(jnp.uint32)
    y0 = meta_ref[0, 1]
    cx, cy, cz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]

    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
    ar, ag, ab = ar_ref[:], ag_ref[:], ab_ref[:]
    rough = jnp.clip(rg_ref[:], _MIN_ROUGH, 1.0)
    metal = mt_ref[:]
    valid = va_ref[:] > 0.5

    # view vector
    tvx, tvy, tvz = cx - px, cy - py, cz - pz
    vn = jax.lax.rsqrt(jnp.maximum(tvx * tvx + tvy * tvy + tvz * tvz, 1e-12))
    vx, vy, vz = tvx * vn, tvy * vn, tvz * vn
    ndv = jnp.maximum(nx * vx + ny * vy + nz * vz, 1e-5)

    # BRDF constants per pixel
    alpha = rough * rough
    a2 = alpha * alpha
    inv_m = 1.0 - metal
    dr, dg, db = ar * inv_m, ag * inv_m, ab * inv_m          # diffuse
    f0r = _F0 * inv_m + ar * metal
    f0g = _F0 * inv_m + ag * metal
    f0b = _F0 * inv_m + ab * metal

    # global pixel id for the counter RNG (matches ops/restir.py)
    gy = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, SEG), 0)
          + i * ROWS + y0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, SEG), 1) + j * SEG
    pix = (gy * w_log + gx).astype(jnp.uint32)

    for r in range(ROWS):
        pltpu.make_async_copy(flat_ref.at[0], tilebuf.at[r], sem.at[r]).wait()

    # reservoir registers
    ry = jnp.full((ROWS, SEG), -1.0)
    ru = jnp.zeros((ROWS, SEG))
    rv = jnp.zeros((ROWS, SEG))
    w_sum = jnp.zeros((ROWS, SEG))
    rrow = [jnp.zeros((ROWS, SEG)) for _ in range(16)]

    for c in range(num_candidates):
        sh = (17 * c) % SEG
        ch = [tilebuf[:, k, :] if sh == 0 else
              pltpu.roll(tilebuf[:, k, :], shift=SEG - sh, axis=1)
              for k in range(CH)]

        b0, b1, b2 = _pcg3d(pix, jnp.broadcast_to(frame, pix.shape),
                            jnp.full_like(pix, 100 + c))
        u_r, u_u, u_v = _u01(b0), _u01(b1), _u01(b2)

        lid = ch[17]
        inv_pdf = ch[16]
        is_em = ch[13] > 0.5
        is_dir = (ch[0] < 0.5) & ~is_em
        is_spot = (ch[0] > 1.5) & ~is_em

        # ---- analytic light (type, pos, dir, color, range, cone) --------
        tlx = jnp.where(is_dir, -ch[4], ch[1] - px)
        tly = jnp.where(is_dir, -ch[5], ch[2] - py)
        tlz = jnp.where(is_dir, -ch[6], ch[3] - pz)
        d2a = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-16)
        inv_da = jax.lax.rsqrt(d2a)
        lax_, lay, laz = tlx * inv_da, tly * inv_da, tlz * inv_da
        dist_a = d2a * inv_da
        xr = jnp.clip(dist_a / jnp.maximum(ch[10], 1e-4), 0.0, 1.0)
        fall = 1.0 - xr * xr * xr * xr
        fall = jnp.clip(fall * fall, 0.0, 1.0)
        atten = jnp.where(is_dir, 1.0, fall / jnp.maximum(d2a, 1e-4))
        cd = -(lax_ * ch[4] + lay * ch[5] + laz * ch[6])
        spot = jnp.clip((cd - ch[12]) / jnp.maximum(ch[11] - ch[12], 1e-4),
                        0.0, 1.0)
        atten = jnp.where(is_spot, atten * spot * spot, atten)
        rra, rga, rba = ch[7] * atten, ch[8] * atten, ch[9] * atten

        # ---- emissive triangle (v0, e1, e2, radiance) --------------------
        over = (u_u + u_v) > 1.0
        uu = jnp.where(over, 1.0 - u_u, u_u)
        vv = jnp.where(over, 1.0 - u_v, u_v)
        plx = ch[1] + uu * ch[4] + vv * ch[7] - px
        ply = ch[2] + uu * ch[5] + vv * ch[8] - py
        plz = ch[3] + uu * ch[6] + vv * ch[9] - pz
        d2e = jnp.maximum(plx * plx + ply * ply + plz * plz, 1e-8)
        inv_de = jax.lax.rsqrt(d2e)
        lex, ley, lez = plx * inv_de, ply * inv_de, plz * inv_de
        cxn = ch[5] * ch[9] - ch[6] * ch[8]        # e1 x e2
        cyn = ch[6] * ch[7] - ch[4] * ch[9]
        czn = ch[8] * ch[4] - ch[5] * ch[7]
        n2 = cxn * cxn + cyn * cyn + czn * czn
        inv_n = jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
        area = 0.5 * n2 * inv_n
        cos_l = jnp.abs((cxn * lex + cyn * ley + czn * lez) * inv_n)
        ge = cos_l * area / d2e
        rre, rge, rbe = ch[10] * ge, ch[11] * ge, ch[12] * ge

        Lx = jnp.where(is_em, lex, lax_)
        Ly = jnp.where(is_em, ley, lay)
        Lz = jnp.where(is_em, lez, laz)
        rr = jnp.where(is_em, rre, rra)
        rg2 = jnp.where(is_em, rge, rga)
        rb = jnp.where(is_em, rbe, rba)

        # ---- GGX BRDF * NdotL p-hat --------------------------------------
        hx, hy, hz = vx + Lx, vy + Ly, vz + Lz
        hn = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-12))
        hx, hy, hz = hx * hn, hy * hn, hz * hn
        ndl = jnp.maximum(nx * Lx + ny * Ly + nz * Lz, 0.0)
        ndh = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
        vdh = jnp.maximum(vx * hx + vy * hy + vz * hz, 0.0)
        dterm = ndh * ndh * (a2 - 1.0) + 1.0
        D = a2 / jnp.maximum(3.14159265 * dterm * dterm, 1e-8)
        gv = ndl * jnp.sqrt(jnp.maximum(ndv * ndv * (1 - a2) + a2, 1e-8))
        gl = ndv * jnp.sqrt(jnp.maximum(ndl * ndl * (1 - a2) + a2, 1e-8))
        Vis = 0.5 / jnp.maximum(gv + gl, 1e-8)
        fr5 = jnp.clip(1.0 - vdh, 0.0, 1.0)
        fr5 = fr5 * fr5 * fr5 * fr5 * fr5
        DV = D * Vis
        INV_PI = 1.0 / 3.14159265

        def shade(f0c, dc, radc):
            F = f0c + (1.0 - f0c) * fr5
            return ((1.0 - F) * dc * INV_PI + DV * F) * ndl * radc

        ph = (_LUM[0] * shade(f0r, dr, rr) + _LUM[1] * shade(f0g, dg, rg2)
              + _LUM[2] * shade(f0b, db, rb))
        ph = jnp.where(valid & (lid >= 0.0), ph, 0.0)

        # ---- streaming RIS update ----------------------------------------
        w_c = ph * inv_pdf
        w_sum = w_sum + w_c
        take = (u_r * jnp.maximum(w_sum, 1e-20)) < w_c
        ry = jnp.where(take, lid, ry)
        ru = jnp.where(take, u_u, ru)
        rv = jnp.where(take, u_v, rv)
        for k in range(16):
            rrow[k] = jnp.where(take, ch[k], rrow[k])

    y_ref[:] = ry
    u_ref[:] = ru
    v_ref[:] = rv
    w_ref[:] = w_sum
    for k in range(16):
        row_ref[:, k, :] = rrow[k]


@functools.partial(jax.jit, static_argnames=("num_candidates", "w_log",
                                             "interpret"))
def restir_candidates(flat3, tsel, planes, cam3, frame, y0,
                      num_candidates: int = 8, w_log: int = None,
                      interpret: bool = False):
    """Run the fused candidate stage.

    flat3 (T, 18, 128) f32 presample tiles (channel-major slots); tsel
    (Hp // 8 * nseg * 8,)-flattenable (Hp, nseg) i32 tile choice per
    (scanline, segment); planes: 12 (Hp, Wp) f32 arrays [px py pz nx ny nz
    ar ag ab rough metal valid]; cam3 (3,) f32; frame/y0 scalars; w_log the
    LOGICAL render width used for pixel ids (ops/restir.py contract).

    Returns (y f32 (Hp, Wp) selected id (-1 none), u, v, w_sum (Hp, Wp),
    row (Hp, 16, Wp))."""
    assert w_log and w_log > 0, \
        "w_log (logical width) is required: the counter RNG keys pixels as gy*w_log+gx, and 0 would correlate every scanline"
    Hp, Wp = planes[0].shape
    nseg = Wp // SEG
    assert Hp % ROWS == 0 and Wp % SEG == 0
    meta = jnp.stack([jnp.asarray(frame).astype(jnp.int32),
                      jnp.asarray(y0).astype(jnp.int32),
                      jnp.int32(0), jnp.int32(0)]).reshape(1, 4)
    cam = jnp.concatenate([jnp.asarray(cam3, jnp.float32).reshape(3),
                           jnp.zeros(1)]).reshape(1, 4)
    kern = functools.partial(_kernel, num_candidates=num_candidates,
                             nseg=nseg, w_log=w_log)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hp // ROWS, nseg),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [pl.BlockSpec((ROWS, SEG), lambda i, j, *_: (i, j),
                          memory_space=pltpu.VMEM)] * 12,
        out_specs=[
            pl.BlockSpec((ROWS, SEG), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)] * 4 + [
            pl.BlockSpec((ROWS, 16, SEG), lambda i, j, *_: (i, 0, j),
                         memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((ROWS, CH, SEG), jnp.float32),
            pltpu.SemaphoreType.DMA((ROWS,)),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, 16, Wp), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(tsel.reshape(-1), meta, cam, flat3, *planes)
    return outs
