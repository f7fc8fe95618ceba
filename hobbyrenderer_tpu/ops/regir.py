"""ReGIR: world-space reservoir grid for localized light presampling.

Reference: the ReGIR layer of RTXDI (src/RTXDIRenderer.cpp:2039-2105 builds
grid-cell reservoirs each frame; initial candidate sampling then draws from
the cell covering the shaded point instead of the global power distribution,
which matters when many local lights exist and the global CDF keeps proposing
far-away ones).

TPU-first shape: the grid IS a presample-tile table. Each cell produces one
(S=128, 18) tile of packed light rows [row(16), W, id] — the exact format
ops/restir.py's candidate stage (and the fused Pallas kernel) already consume
— where W is the cell reservoir's unbiased reciprocal-pdf estimate
(w_sum / (K * p_hat_selected)), playing the role the global tiles give to
1/power_pdf. Cell construction is a K-round streaming RIS over power-CDF
draws with the target p-hat evaluated at the CELL CENTER (unshadowed
radiance), fully vectorized over all (cell, slot) lanes: K gathers of C*S
packed rows, no atomics, no per-cell loops. Pixel->cell lookup replaces the
random tile pick per 128-pixel row segment."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hobbyrenderer_tpu.ops import lights as lightops
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits


class RegirGrid(NamedTuple):
    rows: jnp.ndarray      # (C, S, 18) f32 presample-tile-format cell tables
    lo: jnp.ndarray        # (3,) f32 grid origin (world)
    inv_cell: jnp.ndarray  # (3,) f32 1 / cell size
    dims: tuple            # static (nx, ny, nz)


def _luminance(rgb):
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
            + 0.0722 * rgb[..., 2])


def build_regir_grid(pool, lo, hi, frame, dims=(12, 6, 12), tile_size: int = 128,
                     rounds: int = 4) -> RegirGrid:
    """Per-frame cell reservoirs over the scene AABB [lo, hi].

    dims is static; frame drives the counter RNG so cells re-randomize every
    frame (temporal reuse then averages, as in the reference)."""
    nx, ny, nz = dims
    C = nx * ny * nz
    S = tile_size
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    ext = jnp.maximum(hi - lo, 1e-3)
    cell_sz = ext / jnp.asarray([nx, ny, nz], jnp.float32)

    ci = jnp.arange(C, dtype=jnp.int32)
    cx = ci % nx
    cy = (ci // nx) % ny
    cz = ci // (nx * ny)
    centers = lo + (jnp.stack([cx, cy, cz], -1).astype(jnp.float32) + 0.5) \
        * cell_sz                                          # (C, 3)

    slot = jnp.arange(C * S, dtype=jnp.uint32)
    fr = jnp.asarray(frame).astype(jnp.uint32)
    pos = jnp.repeat(centers, S, axis=0)                   # (C*S, 3)

    N = pool.packed.shape[0]
    y_rows = jnp.zeros((C * S, 16))
    y_id = jnp.full((C * S,), -1.0)
    w_sum = jnp.zeros((C * S,))
    ph_y = jnp.zeros((C * S,))
    frb = jnp.broadcast_to(fr, slot.shape)
    for k in range(rounds):
        bits = pcg3d(jnp.stack([slot, frb, jnp.full_like(slot, 900 + k)], -1))
        u_sel = uniform_from_bits(bits[..., 0])
        u_uv = jnp.stack([uniform_from_bits(bits[..., 1]),
                          uniform_from_bits(bits[..., 2])], -1)
        ids = jnp.clip(jnp.searchsorted(pool.power_cdf, u_sel), 0,
                       pool.power_pdf.shape[0] - 1).astype(jnp.int32)
        inv_pdf = 1.0 / jnp.maximum(pool.power_pdf[ids], 1e-20)
        rows = pool.packed[jnp.clip(ids, 0, N - 1)]
        _, rad, _ = lightops.light_incident_rows(rows, u_uv, pos)
        ph = _luminance(jnp.maximum(rad, 0.0))
        w = jnp.where(pool.n_total > 0, ph * inv_pdf, 0.0)
        w_sum = w_sum + w
        # streaming accept (counter RNG, one more channel)
        u_acc = uniform_from_bits(pcg3d(jnp.stack(
            [slot, frb, jnp.full_like(slot, 950 + k)], -1))[..., 0])
        accept = (w > 0) & (u_acc * jnp.maximum(w_sum, 1e-20) < w)
        y_rows = jnp.where(accept[..., None], rows, y_rows)
        y_id = jnp.where(accept, ids.astype(jnp.float32), y_id)
        ph_y = jnp.where(accept, ph, ph_y)

    W = jnp.where((y_id >= 0) & (ph_y > 0),
                  w_sum / jnp.maximum(rounds * ph_y, 1e-20), 0.0)
    table = jnp.concatenate([y_rows, W[..., None], y_id[..., None]], -1)
    return RegirGrid(rows=table.reshape(C, S, 18), lo=lo,
                     inv_cell=1.0 / cell_sz, dims=dims)


def cells_of_positions(grid: RegirGrid, pos, valid):
    """World positions (..., 3) -> flat cell ids (...,); invalid positions
    clamp to the nearest cell (their candidates are still valid RIS draws)."""
    nx, ny, nz = grid.dims
    q = (pos - grid.lo) * grid.inv_cell
    qi = jnp.clip(q.astype(jnp.int32),
                  jnp.zeros(3, jnp.int32),
                  jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))
    cid = qi[..., 0] + nx * (qi[..., 1] + ny * qi[..., 2])
    return jnp.where(valid, cid, 0)
