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
    lo: jnp.ndarray        # (3,) f32 grid origin (world; uniform mode)
    inv_cell: jnp.ndarray  # (3,) f32 1 / cell size (uniform mode)
    dims: tuple            # static (nx, ny, nz) (uniform mode)
    # onion mode (ref rtxdi::ReGIRMode::Onion, RTXDIRenderer.cpp:781-786):
    # camera-centered radial shells — LINEAR detail layers near the camera,
    # GEOMETRIC coverage layers out to the scene radius — so cell density
    # follows where candidates matter; a uniform world grid wastes cells at
    # range and under-resolves near the camera on large scenes.
    mode: str = "grid"     # static "grid" | "onion"
    cam: jnp.ndarray = None       # (3,) onion center (camera position)
    onion_dims: tuple = None      # static (n_detail, n_coverage, n_az, n_el)
    r_detail: jnp.ndarray = None  # f32 outer radius of the detail layers
    r_max: jnp.ndarray = None     # f32 outer radius of the last layer


def _luminance(rgb):
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
            + 0.0722 * rgb[..., 2])


def _onion_centers(cam, r_detail, r_max, onion_dims):
    """(C, 3) representative points of the onion cells (shell mid-radius at
    each angular cell's central direction), camera-centered."""
    n_det, n_cov, n_az, n_el = onion_dims
    L = n_det + n_cov
    C = L * n_az * n_el
    ci = jnp.arange(C, dtype=jnp.int32)
    az = ci % n_az
    el = (ci // n_az) % n_el
    layer = ci // (n_az * n_el)
    # detail: linear spacing in [0, r_detail); coverage: geometric to r_max
    g = (r_max / jnp.maximum(r_detail, 1e-3)) ** (1.0 / n_cov)
    lf = layer.astype(jnp.float32)
    r_mid = jnp.where(layer < n_det,
                      r_detail * (lf + 0.5) / n_det,
                      r_detail * g ** (lf - n_det + 0.5))
    az_c = (az.astype(jnp.float32) + 0.5) / n_az * (2.0 * jnp.pi) - jnp.pi
    el_c = (el.astype(jnp.float32) + 0.5) / n_el * jnp.pi - 0.5 * jnp.pi
    d = jnp.stack([jnp.cos(el_c) * jnp.cos(az_c), jnp.sin(el_c),
                   jnp.cos(el_c) * jnp.sin(az_c)], -1)
    return cam[None, :] + d * r_mid[..., None]


def build_regir_onion(pool, cam, scene_radius, frame,
                      onion_dims=(5, 10, 12, 6), tile_size: int = 128,
                      rounds: int = 4) -> RegirGrid:
    """Onion-mode ReGIR (ref rtxdi::ReGIRMode::Onion with OnionDetailLayers=5,
    OnionCoverageLayers=10, RTXDIRenderer.cpp:781-786): camera-centered
    shells x (az, el) angular cells. Same tile-table output contract as
    build_regir_grid."""
    n_det, n_cov, n_az, n_el = onion_dims
    C = (n_det + n_cov) * n_az * n_el
    cam = jnp.asarray(cam, jnp.float32)
    r_max = jnp.maximum(jnp.asarray(scene_radius, jnp.float32), 1.0)
    r_detail = 0.15 * r_max
    centers = _onion_centers(cam, r_detail, r_max, onion_dims)
    rows = _build_cells(pool, centers, frame, tile_size, rounds)
    return RegirGrid(rows=rows, lo=cam, inv_cell=jnp.ones(3), dims=(0, 0, 0),
                     mode="onion", cam=cam, onion_dims=onion_dims,
                     r_detail=r_detail, r_max=r_max)


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
    rows = _build_cells(pool, centers, frame, S, rounds)
    return RegirGrid(rows=rows, lo=lo, inv_cell=1.0 / cell_sz, dims=dims)


def _build_cells(pool, centers, frame, tile_size: int, rounds: int):
    """K-round streaming RIS per (cell, slot) lane over power-CDF draws;
    p-hat = unshadowed luminance at the cell's representative point.
    Returns (C, S, 18) presample-tile-format tables."""
    C = centers.shape[0]
    S = tile_size
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
    return table.reshape(C, S, 18)


def cells_of_positions(grid: RegirGrid, pos, valid):
    """World positions (..., 3) -> flat cell ids (...,); invalid positions
    clamp to the nearest cell (their candidates are still valid RIS draws)."""
    if grid.mode == "onion":
        n_det, n_cov, n_az, n_el = grid.onion_dims
        L = n_det + n_cov
        rel = pos - grid.cam
        r = jnp.linalg.norm(rel, axis=-1)
        g = (grid.r_max / jnp.maximum(grid.r_detail, 1e-3)) ** (1.0 / n_cov)
        # inverse of _onion_centers' layer spacing
        lay_det = jnp.floor(r / jnp.maximum(grid.r_detail, 1e-6) * n_det)
        lay_cov = n_det + jnp.floor(
            jnp.log(jnp.maximum(r / jnp.maximum(grid.r_detail, 1e-6), 1.0))
            / jnp.log(g))
        layer = jnp.clip(jnp.where(r < grid.r_detail, lay_det, lay_cov),
                         0, L - 1).astype(jnp.int32)
        rn = jnp.maximum(r, 1e-6)
        az = jnp.clip(((jnp.arctan2(rel[..., 2], rel[..., 0]) + jnp.pi)
                       / (2.0 * jnp.pi) * n_az).astype(jnp.int32),
                      0, n_az - 1)
        el = jnp.clip(((jnp.arcsin(jnp.clip(rel[..., 1] / rn, -1.0, 1.0))
                        + 0.5 * jnp.pi) / jnp.pi * n_el).astype(jnp.int32),
                      0, n_el - 1)
        cid = (layer * n_el + el) * n_az + az
        return jnp.where(valid, cid, 0)
    nx, ny, nz = grid.dims
    q = (pos - grid.lo) * grid.inv_cell
    qi = jnp.clip(q.astype(jnp.int32),
                  jnp.zeros(3, jnp.int32),
                  jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))
    cid = qi[..., 0] + nx * (qi[..., 1] + ny * qi[..., 2])
    return jnp.where(valid, cid, 0)
