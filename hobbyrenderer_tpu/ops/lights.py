"""Polymorphic light pool + power-based RIS presampling.

Reference: the RTXDI light-preparation chain (src/RTXDIRenderer.cpp:1969
PrepareLights — analytic lights + emissive TRIANGLE lights flattened into one
polymorphic pool; :2039-2105 presampling — per-frame RIS tiles sampled
proportional to light power so per-pixel candidate generation is O(1) table
reads instead of a pool-wide scan).

TPU build: the pool is a pytree of flat arrays; light ids index one namespace:
[0, n_analytic) analytic (SceneGPU.light_*), [n_analytic, n_total) emissive
triangles (world-space, refit together with the RT snapshot). Presampling is
inverse-CDF sampling of the power distribution — (tiles, tile_size) id tables
built by pure vectorized searchsorted, no atomics."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

PRESAMPLE_TILES = 64       # ref RTXDI regirBuildSettings / presample tile count
PRESAMPLE_TILE_SIZE = 128

MAX_EMISSIVE_TRIS = 16384  # pool cap; larger emitters are subsampled


class LightPool(NamedTuple):
    """Flattened polymorphic lights (analytic + emissive triangles)."""

    n_analytic: jnp.ndarray   # () i32 = SceneGPU analytic SLOT COUNT (padded
    #                           array size; dead slots carry zero power)
    n_total: jnp.ndarray      # () i32 = n_analytic + live emissive tris
    em_v0: jnp.ndarray        # (E, 3) f32 world-space (E >= 1, padded)
    em_e1: jnp.ndarray        # (E, 3)
    em_e2: jnp.ndarray        # (E, 3)
    em_rad: jnp.ndarray       # (E, 3) emitted radiance (material emissive)
    em_orig: jnp.ndarray      # (E,) i32 original flat tri id (refit mapping)
    em_scale: jnp.ndarray     # (E,) f32 subsample power-conservation scale
    #                           (em_rad = material emissive * em_scale)
    power_cdf: jnp.ndarray    # (A + E,) f32 normalized inclusive power CDF
    power_pdf: jnp.ndarray    # (A + E,) f32 selection probability per light
    # ONE-ROW-PER-LIGHT packed table (A + E, 16): per-pixel polymorphic light
    # evaluation costs a single row gather instead of ~10 field gathers (at
    # 1080p a (R,) gather is ~20 ms — ReSTIR evaluates p-hat ~15x per frame).
    # analytic: [type, pos3, dir3, color3, range, cone2, 0, 0, 0]
    # emissive: [0,    v03,  e13,  e23,   rad3,         1, 0, 0]
    packed: jnp.ndarray = None


def _analytic_power(gpu) -> jnp.ndarray:
    """Selection power heuristic per analytic light (ref PrepareLights'
    light flux estimate)."""
    lum = hm.luminance(gpu.light_color, xp=jnp)
    # punctual lights: flux ~ intensity; directional: strong constant weight
    from hobbyrenderer_tpu.scene.scene import LIGHT_DIRECTIONAL
    p = jnp.where(gpu.light_type == LIGHT_DIRECTIONAL, lum * 20.0, lum)
    alive = jnp.arange(p.shape[0]) < gpu.light_count
    return jnp.where(alive, jnp.maximum(p, 1e-6), 0.0)


def _emissive_power(v0, e1, e2, rad) -> jnp.ndarray:
    area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    return hm.luminance(rad, xp=jnp) * area * jnp.pi


def build_light_pool(scene, gpu) -> LightPool:
    """Host-side: collect emissive triangles (LOD0, world space) + analytic
    lights into one pool (ref PrepareLights, src/RTXDIRenderer.cpp:1969)."""
    v0s, e1s, e2s, rads, origs = [], [], [], [], []
    tri_base = 0
    for I in scene.instances:
        mesh = scene.meshes[I.prim]
        ntri = mesh.lods[0].indices.shape[0]
        m = scene.materials[I.material]
        em = np.asarray(m.emissive, np.float32) * np.float32(
            getattr(m, "emissive_strength", 1.0))
        if np.any(em > 0):
            w = scene.nodes[I.node].world
            idx = mesh.lods[0].indices
            pw = hm.transform_points(w, mesh.positions)
            tv = pw[idx].astype(np.float32)               # (t, 3, 3)
            v0s.append(tv[:, 0])
            e1s.append(tv[:, 1] - tv[:, 0])
            e2s.append(tv[:, 2] - tv[:, 0])
            rads.append(np.tile(em[None, :], (ntri, 1)))
            origs.append(np.arange(ntri, dtype=np.int32) + tri_base)
        tri_base += ntri

    if v0s:
        v0 = np.concatenate(v0s, 0)
        e1 = np.concatenate(e1s, 0)
        e2 = np.concatenate(e2s, 0)
        rad = np.concatenate(rads, 0)
        orig = np.concatenate(origs, 0)
        scale_arr = np.ones(v0.shape[0], np.float32)
        if v0.shape[0] > MAX_EMISSIVE_TRIS:
            # subsample uniformly, scaling radiance to conserve total power
            # (log a silent-cap would hide energy loss; scaling keeps it)
            keep = np.linspace(0, v0.shape[0] - 1, MAX_EMISSIVE_TRIS).astype(int)
            scale = v0.shape[0] / MAX_EMISSIVE_TRIS
            v0, e1, e2, orig = v0[keep], e1[keep], e2[keep], orig[keep]
            rad = rad[keep] * scale
            scale_arr = np.full(v0.shape[0], scale, np.float32)
    else:
        v0 = np.zeros((1, 3), np.float32)
        e1 = np.zeros((1, 3), np.float32)
        e2 = np.zeros((1, 3), np.float32)
        rad = np.zeros((1, 3), np.float32)
        orig = np.full((1,), -1, np.int32)
        scale_arr = np.ones(1, np.float32)

    E = v0.shape[0]
    A = gpu.light_type.shape[0]
    ne = int((np.abs(rad).sum(-1) > 0).sum())
    pool = LightPool(
        n_analytic=jnp.asarray(np.int32(A)),
        n_total=jnp.asarray(np.int32(A + ne)),
        em_v0=jnp.asarray(v0), em_e1=jnp.asarray(e1), em_e2=jnp.asarray(e2),
        em_rad=jnp.asarray(rad), em_orig=jnp.asarray(orig),
        em_scale=jnp.asarray(scale_arr),
        power_cdf=jnp.zeros(A + E), power_pdf=jnp.zeros(A + E))
    return refresh_pool_power(pool, gpu)


def refresh_pool_emissive(pool: LightPool, gpu, tri_mat) -> LightPool:
    """Re-derive em_rad from the CURRENT material table and recompute the
    power CDF (ref PrepareLights runs every frame): animated emissive
    strength (.scene.json emissiveIntensity channels) must drive the CAST
    light, not just the emitter's surface shading. tri_mat: (T,) i32 original
    flat tri -> material."""
    from hobbyrenderer_tpu.scene.gpu import MAT_EMISSIVE
    mat = tri_mat[jnp.maximum(pool.em_orig, 0)]
    em = gpu.mat_f[mat, MAT_EMISSIVE:MAT_EMISSIVE + 3]
    rad = jnp.where((pool.em_orig >= 0)[:, None],
                    em * pool.em_scale[:, None], 0.0)
    return refresh_pool_power(pool._replace(em_rad=rad), gpu)


def pack_pool(pool: LightPool, gpu) -> LightPool:
    """Build the one-row-per-light packed table (see LightPool.packed)."""
    A = gpu.light_type.shape[0]
    E = pool.em_v0.shape[0]
    pa = jnp.concatenate([
        gpu.light_type.astype(jnp.float32)[:, None],
        gpu.light_pos, gpu.light_dir, gpu.light_color,
        gpu.light_range[:, None], gpu.light_cone,
        jnp.zeros((A, 3), jnp.float32)], -1)
    pe = _pack_emissive(pool, E)
    return pool._replace(packed=jnp.concatenate([pa, pe], 0))


def _pack_emissive(pool: LightPool, E: int) -> jnp.ndarray:
    return jnp.concatenate([
        jnp.zeros((E, 1), jnp.float32),
        pool.em_v0, pool.em_e1, pool.em_e2, pool.em_rad,
        jnp.ones((E, 1), jnp.float32),
        jnp.zeros((E, 2), jnp.float32)], -1)


def refresh_pool_power(pool: LightPool, gpu) -> LightPool:
    """Recompute selection power (device; run after refit/light edits)."""
    pa = _analytic_power(gpu)
    pe = _emissive_power(pool.em_v0, pool.em_e1, pool.em_e2, pool.em_rad)
    A = pa.shape[0]
    alive_e = (jnp.arange(pe.shape[0]) + A) < pool.n_total
    p = jnp.concatenate([pa, jnp.where(alive_e, jnp.maximum(pe, 1e-8), 0.0)])
    total = jnp.maximum(jnp.sum(p), 1e-20)
    pdf = p / total
    return pack_pool(pool._replace(power_cdf=jnp.cumsum(pdf), power_pdf=pdf),
                     gpu)


def refit_light_pool(pool: LightPool, M_tri) -> LightPool:
    """Move emissive triangles by per-tri world deltas M_tri (E, 4, 4)
    (the light side of the per-frame TLAS refit)."""
    def xf(p):
        return jnp.einsum("eij,ej->ei", M_tri[:, :3, :3], p) + M_tri[:, :3, 3]
    v0 = xf(pool.em_v0)
    v1 = xf(pool.em_v0 + pool.em_e1)
    v2 = xf(pool.em_v0 + pool.em_e2)
    pool = pool._replace(em_v0=v0, em_e1=v1 - v0, em_e2=v2 - v0)
    if pool.packed is not None:
        # analytic rows are untouched by refit; rewrite the emissive block
        E = pool.em_v0.shape[0]
        A = pool.packed.shape[0] - E
        pool = pool._replace(packed=jax.lax.dynamic_update_slice(
            pool.packed, _pack_emissive(pool, E), (A, 0)))
    return pool


def pool_light_incident(gpu, pool: LightPool, li, uv, pos, return_aux=False):
    """Incident (L, radiance, dist) of polymorphic light li at pos.

    li (R,) i32 pool ids; uv (R, 2) the sample point for AREA lights (folded
    uniform barycentrics). Analytic lights ignore uv. The emissive-triangle
    "radiance" folds the geometry-to-area factor cos_l * area / d^2, so
    contribution = brdf * radiance with a pure selection pdf — the same
    contract light_incident uses for punctual falloff."""
    A = pool.n_analytic
    is_em = li >= A
    la = jnp.clip(li, 0, gpu.light_type.shape[0] - 1)
    L_a, rad_a, dist_a = shadeops.light_incident(
        gpu.light_type[la], gpu.light_pos[la], gpu.light_dir[la],
        gpu.light_color[la], gpu.light_range[la], gpu.light_cone[la], pos)

    e = jnp.clip(li - A, 0, pool.em_v0.shape[0] - 1)
    u = uv[..., 0]
    v = uv[..., 1]
    # fold the unit square onto the triangle (preserves uniformity)
    over = (u + v) > 1.0
    uu = jnp.where(over, 1.0 - u, u)
    vv = jnp.where(over, 1.0 - v, v)
    p_l = pool.em_v0[e] + uu[..., None] * pool.em_e1[e] + vv[..., None] * pool.em_e2[e]
    to_l = p_l - pos
    d2 = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-8)
    dist_e = jnp.sqrt(d2)
    L_e = to_l / dist_e[..., None]
    n_x2 = jnp.cross(pool.em_e1[e], pool.em_e2[e])     # |.| = 2 * area
    area = 0.5 * jnp.linalg.norm(n_x2, axis=-1)
    n_l = n_x2 / jnp.maximum(2.0 * area, 1e-12)[..., None]
    cos_l = jnp.abs(jnp.sum(n_l * (-L_e), -1))         # double-sided emitter
    rad_e = pool.em_rad[e] * (cos_l * area / d2)[..., None]

    L = jnp.where(is_em[..., None], L_e, L_a)
    rad = jnp.where(is_em[..., None], rad_e, rad_a)
    dist = jnp.where(is_em, dist_e, dist_a)
    if return_aux:
        # area-measure geometry for MIS: solid-angle pdf of the sampled
        # direction = pdf_select * d^2 / (area * cos_l) (emissive only)
        return L, rad, dist, (is_em, area, cos_l, d2)
    return L, rad, dist


def pool_light_incident_packed(pool: LightPool, li, uv, pos):
    """pool_light_incident via ONE packed-row gather per lane (the hot path:
    ReSTIR p-hat evaluation; same contract/returns as pool_light_incident)."""
    if pool.packed is None:
        raise ValueError("pool has no packed table (call pack_pool)")
    N = pool.packed.shape[0]
    rows = pool.packed[jnp.clip(li, 0, N - 1)]            # (..., 16) 1 gather
    return light_incident_rows(rows, uv, pos)


def light_incident_rows(rows, uv, pos):
    """Polymorphic light evaluation from in-hand packed rows (..., 16) — the
    gather-free core of pool_light_incident_packed. ReSTIR carries these rows
    in presample tiles and reservoirs so p-hat costs zero pool gathers."""
    is_em = rows[..., 13] > 0.5
    ltype = rows[..., 0].astype(jnp.int32)
    L_a, rad_a, dist_a = shadeops.light_incident(
        ltype, rows[..., 1:4], rows[..., 4:7], rows[..., 7:10],
        rows[..., 10], rows[..., 11:13], pos)

    u = uv[..., 0]
    v = uv[..., 1]
    over = (u + v) > 1.0
    uu = jnp.where(over, 1.0 - u, u)
    vv = jnp.where(over, 1.0 - v, v)
    e1 = rows[..., 4:7]
    e2 = rows[..., 7:10]
    p_l = rows[..., 1:4] + uu[..., None] * e1 + vv[..., None] * e2
    to_l = p_l - pos
    d2 = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-8)
    dist_e = jnp.sqrt(d2)
    L_e = to_l / dist_e[..., None]
    n_x2 = jnp.cross(e1, e2)
    area = 0.5 * jnp.linalg.norm(n_x2, axis=-1)
    n_l = n_x2 / jnp.maximum(2.0 * area, 1e-12)[..., None]
    cos_l = jnp.abs(jnp.sum(n_l * (-L_e), -1))
    rad_e = rows[..., 10:13] * (cos_l * area / d2)[..., None]

    L = jnp.where(is_em[..., None], L_e, L_a)
    rad = jnp.where(is_em[..., None], rad_e, rad_a)
    dist = jnp.where(is_em, dist_e, dist_a)
    return L, rad, dist


def presample_lights(pool: LightPool, frame,
                     n_tiles: int = PRESAMPLE_TILES,
                     tile_size: int = PRESAMPLE_TILE_SIZE):
    """Per-frame RIS presampling tiles (ref src/RTXDIRenderer.cpp:2039-2105).

    Returns (tile_ids (T, S) i32, tile_inv_pdf (T, S) f32): light ids drawn
    proportional to power; inv_pdf = 1 / selection probability."""
    T, S = n_tiles, tile_size
    slot = jnp.arange(T * S, dtype=jnp.uint32)
    bits = pcg3d(jnp.stack([slot, jnp.broadcast_to(
        jnp.asarray(frame).astype(jnp.uint32), slot.shape),
        jnp.full_like(slot, 7)], -1))
    u = uniform_from_bits(bits[..., 0])
    ids = jnp.searchsorted(pool.power_cdf, u).astype(jnp.int32)
    ids = jnp.clip(ids, 0, pool.power_pdf.shape[0] - 1)
    inv_pdf = 1.0 / jnp.maximum(pool.power_pdf[ids], 1e-20)
    # empty pool (no lights at all): id -1 marks dead samples
    ids = jnp.where(pool.n_total > 0, ids, -1)
    return ids.reshape(T, S), inv_pdf.reshape(T, S)


def presample_light_rows(pool: LightPool, frame,
                         n_tiles: int = PRESAMPLE_TILES * PRESAMPLE_TILE_SIZE
                         // 128,
                         tile_size: int = 128):
    """Presample tiles carrying FULL packed light rows: (T, S=128, 18) f32 =
    [packed row (16), inv_pdf, id]. One T*S-row gather at presample time
    (~0.1 ms) replaces a 2M-lane gather per ReSTIR candidate (~13 ms each at
    1080p). S is PINNED to 128 (the VPU lane width): one tile == one
    contiguous chunk that a 128-pixel row segment fetches as a single row of
    the flattened (T, S*18) table, and the Pallas candidate kernel
    (ops/restir_pallas.py) holds a chunk's slots on the lane axis.
    Total samples = the reference-scaled PRESAMPLE budget
    (ref src/RTXDIRenderer.cpp:41-49)."""
    ids, inv = presample_lights(pool, frame, n_tiles, tile_size)
    N = pool.packed.shape[0]
    rows = pool.packed[jnp.clip(ids, 0, N - 1)]
    rows = jnp.where((ids >= 0)[..., None], rows, 0.0)
    return jnp.concatenate(
        [rows, inv[..., None], ids.astype(jnp.float32)[..., None]], -1)
