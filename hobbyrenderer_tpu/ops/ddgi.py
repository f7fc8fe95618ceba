"""DDGI: dynamic diffuse global illumination probe volume.

Reference: src/DDGIRenderer.cpp:449-548 + src/shaders/ddgi/* (NVIDIA RTXGI-class
chain — per-frame probe ray trace -> octahedral irradiance/distance blending ->
probe classification/relocation -> shading-time query with trilinear +
Chebyshev visibility weights; probe debug visualization).

TPU build: the probe volume is a dense (Px*Py*Pz) grid of octahedral textures
stored as flat arrays — irradiance (P, 8, 8, 3) and filtered distance
(P, 16, 16, 2) = (E[r], E[r^2]) for the Chebyshev test. Each frame every LIVE
probe traces N_RAYS spherical-fibonacci directions (rotated per frame by a
deterministic rotation) through the shared wavefront BVH; texel blending is one
dense (P, texels, rays) einsum — no atomics, pure MXU/VPU work. Classification
marks probes with a high backface-hit fraction as INSIDE (skipped by queries).
The query is the standard 8-corner trilinear with normal bias + Chebyshev
visibility, vectorized over shaded points."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import lights as lightops
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops.intersect import offset_ray_origin
from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

IRR_RES = 8            # octahedral irradiance texels per probe side
DIST_RES = 16          # octahedral distance texels per probe side
N_RAYS = 64            # probe rays per frame (ref probeNumRays)
HYSTERESIS = 0.97      # ref probeHysteresis
BACKFACE_LIMIT = 0.25  # classification: fraction of backface hits -> inside
NORMAL_BIAS = 0.05     # query self-shadow bias along the surface normal
ENERGY = 0.95          # ref probeIrradianceEncodingGamma-adjacent conservation


@jax.tree_util.register_pytree_node_class
class DDGIVolume:
    """Probe volume state (persistent across frames). counts is STATIC pytree
    aux data (shapes derive from it), the rest are device arrays."""

    def __init__(self, origin, spacing, counts, irradiance, distance, alive,
                 offset=None, variability=None):
        self.origin = origin          # (3,) grid min corner
        self.spacing = spacing        # (3,) probe spacing
        self.counts = tuple(counts)   # (Px, Py, Pz) static
        self.irradiance = irradiance  # (P, IRR, IRR, 3)
        self.distance = distance      # (P, DIST, DIST, 2) mean / mean^2
        self.alive = alive            # (P,) f32 1 = usable (classification)
        self.offset = (jnp.zeros((irradiance.shape[0], 3), jnp.float32)
                       if offset is None else offset)  # relocation offsets
        # ref DDGI variability reduction: relative per-update irradiance
        # change; drives converged-volume trace skipping
        self.variability = (jnp.float32(1.0) if variability is None
                            else variability)

    def tree_flatten(self):
        return ((self.origin, self.spacing, self.irradiance, self.distance,
                 self.alive, self.offset, self.variability), self.counts)

    @classmethod
    def tree_unflatten(cls, counts, leaves):
        # bypass __init__: unflatten must accept ARBITRARY leaf objects
        # (None placeholders, PartitionSpecs, tracers) — __init__'s
        # irradiance.shape default derivation breaks under shard_map's
        # spec-tree handling
        obj = object.__new__(cls)
        (obj.origin, obj.spacing, obj.irradiance, obj.distance,
         obj.alive, obj.offset, obj.variability) = leaves
        obj.counts = tuple(counts)
        return obj

    def _replace(self, **kw):
        d = dict(origin=self.origin, spacing=self.spacing, counts=self.counts,
                 irradiance=self.irradiance, distance=self.distance,
                 alive=self.alive, offset=self.offset,
                 variability=self.variability)
        d.update(kw)
        return DDGIVolume(**d)


def _oct_texel_dirs(res: int) -> jnp.ndarray:
    """(res, res, 3) unit direction at each octahedral texel center."""
    t = (np.arange(res, dtype=np.float32) + 0.5) / res * 2.0 - 1.0
    u, v = np.meshgrid(t, t, indexing="xy")
    e = np.stack([u, v], -1)
    return jnp.asarray(hm.oct_decode(e.reshape(-1, 2), xp=np)
                       .reshape(res, res, 3))


def _fibonacci_dirs(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float32) + 0.5
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    z = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack([r * np.cos(phi), z, r * np.sin(phi)], -1).astype(np.float32)


def ddgi_init(scene_lo, scene_hi, counts=(8, 4, 8)) -> DDGIVolume:
    """Fit the probe grid to the scene bounds (ref DDGI volume placement)."""
    lo = jnp.asarray(scene_lo, jnp.float32)
    hi = jnp.asarray(scene_hi, jnp.float32)
    c = jnp.asarray(counts, jnp.float32)
    spacing = (hi - lo) / jnp.maximum(c - 1.0, 1.0)
    P = int(np.prod(counts))
    return DDGIVolume(origin=lo, spacing=spacing, counts=tuple(counts),
                      irradiance=jnp.zeros((P, IRR_RES, IRR_RES, 3)),
                      distance=jnp.zeros((P, DIST_RES, DIST_RES, 2)),
                      alive=jnp.ones((P,)))


def probe_positions(vol: DDGIVolume) -> jnp.ndarray:
    Px, Py, Pz = vol.counts
    gx, gy, gz = jnp.meshgrid(jnp.arange(Px), jnp.arange(Py), jnp.arange(Pz),
                              indexing="ij")
    g = jnp.stack([gx, gy, gz], -1).reshape(-1, 3).astype(jnp.float32)
    return vol.origin + g * vol.spacing + vol.offset


def _rand_rotation(frame):
    """Deterministic per-frame rotation matrix (decorrelates ray dirs)."""
    f = jnp.asarray(frame).astype(jnp.uint32)
    bits = pcg3d(jnp.stack([f, f ^ jnp.uint32(0x9E3779B9), jnp.uint32(17)]))
    a = uniform_from_bits(bits[0]) * 2 * jnp.pi
    b = uniform_from_bits(bits[1]) * 2 * jnp.pi
    ca, sa, cb, sb = jnp.cos(a), jnp.sin(a), jnp.cos(b), jnp.sin(b)
    ry = jnp.asarray([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
    rx = jnp.asarray([[1, 0, 0], [0, cb, -sb], [0, sb, cb]])
    return ry @ rx


def ddgi_update(vol: DDGIVolume, gpu, rt, settings, frame) -> DDGIVolume:
    """One DDGI frame: trace probe rays, blend octahedral textures, classify.

    Ref DDGIRenderer.cpp:449-548 (ray dispatch + irradiance/distance blend +
    classification)."""
    P = vol.irradiance.shape[0]
    pos = probe_positions(vol)                                 # (P, 3)
    rot = _rand_rotation(frame)
    dirs = jnp.asarray(_fibonacci_dirs(N_RAYS)) @ rot.T        # (N, 3)

    o = jnp.repeat(pos, N_RAYS, axis=0)                        # (P*N, 3)
    d = jnp.tile(dirs, (P, 1))
    # probe rays fan out in all directions: sorted-block kernel on TPU
    from hobbyrenderer_tpu.ops import trace as traceops
    hit = traceops.closest_hit_auto(rt, o, d)
    R = o.shape[0]
    pix = jnp.arange(R, dtype=jnp.uint32)

    # radiance at hits: emissive + one NEE light sample (shared GI machinery)
    from hobbyrenderer_tpu.ops.restir_gi import _hit_radiance
    pool = rt.lights
    h_pos, h_nrm, h_rad = _hit_radiance(gpu, rt, pool, hit, o, d, pix,
                                        jnp.asarray(frame).astype(jnp.uint32)
                                        + jnp.uint32(0xDD61))
    # miss -> sky radiance
    from hobbyrenderer_tpu.ops import sky as skyops
    sun_dir = hm.normalize(jnp.asarray(settings.sun_direction), xp=jnp)
    sky = skyops.sky_radiance(d, sun_dir, settings)
    miss = hit.tri < 0
    radiance = jnp.where(miss[..., None], sky, h_rad)          # (P*N, 3)

    # backface = wrong side of SINGLE-SIDED geometry only (double-sided
    # materials — foliage etc — are legitimately hit from either side and must
    # not classify a probe as buried)
    from hobbyrenderer_tpu.scene.gpu import MATI_DOUBLE_SIDED
    hmat = rt.tri_mat[rt.split_to_orig[jnp.maximum(hit.tri, 0)]]
    ds = gpu.mat_i[hmat, MATI_DOUBLE_SIDED] > 0
    backface = (~miss) & (~hit.front) & (~ds)
    dist = jnp.where(miss, 1e4, hit.t)
    max_d = 1.5 * jnp.linalg.norm(vol.spacing)
    dist = jnp.minimum(dist, max_d)

    radiance = radiance.reshape(P, N_RAYS, 3)
    dist = dist.reshape(P, N_RAYS)
    backfrac = backface.reshape(P, N_RAYS).mean(-1)

    # ---- irradiance blend: texel t <- sum_r w(t,r) * L_r, w = max(cos, 0) ----
    tex_i = _oct_texel_dirs(IRR_RES).reshape(-1, 3)            # (Ti, 3)
    w_i = jnp.maximum(jnp.einsum("td,nd->tn", tex_i, dirs), 0.0)
    irr_new = jnp.einsum("tn,pnc->ptc", w_i, radiance) \
        / jnp.maximum(w_i.sum(-1)[None, :, None], 1e-6)
    # cosine-weighted mean -> irradiance: E = (sum wL / sum w) * pi for
    # uniform-sphere dirs (E[cos+] = 1/4, pdf = 1/4pi => factor pi); a uniform
    # sky of radiance L0 yields E = pi * L0 (tested)
    irr_new = (ENERGY * jnp.pi) * irr_new
    irr_new = irr_new.reshape(P, IRR_RES, IRR_RES, 3)

    # ---- distance blend: sharper cosine power lobe (ref distance sharpness) --
    tex_d = _oct_texel_dirs(DIST_RES).reshape(-1, 3)
    w_d = jnp.maximum(jnp.einsum("td,nd->tn", tex_d, dirs), 0.0) ** 8.0
    d1 = jnp.einsum("tn,pn->pt", w_d, dist)
    d2 = jnp.einsum("tn,pn->pt", w_d, dist * dist)
    wsum = jnp.maximum(w_d.sum(-1)[None, :], 1e-6)
    dist_new = jnp.stack([d1 / wsum, d2 / wsum], -1).reshape(
        P, DIST_RES, DIST_RES, 2)

    first = jnp.all(vol.irradiance == 0.0)
    h = jnp.where(first, 0.0, HYSTERESIS)
    irr = vol.irradiance * h + irr_new * (1.0 - h)
    dst = vol.distance * h + dist_new * (1.0 - h)

    # ---- classification (ref probe classification pass) ----
    alive = jnp.where(backfrac > BACKFACE_LIMIT, 0.0, 1.0)

    # ---- probe relocation (ref RTXGI probe relocation pass) ----
    # Buried probes escape THROUGH the closest backface surface (offset along
    # that ray past the hit); healthy probes sitting too close to front-facing
    # geometry nudge away from it. Offsets clamp to 0.45x spacing (the RTXGI
    # clamp) and apply NEXT frame, converging over a few updates.
    dist_raw = jnp.where(miss, 1e4, hit.t).reshape(P, N_RAYS)
    bf2 = backface.reshape(P, N_RAYS)
    min_ax = jnp.min(vol.spacing)
    bf_d = jnp.where(bf2, dist_raw, 1e9)
    k_bf = jnp.argmin(bf_d, axis=-1)
    d_bf = jnp.take_along_axis(bf_d, k_bf[:, None], -1)[:, 0]
    dir_bf = dirs[k_bf]
    buried = (backfrac > BACKFACE_LIMIT) & (d_bf < 1e8)
    step = jnp.where(buried, d_bf + 0.2 * min_ax, 0.0)
    off = vol.offset + dir_bf * step[:, None]
    ff_d = jnp.where(~bf2 & (dist_raw < 1e3), dist_raw, 1e9)
    k_ff = jnp.argmin(ff_d, axis=-1)
    d_ff = jnp.take_along_axis(ff_d, k_ff[:, None], -1)[:, 0]
    dir_ff = dirs[k_ff]
    close = (~buried) & (d_ff < 0.15 * min_ax)
    off = off - dir_ff * jnp.where(close, 0.15 * min_ax - d_ff, 0.0)[:, None]
    off = jnp.clip(off, -0.45 * vol.spacing, 0.45 * vol.spacing)

    # ---- variability (ref DDGI variability reduction): relative change of
    # the irradiance field this update — the volume's convergence metric ----
    varb = jnp.mean(jnp.abs(irr - vol.irradiance)) \
        / jnp.maximum(jnp.mean(jnp.abs(irr)), 1e-6)
    return vol._replace(irradiance=irr, distance=dst, alive=alive, offset=off,
                        variability=varb)


def _oct_sample(tex, dirs):
    """Bilinear-free nearest octahedral fetch: tex (P_sel..., res, res, C),
    dirs (..., 3) matching leading shape."""
    res = tex.shape[-3]
    e = hm.oct_encode(dirs, xp=jnp)                            # (..., 2) [-1,1]
    u = jnp.clip((e[..., 0] * 0.5 + 0.5) * res, 0.0, res - 1e-3)
    v = jnp.clip((e[..., 1] * 0.5 + 0.5) * res, 0.0, res - 1e-3)
    ui = u.astype(jnp.int32)
    vi = v.astype(jnp.int32)
    return jnp.take_along_axis(
        tex.reshape(tex.shape[:-3] + (res * res, tex.shape[-1])),
        (vi * res + ui)[..., None, None], axis=-2)[..., 0, :]


def ddgi_query(vol: DDGIVolume, pos, normal) -> jnp.ndarray:
    """Trilinear 8-probe irradiance query with normal + Chebyshev visibility
    weights (ref ddgi/ProbeCommon.hlsl query). pos/normal (R, 3); returns
    (R, 3) incident irradiance (divide by pi for Lambert outgoing)."""
    R = pos.shape[0]
    Px, Py, Pz = vol.counts
    biased = pos + normal * (NORMAL_BIAS * jnp.linalg.norm(vol.spacing))
    g = (biased - vol.origin) / vol.spacing                    # (R, 3) grid
    g0 = jnp.floor(g).astype(jnp.int32)
    frac = g - g0

    acc = jnp.zeros((R, 3))
    acc_w = jnp.zeros((R,))
    for cz in range(2):
        for cy in range(2):
            for cx in range(2):
                c = jnp.asarray([cx, cy, cz])
                gi = jnp.clip(g0 + c, jnp.asarray([0, 0, 0]),
                              jnp.asarray([Px - 1, Py - 1, Pz - 1]))
                pid = (gi[:, 0] * Py + gi[:, 1]) * Pz + gi[:, 2]
                # relocated world position (trilinear weights stay grid-based,
                # like the reference)
                p_pos = vol.origin + gi.astype(jnp.float32) * vol.spacing \
                    + vol.offset[pid]
                to_p = p_pos - biased
                d = jnp.linalg.norm(to_p, axis=-1)
                dir_p = to_p / jnp.maximum(d, 1e-6)[..., None]
                # trilinear weight
                t = jnp.where(c[None, :] == 1, frac, 1.0 - frac)
                w_tri = t[:, 0] * t[:, 1] * t[:, 2]
                # normal weight (probes behind the surface contribute less)
                w_n = jnp.maximum(jnp.sum(dir_p * normal, -1), 0.0) ** 2 + 0.05
                # Chebyshev visibility from the distance texture
                dd = _oct_sample(vol.distance[pid], -dir_p)    # (R, 2)
                mean = dd[..., 0]
                var = jnp.maximum(dd[..., 1] - mean * mean, 1e-6)
                cheb = var / (var + jnp.maximum(d - mean, 0.0) ** 2)
                vis = jnp.where(d <= mean, 1.0, jnp.clip(cheb, 0.05, 1.0))
                w = w_tri * w_n * vis * vol.alive[pid]
                irr = _oct_sample(vol.irradiance[pid], normal)
                acc = acc + irr * w[..., None]
                acc_w = acc_w + w
    return acc / jnp.maximum(acc_w, 1e-6)[..., None]


def ddgi_probe_overlay(ldr, vol: DDGIVolume, vc, radius_px: float = 3.0):
    """Debug probe visualization: splat each live probe as a colored dot of its
    mean irradiance (ref DDGI probe visualization, SURVEY.md §2.6 #52)."""
    H, W = ldr.shape[0], ldr.shape[1]
    pos = probe_positions(vol)
    VP = vc["view_proj_no_jitter"]
    w = pos @ VP[3, :3] + VP[3, 3]
    clip = pos @ VP[:3, :3].T + VP[:3, 3]
    ndc = clip / jnp.maximum(w, 1e-6)[..., None]
    x = (ndc[..., 0] * 0.5 + 0.5) * W
    y = (0.5 - ndc[..., 1] * 0.5) * H
    vis = (w > 1e-6) & (x >= 0) & (x < W) & (y >= 0) & (y < H)
    color = vol.irradiance.mean((1, 2))                        # (P, 3)
    color = color / jnp.maximum(color.max(-1, keepdims=True), 1e-3)
    color = jnp.where(vol.alive[:, None] > 0, color,
                      jnp.asarray([1.0, 0.0, 0.0]))            # dead = red

    px = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                jnp.arange(H, dtype=jnp.float32),
                                indexing="xy"), -1)
    out = ldr
    # few probes: a python loop of vectorized splats stays trace-friendly
    for p in range(pos.shape[0]):
        d2 = jnp.sum((px - jnp.stack([x[p], y[p]])) ** 2, -1)
        m = (d2 < radius_px * radius_px) & vis[p]
        out = jnp.where(m[..., None], color[p], out)
    return out
