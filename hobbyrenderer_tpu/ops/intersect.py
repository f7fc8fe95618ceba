"""Ray-primitive intersection kernels (jnp, vectorized over rays).

Reference: src/shaders/RaytracingCommon.hlsli:138-199 (TraceRayStandard via D3D12
RayQuery — hardware BVH + triangle tests). On TPU both are software: slab AABB test
+ Möller-Trumbore triangles."""

from __future__ import annotations

import jax.numpy as jnp

INF = jnp.float32(3.0e38)


def ray_aabb(o, inv_d, lo, hi, t_max):
    """Slab test. o, inv_d: (..., 3); lo, hi: (..., 3). Returns (hit, t_enter).

    inv_d must be precomputed as 1/d with +-inf for zero components."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t_enter = jnp.max(tmin, axis=-1)
    t_exit = jnp.min(tmax, axis=-1)
    hit = (t_enter <= t_exit * 1.00000024) & (t_exit > 0.0) & (t_enter < t_max)
    return hit, jnp.maximum(t_enter, 0.0)


def ray_triangle(o, d, v0, v1, v2, t_min=1e-4, t_max=INF):
    """Möller-Trumbore. o,d: (...,3); v0..v2: (...,3).

    Returns (t, u, v, hit, front_facing)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, -1)
    # both faces intersect; remember orientation for two-sided shading
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = o - v0
    u = jnp.sum(s * p, -1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(d * q, -1) * inv_det
    t = jnp.sum(e2 * q, -1) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= -1e-7) & (v >= -1e-7) & (u + v <= 1.0 + 1e-7)
           & (t > t_min) & (t < t_max))
    return t, u, v, hit, det > 0


def safe_inv_dir(d):
    return jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.where(d >= 0, 1e12, -1e12))


def offset_ray_origin(p, n, d):
    """Robust origin offset along the geometric normal (self-intersection guard)."""
    side = jnp.where(jnp.sum(n * d, -1, keepdims=True) >= 0, 1.0, -1.0)
    scale = jnp.maximum(jnp.max(jnp.abs(p), axis=-1, keepdims=True), 1.0)
    return p + n * side * (4e-4 * scale)


def retarget_shadow_ray(p, o, L, dist):
    """Re-aim a shadow ray at a SURFACE sample (emissive triangle, GI
    reconnection point) after the origin was offset: returns (L_o, t_max)
    such that the ray from o passes EXACTLY through the sample point
    target = p + L * dist and stops an epsilon short of it.

    Shooting the ORIGINAL direction from the offset origin is wrong in two
    ways: the origin advance eats into dist (a fixed 2e-3 margin
    under-covered any offset > 2e-3, e.g. ReSTIR's shadow_bias or
    offset_ray_origin at |p| > 5), and the LATERAL part of the offset shifts
    where the ray crosses the emitter plane by offset.n_l / L.n_l — so the
    ray re-hit the target surface and silently killed most area-light
    energy."""
    # masked lanes carry inf distances (and 0*inf = NaN would bleed through
    # downstream bilinear resizes even where callers select 0)
    dist_c = jnp.where(jnp.isfinite(dist), dist, 1.0)
    target = p + L * dist_c[..., None]
    to_t = target - o
    dist_o = jnp.linalg.norm(to_t, axis=-1)
    L_o = to_t / jnp.maximum(dist_o, 1e-8)[..., None]
    L_o = jnp.where(jnp.isfinite(L_o), L_o, 0.0)
    scale = jnp.maximum(jnp.max(jnp.abs(p), axis=-1), 1.0)
    eps = jnp.maximum(2e-3, 1.6e-3 * scale)
    tm = jnp.where(jnp.isfinite(dist), dist_o - eps, dist)
    return L_o, tm
