"""SHARC: world-space spatial-hash radiance cache.

Reference: src/SHARCRenderer.cpp (NVIDIA SHARC headers) — persistent hash-entry
(u64) + accumulation + resolved buffers at SHARC_CACHE_ENTRIES; three passes:
sparse Update (BRDF rays populate cells), Resolve (EMA blend + staleness
eviction over all entries), Query (screen-space lookup -> indirect radiance
texture). SURVEY.md §2.6 #42.

TPU design (no atomics, SURVEY.md §7 "hash-grid cache without atomics"):
- Cells: camera-distance-scaled voxel grid + normal octant, folded to a 32-bit
  key; DIRECT-MAPPED slots (slot = hash(key) & (N-1)). Collisions replace
  stale entries and otherwise drop the newcomer — the capacity/quality
  tradeoff of the reference's linear probing, resolved without CAS loops.
- Update: secondary-bounce samples are sorted by slot and segment-averaged, so
  each slot receives ONE scatter per frame (deterministic, no atomics).
- Resolve: vectorized EMA + age-based eviction over all entries.
- Query: per-pixel key -> slot gather, validated by key equality.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

CACHE_ENTRIES = 1 << 18       # 262k entries (ref 2^20..2^22; scaled down)
BASE_CELL = 0.25              # voxel size at distance ~1
STALE_FRAMES = 64.0           # eviction age (ref ~1s hysteresis)
EMA = 0.05


class SharcCache(NamedTuple):
    key: jnp.ndarray          # (N,) uint32 cell key, 0 = empty
    radiance: jnp.ndarray     # (N, 3) f32 resolved radiance
    age: jnp.ndarray          # (N,) f32 frames since last touch


def sharc_init(n: int = CACHE_ENTRIES) -> SharcCache:
    return SharcCache(key=jnp.zeros(n, jnp.uint32),
                      radiance=jnp.zeros((n, 3), jnp.float32),
                      age=jnp.full(n, 1e9, jnp.float32))


def _cell_key(pos, normal, cam_pos):
    """Quantize position (log-distance-scaled voxels) + normal octant -> u32
    key (ref SHARC multi-level voxel hashing). Key 0 is reserved for empty."""
    d = jnp.linalg.norm(pos - cam_pos, axis=-1, keepdims=True)
    level = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(d / 4.0, 1e-3))), 0.0, 6.0)
    cell = BASE_CELL * jnp.exp2(level)
    q = jnp.floor(pos / cell).astype(jnp.int32)
    oct_n = ((normal[..., 0] > 0).astype(jnp.int32)
             | ((normal[..., 1] > 0).astype(jnp.int32) << 1)
             | ((normal[..., 2] > 0).astype(jnp.int32) << 2))
    v = jnp.stack([q[..., 0].astype(jnp.uint32),
                   q[..., 1].astype(jnp.uint32),
                   q[..., 2].astype(jnp.uint32)
                   ^ (oct_n.astype(jnp.uint32) << 27)
                   ^ (level[..., 0].astype(jnp.uint32) << 24)], -1)
    h = pcg3d(v)
    key = h[..., 0] ^ (h[..., 1] << 1)
    return jnp.maximum(key, 1).astype(jnp.uint32)   # avoid the empty sentinel


def _slot_of(key, n):
    h = pcg3d(jnp.stack([key, key ^ jnp.uint32(0x9E3779B9),
                         jnp.full_like(key, 17)], -1))[..., 2]
    return (h % jnp.uint32(n)).astype(jnp.int32)


def sharc_update(cache: SharcCache, sample_pos, sample_normal, sample_radiance,
                 sample_valid, cam_pos) -> SharcCache:
    """Insert/blend secondary-bounce samples (ref SHARCUpdate.hlsl).

    Samples are sorted by slot; per-slot segment means produce one candidate
    per slot; existing entries EMA-blend on key match, stale/empty slots are
    (re)claimed, mismatched live slots keep their data."""
    n = cache.key.shape[0]
    key = _cell_key(sample_pos, sample_normal, cam_pos)
    slot = jnp.where(sample_valid, _slot_of(key, n), n)   # n = dropped
    order = jnp.argsort(slot)
    slot_s = slot[order]
    key_s = key[order]
    rad_s = sample_radiance[order]

    seg = jax.ops.segment_sum(jnp.ones_like(slot_s, dtype=jnp.float32),
                              slot_s, num_segments=n + 1,
                              indices_are_sorted=True)[:n]
    rad_sum = jax.ops.segment_sum(rad_s, slot_s, num_segments=n + 1,
                                  indices_are_sorted=True)[:n]
    key_bits = jax.lax.bitcast_convert_type(key_s, jnp.int32)
    key_any = jax.lax.bitcast_convert_type(
        jax.ops.segment_max(key_bits, slot_s, num_segments=n + 1,
                            indices_are_sorted=True)[:n], jnp.uint32)
    touched = seg > 0
    mean_rad = rad_sum / jnp.maximum(seg, 1.0)[..., None]

    stale = cache.age > STALE_FRAMES
    empty = cache.key == 0
    match = (cache.key == key_any) & touched
    claim = touched & (empty | stale) & ~match

    new_rad = jnp.where(match[..., None],
                        cache.radiance + (mean_rad - cache.radiance)
                        * jnp.minimum(EMA * jnp.sqrt(seg)[..., None], 1.0),
                        cache.radiance)
    new_rad = jnp.where(claim[..., None], mean_rad, new_rad)
    new_key = jnp.where(claim, key_any, cache.key)
    new_age = jnp.where(match | claim, 0.0, cache.age)
    return SharcCache(key=new_key, radiance=new_rad, age=new_age)


def sharc_resolve(cache: SharcCache) -> SharcCache:
    """Per-frame aging + eviction (ref SharcResolve.hlsl staleness pass)."""
    age = cache.age + 1.0
    dead = age > 4.0 * STALE_FRAMES
    return SharcCache(key=jnp.where(dead, 0, cache.key),
                      radiance=jnp.where(dead[..., None], 0.0, cache.radiance),
                      age=age)


def sharc_query(cache: SharcCache, pos, normal, cam_pos):
    """Screen-space lookup (ref SHARCQuery.hlsl): returns (radiance, hit)."""
    n = cache.key.shape[0]
    key = _cell_key(pos, normal, cam_pos)
    slot = _slot_of(key, n)
    ck = cache.key[slot]
    rad = cache.radiance[slot]
    hit = (ck == key) & (cache.age[slot] < 2.0 * STALE_FRAMES)
    return jnp.where(hit[..., None], rad, 0.0), hit
