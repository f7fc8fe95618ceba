"""SHARC: world-space spatial-hash radiance cache.

Reference: src/SHARCRenderer.cpp (NVIDIA SHARC headers) — persistent hash-entry
(u64) + accumulation + resolved buffers at SHARC_CACHE_ENTRIES; three passes:
sparse Update (BRDF rays populate cells), Resolve (EMA blend + staleness
eviction over all entries), Query (screen-space lookup -> indirect radiance
texture). SURVEY.md §2.6 #42.

TPU design (no atomics, SURVEY.md §7 "hash-grid cache without atomics"):
- Cells: camera-distance-scaled voxel grid + normal octant, folded to a 32-bit
  key; hashed base slot + PROBES-way linear probing (the reference's CAS probe
  loop becomes PROBES parallel gathers + a vectorized first-fit select — no
  per-lane loops).
- Update: each sample picks its probe slot (key match > empty/stale > base),
  samples are sorted by slot and segment-averaged, so each slot receives ONE
  scatter per frame (deterministic, no atomics).
- Resolve: vectorized EMA + age-based eviction over all entries.
- Query: per-pixel key -> PROBES slot gathers, validated by key equality.
- Multi-bounce: the update inserts direct light at the bounce hit PLUS the
  cache's own previous-frame value at the hit cell (ref SHARC path-continuation
  lookups), so energy propagates one extra bounce per frame toward the full
  multi-bounce solution.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

CACHE_ENTRIES = 1 << 20       # 1M entries (ref 2^20..2^22); n must be pow2
PROBES = 4                    # linear-probe window (ref linear probing)
BASE_CELL = 0.25              # voxel size at distance ~1
STALE_FRAMES = 64.0           # eviction age (ref ~1s hysteresis)
EMA = 0.05


class SharcCache(NamedTuple):
    key: jnp.ndarray          # (N,) uint32 cell key, 0 = empty
    radiance: jnp.ndarray     # (N, 3) f32 resolved radiance
    age: jnp.ndarray          # (N,) f32 frames since last touch


def sharc_init(n: int = CACHE_ENTRIES) -> SharcCache:
    assert n & (n - 1) == 0, "cache size must be a power of two"
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
    """Base probe slot for a key (probe window = base..base+PROBES-1 mod n)."""
    h = pcg3d(jnp.stack([key, key ^ jnp.uint32(0x9E3779B9),
                         jnp.full_like(key, 17)], -1))[..., 2]
    return (h % jnp.uint32(n)).astype(jnp.int32)


def _probe_slots(key, n):
    """(..., PROBES) candidate slots, wrapping in the pow2 table."""
    base = _slot_of(key, n)
    return (base[..., None] + jnp.arange(PROBES, dtype=jnp.int32)) & (n - 1)


def sharc_update(cache: SharcCache, sample_pos, sample_normal, sample_radiance,
                 sample_valid, cam_pos) -> SharcCache:
    """Insert/blend secondary-bounce samples (ref SHARCUpdate.hlsl).

    Each sample first-fit-picks a slot in its probe window (key match, else
    empty/stale, else base — the reference's linear-probe insert, done as
    PROBES gathers + select). Samples are then sorted by slot; per-slot
    segment means produce one candidate per slot; existing entries EMA-blend
    on key match, stale/empty slots are (re)claimed, mismatched live slots
    keep their data."""
    n = cache.key.shape[0]
    key = _cell_key(sample_pos, sample_normal, cam_pos)
    cand = _probe_slots(key, n)                       # (R, PROBES)
    ck = cache.key[cand]
    cage = cache.age[cand]
    is_match = ck == key[..., None]
    is_free = (ck == 0) | (cage > STALE_FRAMES)
    # first-fit priority: match (2) > free (1) > none (0); earlier probe wins
    prio = is_match.astype(jnp.int32) * 2 + is_free.astype(jnp.int32)
    rank = prio * PROBES + (PROBES - 1 - jnp.arange(PROBES, dtype=jnp.int32))
    pick = jnp.argmax(rank, axis=-1)
    slot = jnp.take_along_axis(cand, pick[..., None], axis=-1)[..., 0]

    slot = jnp.where(sample_valid, slot, n)           # n = dropped
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
    """Screen-space lookup (ref SHARCQuery.hlsl): PROBES gathers, first key
    match wins. Returns (radiance, hit)."""
    n = cache.key.shape[0]
    key = _cell_key(pos, normal, cam_pos)
    cand = _probe_slots(key, n)
    ck = cache.key[cand]
    live = cache.age[cand] < 2.0 * STALE_FRAMES
    m = (ck == key[..., None]) & live                 # (..., PROBES)
    first = jnp.argmax(m, axis=-1)
    slot = jnp.take_along_axis(cand, first[..., None], axis=-1)[..., 0]
    hit = jnp.any(m, axis=-1)
    rad = cache.radiance[slot]
    return jnp.where(hit[..., None], rad, 0.0), hit
