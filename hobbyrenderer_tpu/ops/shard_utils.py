"""Row-band sharding helpers for screen-space passes (SURVEY.md §5.8).

The multi-chip frame shards the framebuffer by tile rows (parallel/frame.py).
Screen-space passes whose taps reach outside the band (ReSTIR spatial reuse,
A-trous, TAA reprojection) get their neighborhoods through a ppermute HALO
EXCHANGE: each device sends its boundary rows to the adjacent devices over ICI
and operates on a (halo + h + halo) extended domain. Taps farther than the halo
clamp to the exchanged rows (the approximation is exact whenever the tap radius
<= halo).

Single-chip callers pass shard=None and every helper degenerates to the
full-frame path with zero overhead."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RowShard(NamedTuple):
    """Static-per-trace description of this device's row band."""

    axis: str      # mesh axis name
    n: int         # number of devices on the axis
    y0: jnp.ndarray  # first global row of this band (traced, from axis_index)
    shard_h: int   # rows per band
    full_h: int    # total framebuffer rows


def make_row_shard(axis: str, n: int, shard_h: int) -> RowShard:
    """Build the RowShard inside a shard_map body."""
    idx = jax.lax.axis_index(axis)
    return RowShard(axis=axis, n=n, y0=idx * shard_h, shard_h=shard_h,
                    full_h=n * shard_h)


def extend_rows(x: jnp.ndarray, halo: int, shard: RowShard | None):
    """(h, w, ...) -> (h + 2*halo, w, ...) with neighbor boundary rows.

    Under a RowShard, the halos come from adjacent devices via two ppermutes
    (global-edge halos arrive as ppermute's zero fill — unreachable as long as
    callers clamp global rows to [0, full_h)). Without a shard, the array is
    edge-padded so the same indexing arithmetic applies."""
    if halo == 0:
        return x
    if shard is None or shard.n == 1:
        top = jnp.repeat(x[:1], halo, axis=0)
        bot = jnp.repeat(x[-1:], halo, axis=0)
        return jnp.concatenate([top, x, bot], axis=0)
    # a neighbor can contribute at most its own band height; taps farther than
    # that clamp to the farthest exchanged row (edge-replication below)
    take = min(halo, x.shape[0])
    fwd = [(i, i + 1) for i in range(shard.n - 1)]
    bwd = [(i + 1, i) for i in range(shard.n - 1)]
    from_above = jax.lax.ppermute(x[-take:], shard.axis, fwd)
    from_below = jax.lax.ppermute(x[:take], shard.axis, bwd)
    ext = jnp.concatenate([from_above, x, from_below], axis=0)
    if take < halo:
        pad = halo - take
        widths = ((pad, pad),) + ((0, 0),) * (x.ndim - 1)
        ext = jnp.pad(ext, widths, mode="edge")
    return ext


def ext_row_index(gy, halo: int, shard: RowShard | None, h: int):
    """Global row index -> row index into an extend_rows() result.

    gy is clamped to the framebuffer, then to the reachable extended range."""
    full_h = shard.full_h if shard is not None else h
    y0 = shard.y0 if shard is not None else 0
    gy = jnp.clip(gy, 0, full_h - 1)
    return jnp.clip(gy - y0 + halo, 0, h + 2 * halo - 1)


def global_y0(shard: RowShard | None):
    return 0 if shard is None else shard.y0


def full_height(shard: RowShard | None, h: int) -> int:
    return h if shard is None else shard.full_h
