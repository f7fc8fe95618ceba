"""Deterministic shading RNG.

Reference: src/shaders/RNG.hlsli:9-38 — a PCG hash seeded per-pixel per accumulation
index, giving deterministic progressive accumulation (the property the golden-image
tests rely on, SURVEY.md §4).

TPU design: stateless counter-based PCG (pcg4d-style mixing) implemented with uint32
jnp ops — fully vectorized across pixels, no sequential state. Each sample dimension
advances a lane of the counter, so (pixel, frame, dim) -> u32 is a pure function.
"""

from __future__ import annotations

import jax.numpy as jnp


def pcg_hash(x):
    """PCG output function on uint32 (ref RNG.hlsli PCG)."""
    x = x.astype(jnp.uint32)
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> 22) ^ word


def pcg3d(v):
    """pcg3d (Jarzynski & Olano) — mixes a (..., 3) uint32 vector."""
    v = v.astype(jnp.uint32)
    v = v * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return jnp.stack([x, y, z], axis=-1)


def uniform_from_bits(bits):
    """uint32 -> float32 in [0, 1)."""
    return bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


class SampleStream:
    """Per-pixel deterministic sample stream.

    rng = SampleStream(pixel_index, frame_index); u = rng.next1(); uv = rng.next2()
    Dimension counter makes consecutive draws independent, matching the reference's
    incrementing PCG state (RNG.hlsli:21-27) while staying stateless across pixels.
    """

    def __init__(self, pixel_index, frame_index):
        self.pix = jnp.asarray(pixel_index).astype(jnp.uint32)
        self.frame = jnp.asarray(frame_index).astype(jnp.uint32)
        self.dim = 0

    def _draw(self):
        d = jnp.uint32(self.dim)
        self.dim += 1
        v = jnp.stack([jnp.broadcast_to(self.pix, self.pix.shape),
                       jnp.broadcast_to(self.frame, self.pix.shape),
                       jnp.broadcast_to(d, self.pix.shape)], axis=-1)
        return pcg3d(v)

    def next1(self):
        return uniform_from_bits(self._draw()[..., 0])

    def next2(self):
        b = self._draw()
        return jnp.stack([uniform_from_bits(b[..., 0]),
                          uniform_from_bits(b[..., 1])], axis=-1)

    def next3(self):
        b = self._draw()
        return uniform_from_bits(b)
