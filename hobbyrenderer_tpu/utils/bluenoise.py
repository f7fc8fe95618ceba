"""Blue-noise texture generation (void-and-cluster, Ulichney 1993).

Reference capability: the vendored `LDR_RG01_0.png` blue-noise texture
(external/, consumed for sampling dither). Shipping a binary asset is replaced
by generating the texture at first use (cached in-process): void-and-cluster
with a wrap-around Gaussian energy via FFT — a 64x64 tile takes well under a
second on host numpy.

Blue noise trades white noise's low-frequency clumps for high-frequency
error that TAA/denoisers remove far better; `animate()` Cranley-Patterson-
rotates the tile per frame by the golden ratio so the temporal average stays
uniform (the spatiotemporal-blue-noise usage pattern)."""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=4)
def blue_noise(n: int = 64, seed: int = 0, sigma: float = 1.9) -> np.ndarray:
    """(n, n) f32 blue-noise ranks in [0, 1) — each texel a unique rank."""
    rng = np.random.default_rng(seed)
    N = n * n

    # wrap-around gaussian energy kernel in Fourier space
    x = np.arange(n)
    d = np.minimum(x, n - x).astype(np.float64)
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    kern = np.exp(-d2 / (2.0 * sigma * sigma))
    Fk = np.fft.rfft2(kern)

    def energy(mask):
        return np.fft.irfft2(np.fft.rfft2(mask) * Fk, s=(n, n))

    # initial pattern: 10% ones, relaxed so no tight clusters remain
    m = np.zeros(N, bool)
    m[rng.choice(N, N // 10, replace=False)] = True
    m = m.reshape(n, n)
    for _ in range(4 * N):
        e = energy(m.astype(np.float64))
        cluster = np.argmax(np.where(m, e, -np.inf))
        m.flat[cluster] = False
        e = energy(m.astype(np.float64))
        void = np.argmin(np.where(m, np.inf, e))
        if void == cluster:
            m.flat[cluster] = True
            break
        m.flat[void] = True

    rank = np.zeros((n, n), np.int64)
    # phase 1: remove ones tightest-cluster-first -> ranks count-1 .. 0
    work = m.copy()
    for r in range(int(m.sum()) - 1, -1, -1):
        e = energy(work.astype(np.float64))
        i = np.argmax(np.where(work, e, -np.inf))
        work.flat[i] = False
        rank.flat[i] = r
    # phase 2: fill zeros largest-void-first -> ranks count .. N-1
    work = m.copy()
    for r in range(int(m.sum()), N):
        e = energy(work.astype(np.float64))
        i = np.argmin(np.where(work, np.inf, e))
        work.flat[i] = True
        rank.flat[i] = r
    return ((rank.astype(np.float64) + 0.5) / N).astype(np.float32)


def animate(bn, frame, xp=None):
    """Cranley-Patterson rotation by the golden ratio: per-frame decorrelated,
    temporally uniform. bn (n, n); frame scalar (traced ok)."""
    if xp is None:
        import jax.numpy as xp
    g = 0.6180339887498949
    f = xp.asarray(frame).astype(xp.float32)
    return xp.mod(xp.asarray(bn) + f * g, 1.0)


def tile_for(bn, height: int, width: int, xp=None):
    """Tile the blue-noise texture over an (height, width) screen."""
    if xp is None:
        import jax.numpy as xp
    n = bn.shape[0]
    reps = (-(-height // n), -(-width // n))
    return xp.tile(xp.asarray(bn), reps)[:height, :width]
