"""Hybrid Pallas/XLA bvh16 traversal (ops/wtrace.py) — exact agreement with
the pure-XLA walk (interpret mode on CPU; the TPU path runs the same kernel
compiled). Same conservative bf16 interior boxes + same descend/pop rules =>
identical results, not just statistically close."""

import numpy as np
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import bvh16 as b16
from hobbyrenderer_tpu.ops import wtrace as wt


def _soup(n=3000, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.random((n, 1, 3), np.float32) * 20.0 - 10.0
    tri = base + rng.normal(0, 0.35, (n, 3, 3)).astype(np.float32)
    return tri


def _rays(R, seed=5):
    rng = np.random.default_rng(seed)
    o = rng.random((R, 3), np.float32) * 22.0 - 11.0
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_wtrace_closest_matches_bvh16():
    bvh = b16.build_bvh16(_soup())
    assert bvh.depth >= 1
    o, d = _rays(2048)
    ref = b16.bvh16_closest_hit(bvh, o, d, mxu=False)
    got = wt.wtrace_closest_hit(bvh, o, d, interpret=True)
    r_tri = np.asarray(ref.tri)
    g_tri = np.asarray(got.tri)
    agree = (r_tri == g_tri).mean()
    assert agree == 1.0, f"tri agreement {agree:.4f}"
    rt = np.asarray(ref.t)
    gt = np.asarray(got.t)
    hit = r_tri >= 0
    assert np.allclose(rt[hit], gt[hit], rtol=1e-5, atol=1e-5)
    assert float(hit.mean()) > 0.15, "degenerate test: almost nothing hit"


def test_wtrace_any_hit_matches_bvh16():
    bvh = b16.build_bvh16(_soup(seed=9))
    o, d = _rays(2048, seed=11)
    tmax = jnp.full((2048,), 6.0)
    ref = np.asarray(b16.bvh16_any_hit(bvh, o, d, t_max=tmax, mxu=False))
    got = np.asarray(wt.wtrace_any_hit(bvh, o, d, t_max=tmax,
                                       interpret=True))
    assert (ref == got).all(), f"any-hit mismatch {np.mean(ref != got):.4f}"
    assert 0.05 < ref.mean() < 0.95, "degenerate occlusion mix"


def test_wtrace_partial_block():
    """R not a multiple of the block size: pad lanes must stay dead."""
    bvh = b16.build_bvh16(_soup(seed=4))
    o, d = _rays(700, seed=13)
    ref = b16.bvh16_closest_hit(bvh, o, d, mxu=False)
    got = wt.wtrace_closest_hit(bvh, o, d, interpret=True)
    assert (np.asarray(ref.tri) == np.asarray(got.tri)).all()
