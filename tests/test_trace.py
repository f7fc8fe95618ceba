"""Sorted-block closest-hit traversal (ops/trace.py) vs the wavefront walk."""

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.ops import beam as beamops
from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import trace as traceops


def _tri_soup(n, seed=0, spread=4.0, size=0.5):
    rng = np.random.default_rng(seed)
    c = (rng.random((n, 1, 3), np.float32) - 0.5) * spread
    v = c + (rng.random((n, 3, 3), np.float32) - 0.5) * size
    return v.astype(np.float32)


def _incoherent_rays(R, seed=1, spread=3.0):
    """GI-bounce-like rays: random origins inside the scene, random dirs."""
    rng = np.random.default_rng(seed)
    o = (rng.random((R, 3), np.float32) - 0.5) * spread
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _setup(n_tris=700, seed=0):
    tris = _tri_soup(n_tris, seed=seed)
    bvh = bvhops.build_bvh(tris)
    btable = jnp.asarray(beamops.beam_table(np.asarray(bvh.table)))
    return bvh, btable


INTERP = jax.default_backend() != "tpu"


def test_trace_closest_matches_wavefront():
    bvh, btable = _setup()
    o, d = _incoherent_rays(1500)
    got = traceops.trace_closest(btable, bvh.root_box, o, d, interpret=INTERP)
    ref = bvhops.bvh_closest_hit(bvh, o, d)
    got_tri, ref_tri = np.asarray(got.tri), np.asarray(ref.tri)
    assert (ref_tri >= 0).any() and (ref_tri < 0).any(), "degenerate scene"
    assert (got_tri == ref_tri).all(), \
        f"tri mismatch on {np.mean(got_tri != ref_tri):.3f} of rays"
    hit = ref_tri >= 0
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(ref.t)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.u)[hit], np.asarray(ref.u)[hit],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.v)[hit], np.asarray(ref.v)[hit],
                               rtol=1e-3, atol=1e-4)
    assert (np.asarray(got.front)[hit] == np.asarray(ref.front)[hit]).all()
    assert (np.asarray(got.t)[~hit] >= 1e30).all()   # miss sentinel (ops INF)


def test_trace_closest_active_and_tmax():
    bvh, btable = _setup(300, seed=2)
    o, d = _incoherent_rays(600, seed=3)
    # inactive lanes report miss
    act = jnp.zeros(600, bool)
    got = traceops.trace_closest(btable, bvh.root_box, o, d, active=act,
                                 interpret=INTERP)
    assert (np.asarray(got.tri) == -1).all()
    # t_max clips hits
    ref = bvhops.bvh_closest_hit(bvh, o, d)
    tcap = jnp.full((600,), 0.8)
    got = traceops.trace_closest(btable, bvh.root_box, o, d, t_max=tcap,
                                 interpret=INTERP)
    ref_hit = (np.asarray(ref.tri) >= 0) & (np.asarray(ref.t) < 0.8)
    got_hit = np.asarray(got.tri) >= 0
    assert (got_hit == ref_hit).all()


def test_trace_any_hit_matches_wavefront():
    bvh, btable = _setup(500, seed=5)
    o, d = _incoherent_rays(1200, seed=6)
    t_max = jnp.full((1200,), 2.5)
    got = traceops.trace_any_hit(btable, bvh.root_box, o, d, t_max=t_max,
                                 interpret=INTERP)
    ref = bvhops.bvh_any_hit(bvh, o, d, t_max=t_max)
    got, ref = np.asarray(got), np.asarray(ref)
    assert ref.any() and not ref.all(), "degenerate scene"
    assert (got == ref).all()


def test_coherence_sort_roundtrip():
    """pack -> unpack is the identity on ray payloads (permutation inverse)."""
    bvh, btable = _setup(100, seed=7)
    o, d = _incoherent_rays(2000, seed=8)
    payload = jnp.arange(2000, dtype=jnp.float32)
    t_max = jnp.full((2000,), 1.0)
    act = jnp.ones((2000,), bool)
    rays, order = traceops.pack_rays_sorted(o, d, t_max, act, bvh.root_box)
    assert rays.shape == (2, 8, traceops.PIX)
    sorted_padded = jnp.pad(payload[order], (0, 2 * traceops.PIX - 2000))
    back = traceops.unpack_sorted(
        sorted_padded.reshape(-1, traceops.PIX), order, 2000)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(payload))
