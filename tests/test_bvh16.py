"""16-wide BVH (ops/bvh16): exact agreement with the 4-ary reference walk.

The 16-ary table is the TPU incoherent-ray fast path (VERDICT-r2 item 2);
these tests pin closest-hit/any-hit exactness against ops/bvh.py (which is
itself golden-gated against brute force elsewhere), refit correctness, and
the pad/empty-leaf edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import bvh16 as b16
from hobbyrenderer_tpu.ops.intersect import INF


def _random_tris(n, seed=0, spread=10.0, size=0.5):
    rng = np.random.default_rng(seed)
    base = (rng.random((n, 1, 3), np.float32) - 0.5) * spread
    offs = (rng.random((n, 3, 3), np.float32) - 0.5) * size
    return (base + offs).astype(np.float32)


def _random_rays(n, seed=1, spread=12.0):
    rng = np.random.default_rng(seed)
    o = ((rng.random((n, 3)) - 0.5) * spread).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("mxu", [False, True])
@pytest.mark.parametrize("T,size", [(5, 4.0), (60, 2.0), (3000, 0.5)])
def test_closest_hit_matches_4ary(T, size, mxu):
    tris = _random_tris(T, seed=T, size=size)
    bvh4 = bvhops.build_bvh(tris)
    bvh = b16.build_bvh16(tris)
    o, d = _random_rays(2048, seed=T + 1)
    rec4 = jax.jit(lambda o, d: bvhops.bvh_closest_hit(bvh4, o, d))(o, d)
    rec = jax.jit(lambda o, d: b16.bvh16_closest_hit(bvh, o, d,
                                                     mxu=mxu))(o, d)
    t4, t16 = np.asarray(rec4.t), np.asarray(rec.t)
    # same hit distance everywhere (tri ids may differ on exact ties)
    np.testing.assert_allclose(np.where(np.isfinite(t16), t16, -1),
                               np.where(np.isfinite(t4), t4, -1),
                               rtol=1e-5, atol=1e-5)
    hit4 = np.asarray(rec4.tri) >= 0
    assert hit4.any(), "test setup broken: no ray hits anything"
    assert (hit4 == (np.asarray(rec.tri) >= 0)).all()
    same = np.asarray(rec.tri) == np.asarray(rec4.tri)
    assert same[hit4].mean() > 0.99   # ties are the only allowed disagreement
    np.testing.assert_allclose(np.asarray(rec.u)[same & hit4],
                               np.asarray(rec4.u)[same & hit4],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mxu", [False, True])
def test_any_hit_matches_4ary(mxu):
    tris = _random_tris(800, seed=7)
    bvh4 = bvhops.build_bvh(tris)
    bvh = b16.build_bvh16(tris)
    o, d = _random_rays(4096, seed=8)
    t_max = jnp.full((4096,), 4.0)
    occ4 = np.asarray(jax.jit(
        lambda o, d: bvhops.bvh_any_hit(bvh4, o, d, t_max=t_max))(o, d))
    occ = np.asarray(jax.jit(
        lambda o, d: b16.bvh16_any_hit(bvh, o, d, t_max=t_max,
                                       mxu=mxu))(o, d))
    np.testing.assert_array_equal(occ, occ4)
    assert occ.any() and not occ.all()


def test_t_max_respected():
    tris = _random_tris(100, seed=3)
    bvh = b16.build_bvh16(tris)
    o, d = _random_rays(512, seed=4)
    rec_far = b16.bvh16_closest_hit(bvh, o, d)
    t_ref = np.asarray(rec_far.t)
    cut = np.where(np.isfinite(t_ref), t_ref * 0.5, 1.0).astype(np.float32)
    rec_cut = b16.bvh16_closest_hit(bvh, o, d, t_max=jnp.asarray(cut))
    t_cut = np.asarray(rec_cut.t)
    hits = np.asarray(rec_cut.tri) >= 0
    assert (t_cut[hits] <= cut[hits] + 1e-6).all()
    # every cut hit must be a real (nearer) surface, not the far one
    assert (t_cut[hits] <= t_ref[hits] + 1e-6).all()


def test_refit_matches_rebuild():
    tris = _random_tris(500, seed=11)
    bvh = b16.build_bvh16(tris)
    moved = tris + np.asarray([0.5, -1.0, 2.0], np.float32)
    refit = b16.refit_bvh16(bvh, jnp.asarray(moved))
    rebuilt = b16.build_bvh16(moved)
    o, d = _random_rays(1024, seed=12)
    r1 = b16.bvh16_closest_hit(refit, o, d)
    r2 = b16.bvh16_closest_hit(rebuilt, o, d)
    hit1 = np.asarray(r1.tri) >= 0
    assert (hit1 == (np.asarray(r2.tri) >= 0)).all()
    np.testing.assert_allclose(np.asarray(r1.t)[hit1],
                               np.asarray(r2.t)[hit1], rtol=1e-5, atol=1e-5)


def test_single_leaf_scene():
    tris = _random_tris(3, seed=20, spread=1.0)     # fits one 12-tri leaf
    bvh = b16.build_bvh16(tris)
    assert bvh.n_interior == 0 and bvh.num_leaves == 1
    o = jnp.asarray(tris[:, 0] + np.asarray([0, 0, 5.0], np.float32))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (3, 3))
    c = tris.mean(1)
    o = jnp.asarray(c + np.asarray([0, 0, 5.0], np.float32))
    rec = b16.bvh16_closest_hit(bvh, o, d)
    assert (np.asarray(rec.tri) == np.arange(3)).all()


def test_scene_rt_carries_bvh16():
    """build_scene_rt exposes the 16-ary table; refit keeps it in sync."""
    from hobbyrenderer_tpu.models.pathtracer import (build_scene_rt,
                                                     refit_scene_rt)
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import make_default_cube_scene
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    assert rt.bvh16 is not None
    o, d = _random_rays(512, seed=30, spread=6.0)
    rec4 = bvhops.bvh_closest_hit(rt.bvh, o, d)
    rec = b16.bvh16_closest_hit(rt.bvh16, o, d)
    hit4 = np.asarray(rec4.tri) >= 0
    assert (hit4 == (np.asarray(rec.tri) >= 0)).all()
    t4, t16 = np.asarray(rec4.t), np.asarray(rec.t)
    np.testing.assert_allclose(t16[hit4], t4[hit4], rtol=1e-5, atol=1e-5)
    rt2 = refit_scene_rt(rt, gpu.inst_transform)
    rec_r = b16.bvh16_closest_hit(rt2.bvh16, o, d)
    np.testing.assert_allclose(np.asarray(rec_r.t)[hit4], t4[hit4],
                               rtol=1e-5, atol=1e-5)
