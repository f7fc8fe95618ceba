"""BVH build + traversal invariants (SURVEY.md §4: BVH build invariants), verified
against brute-force intersection."""

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops.intersect import INF, ray_triangle


def _random_tris(rng, n, spread=4.0):
    base = (rng.random((n, 1, 3)) - 0.5) * spread
    verts = base + (rng.random((n, 3, 3)) - 0.5) * 0.6
    return verts.astype(np.float32)


@jax.jit
def _brute_force_jit(tris, o, d):
    t, u, v, hit, front = ray_triangle(o[:, None, :], d[:, None, :],
                                       tris[None, :, 0], tris[None, :, 1],
                                       tris[None, :, 2])  # (R, T)
    t = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t, axis=1)
    t_best = jnp.take_along_axis(t, best[:, None], 1)[:, 0]
    id_best = jnp.where(jnp.isfinite(t_best), best, -1)
    return t_best, id_best


def _brute_force(tris, o, d):
    t, i = _brute_force_jit(jnp.asarray(tris), jnp.asarray(o), jnp.asarray(d))
    return np.asarray(t), np.asarray(i)


_closest = jax.jit(bvhops.bvh_closest_hit)
_anyhit = jax.jit(bvhops.bvh_any_hit)


def test_bvh_bounds_contain_triangles(rng):
    tris = _random_tris(rng, 100)
    bvh = bvhops.build_bvh(tris, device_put=False)
    # root bounds contain everything
    root_lo, root_hi = np.asarray(bvh.root_box[:3]), np.asarray(bvh.root_box[3:])
    assert (root_lo - 1e-4 <= tris.reshape(-1, 3).min(0)).all()
    assert (root_hi + 1e-4 >= tris.reshape(-1, 3).max(0)).all()

    L = bvh.num_leaves
    I = bvh.n_interior
    table = np.asarray(bvh.table)

    def node_box(q):
        """AABB of node q as stored in its PARENT's row (root: root_box)."""
        if q == 0:
            return root_lo, root_hi
        p, c = (q - 1) // 4, (q - 1) % 4
        return table[p, 6 * c:6 * c + 3], table[p, 6 * c + 3:6 * c + 6]

    for q in range(I + L):
        lo_q, hi_q = node_box(q)
        if (lo_q > hi_q).any():
            continue                       # empty (inverted) node
        if q < I:
            # interior: each child's stored box is contained in this node's box
            for c in range(4):
                clo = table[q, 6 * c:6 * c + 3]
                chi = table[q, 6 * c + 3:6 * c + 6]
                if (clo > chi).any():
                    continue
                assert (lo_q <= clo + 1e-5).all()
                assert (hi_q >= chi - 1e-5).all()
        else:
            # leaf: every triangle record lies inside the leaf's box
            recs = table[q].reshape(-1, 10)
            for rec in recs:
                if rec[9] < 0:
                    continue
                v0, e1, e2 = rec[0:3], rec[3:6], rec[6:9]
                vs = np.stack([v0, v0 + e1, v0 + e2])
                assert (lo_q - 1e-4 <= vs.min(0)).all()
                assert (hi_q + 1e-4 >= vs.max(0)).all()
    # leaf slots reference each triangle exactly once
    valid_ids = np.asarray(bvh.order)
    valid_ids = valid_ids[valid_ids >= 0]
    assert sorted(valid_ids.tolist()) == list(range(tris.shape[0]))


def test_bvh_refit_matches_rebuild(rng):
    """Moving triangles + refit == traversal-correct (boxes still bound)."""
    tris = _random_tris(rng, 150)
    bvh = bvhops.build_bvh(tris)
    moved = tris + np.asarray([0.7, -0.3, 0.2], np.float32)
    moved[:50] *= 1.5
    refit = bvhops.refit_bvh(bvh, jnp.asarray(moved))
    R = 96
    o = (rng.random((R, 3)).astype(np.float32) - 0.5) * 10.0
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = _closest(refit, jnp.asarray(o), jnp.asarray(d))
    t_ref, id_ref = _brute_force(moved, o, d)
    same_hit = (id_ref >= 0) == (np.asarray(hit.tri) >= 0)
    assert same_hit.all()
    both = id_ref >= 0
    np.testing.assert_allclose(np.asarray(hit.t)[both], t_ref[both],
                               rtol=1e-3, atol=1e-4)


def test_bvh_matches_bruteforce(rng):
    tris = _random_tris(rng, 200)
    bvh = bvhops.build_bvh(tris)
    R = 128
    o = (rng.random((R, 3)).astype(np.float32) - 0.5) * 10.0
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = _closest(bvh, jnp.asarray(o), jnp.asarray(d))
    t_ref, id_ref = _brute_force(tris, o, d)
    t_got = np.asarray(hit.t)
    id_got = np.asarray(hit.tri)
    same_hit = (id_ref >= 0) == (id_got >= 0)
    assert same_hit.all(), f"{(~same_hit).sum()} rays disagree on hit/miss"
    both = id_ref >= 0
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=1e-3, atol=1e-4)
    # ids can differ only for coplanar ties; depths must agree
    frac_id_same = (id_got[both] == id_ref[both]).mean() if both.any() else 1.0
    assert frac_id_same > 0.98


def test_bvh_any_hit(rng):
    tris = _random_tris(rng, 64)
    bvh = bvhops.build_bvh(tris)
    R = 64
    o = (rng.random((R, 3)).astype(np.float32) - 0.5) * 10.0
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_ref, id_ref = _brute_force(tris, o, d)
    occ = np.asarray(_anyhit(bvh, jnp.asarray(o), jnp.asarray(d)))
    np.testing.assert_array_equal(occ, id_ref >= 0)
    # with t_max before the hit, no occlusion
    tm = np.where(np.isfinite(t_ref), t_ref * 0.5, 1e-3).astype(np.float32)
    occ2 = np.asarray(_anyhit(bvh, jnp.asarray(o), jnp.asarray(d),
                              t_max=jnp.asarray(tm)))
    assert not occ2.any()


def test_single_triangle():
    tris = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    bvh = bvhops.build_bvh(tris)
    o = jnp.asarray([[0.2, 0.2, 1.0], [5.0, 5.0, 1.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    hit = _closest(bvh, o, d)
    assert hit.tri[0] == 0 and abs(hit.t[0] - 1.0) < 1e-5
    assert hit.tri[1] == -1


def test_scene_rt_refit_matches_rebuild():
    """Moving an instance + refit_scene_rt == rebuilding the RT snapshot
    (the dynamic-TLAS correctness contract, ref src/Scene.cpp:67-214)."""
    from hobbyrenderer_tpu.scene.procedural import make_default_cube_scene
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu, \
        update_instance_transforms
    from hobbyrenderer_tpu.models.pathtracer import (build_scene_rt,
                                                     refit_scene_rt)

    scene = make_default_cube_scene()
    gpu = build_scene_gpu(scene)
    rt0 = build_scene_rt(scene, gpu)

    # move the first instance's node and refresh world transforms
    n = scene.instances[0].node
    scene.nodes[n].translation = scene.nodes[n].translation + \
        np.asarray([0.6, 0.25, -0.4], np.float32)
    scene.compute_world_transforms()
    scene.dirty_instances.add(0)
    gpu = update_instance_transforms(gpu, scene)

    refit = refit_scene_rt(rt0, gpu.inst_transform)
    rebuilt = build_scene_rt(scene, gpu)

    rng = np.random.default_rng(3)
    R = 128
    o = (rng.random((R, 3)).astype(np.float32) - 0.5) * 8.0
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h_refit = _closest(refit.bvh, jnp.asarray(o), jnp.asarray(d))
    h_new = _closest(rebuilt.bvh, jnp.asarray(o), jnp.asarray(d))
    # hit/miss and depths agree (tri ids may differ: rebuild re-sorts)
    np.testing.assert_array_equal(np.asarray(h_refit.tri >= 0),
                                  np.asarray(h_new.tri >= 0))
    both = np.asarray(h_new.tri >= 0)
    np.testing.assert_allclose(np.asarray(h_refit.t)[both],
                               np.asarray(h_new.t)[both], rtol=1e-3, atol=1e-3)
