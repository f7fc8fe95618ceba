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
    # parent boxes contain child boxes (reconstruct node boxes from child rows)
    L = bvh.num_leaves
    cb = np.asarray(bvh.child_boxes).reshape(-1, 2, 6)

    def node_box(i):
        if i == 0:
            return root_lo, root_hi
        p, side = (i - 1) // 2, (i - 1) % 2
        return cb[p, side, :3], cb[p, side, 3:]

    for i in range(L - 1):
        lo_i, hi_i = node_box(i)
        for side, c in ((0, 2 * i + 1), (1, 2 * i + 2)):
            clo, chi = cb[i, side, :3], cb[i, side, 3:]
            if (clo > chi).any():
                continue  # empty (inverted) child box
            assert (lo_i <= clo + 1e-5).all()
            assert (hi_i >= chi - 1e-5).all()
    # leaf rows reference valid triangle ids
    tids = np.asarray(bvh.leaf_rows).reshape(L, -1, 10)[..., 9]
    valid_ids = tids[tids >= 0].astype(np.int64)
    assert sorted(valid_ids.tolist()) == list(range(tris.shape[0]))


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
