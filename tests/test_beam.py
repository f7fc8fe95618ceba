"""Beam (tile-packet) BVH occlusion vs the reference wavefront traversal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyrenderer_tpu.ops import beam as beamops
from hobbyrenderer_tpu.ops import bvh as bvhops


def _tri_soup(n, seed=0, spread=4.0, size=0.5):
    rng = np.random.default_rng(seed)
    c = (rng.random((n, 1, 3), np.float32) - 0.5) * spread
    v = c + (rng.random((n, 3, 3), np.float32) - 0.5) * size
    return v.astype(np.float32)


def _coherent_rays(H, W, seed=1):
    """Sun-shadow-like rays: origins on a jittered grid plane, one direction."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(-2.5, 2.5, W, dtype=np.float32)
    ys = np.linspace(-2.5, 2.5, H, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    o = np.stack([gx, np.full_like(gx, -2.0), gy], -1)
    o += rng.random(o.shape).astype(np.float32) * 0.02
    d = np.broadcast_to(np.asarray([0.08, 0.95, -0.2], np.float32), o.shape)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.copy())


def test_beam_matches_wavefront_any_hit():
    H = W = 64           # 2x2 tiles
    tris = _tri_soup(900)
    bvh = bvhops.build_bvh(tris)
    btable = jnp.asarray(beamops.beam_table(np.asarray(bvh.table)))
    o, d = _coherent_rays(H, W)
    t_max = jnp.full((H, W), 50.0)
    active = jnp.ones((H, W), bool)

    interp = jax.default_backend() != "tpu"
    occ_beam = beamops.beam_any_hit(btable, o, d, t_max, active, H, W,
                                    interpret=interp)
    occ_ref = bvhops.bvh_any_hit(bvh, o.reshape(-1, 3), d.reshape(-1, 3),
                                 t_max=t_max.reshape(-1)).reshape(H, W)
    occ_beam = np.asarray(occ_beam)
    occ_ref = np.asarray(occ_ref)
    assert occ_ref.any() and not occ_ref.all(), "degenerate test scene"
    assert (occ_beam == occ_ref).all(), \
        f"beam mismatch at {np.argwhere(occ_beam != occ_ref)[:5]}"


def test_beam_inactive_and_tmax():
    H = W = 32
    tris = _tri_soup(200)
    bvh = bvhops.build_bvh(tris)
    btable = jnp.asarray(beamops.beam_table(np.asarray(bvh.table)))
    o, d = _coherent_rays(H, W, seed=3)
    interp = jax.default_backend() != "tpu"
    # inactive rays never report occlusion
    occ = beamops.beam_any_hit(btable, o, d, jnp.full((H, W), 50.0),
                               jnp.zeros((H, W), bool), H, W,
                               interpret=interp)
    assert not np.asarray(occ).any()
    # t_max = 0 -> no hits
    occ = beamops.beam_any_hit(btable, o, d, jnp.zeros((H, W)),
                               jnp.ones((H, W), bool), H, W,
                               interpret=interp)
    assert not np.asarray(occ).any()


def test_beam_mixed_directions():
    """Per-pixel jittered directions (cone-sampled sun analogue)."""
    H = W = 32
    tris = _tri_soup(400, seed=7)
    bvh = bvhops.build_bvh(tris)
    btable = jnp.asarray(beamops.beam_table(np.asarray(bvh.table)))
    o, d = _coherent_rays(H, W, seed=5)
    rng = np.random.default_rng(11)
    d = np.asarray(d) + rng.normal(0, 0.05, d.shape).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    t_max = jnp.full((H, W), 50.0)
    active = jnp.ones((H, W), bool)
    interp = jax.default_backend() != "tpu"
    occ_beam = beamops.beam_any_hit(btable, o, d, t_max, active, H, W,
                                    interpret=interp)
    occ_ref = bvhops.bvh_any_hit(bvh, o.reshape(-1, 3), d.reshape(-1, 3),
                                 t_max=t_max.reshape(-1)).reshape(H, W)
    assert (np.asarray(occ_beam) == np.asarray(occ_ref)).all()


def test_beam_sign_flipping_directions_stay_conservative():
    """Regression (review finding): when a tile's ray directions flip sign on
    an axis (point-light winner rays), the box test must stay conservative —
    the old origin-slab-only cull skipped occluders the rays travel into."""
    H = W = 32                         # one tile
    # occluder wall far from the origins along +x
    wall = np.asarray([[[5.0, -3, -3], [5.0, 3, -3], [5.0, 0, 3]]],
                      np.float32)
    # decoy geometry near the origin so the BVH has >1 node
    tris = np.concatenate([wall, _tri_soup(64, seed=2, spread=1.0)], 0)
    bvh = bvhops.build_bvh(tris)
    btable = jnp.asarray(beamops.beam_table(np.asarray(bvh.table)))
    rng = np.random.default_rng(4)
    o = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))  # x in [0,1]
    # directions point mostly +x for half the tile, -x for the other half:
    # dlo < 0 < dhi on x -> the mixed-sign path is exercised
    dx = np.where(np.arange(W)[None, :] < W // 2, 0.995, -0.995)
    d = np.stack([np.broadcast_to(dx, (H, W)),
                  np.full((H, W), 0.0995), np.zeros((H, W))], -1)
    d = jnp.asarray((d / np.linalg.norm(d, axis=-1, keepdims=True))
                    .astype(np.float32))
    t_max = jnp.full((H, W), 50.0)
    active = jnp.ones((H, W), bool)
    interp = jax.default_backend() != "tpu"
    occ_beam = beamops.beam_any_hit(btable, o, d, t_max, active, H, W,
                                    interpret=interp)
    occ_ref = bvhops.bvh_any_hit(bvh, o.reshape(-1, 3), d.reshape(-1, 3),
                                 t_max=t_max.reshape(-1)).reshape(H, W)
    occ_beam = np.asarray(occ_beam)
    occ_ref = np.asarray(occ_ref)
    # the +x half must see the wall
    assert occ_ref[:, :W // 2].mean() > 0.5, "scene setup broken"
    assert (occ_beam == occ_ref).all(), \
        f"mismatch: beam {occ_beam[:, :W // 2].mean():.2f} vs " \
        f"ref {occ_ref[:, :W // 2].mean():.2f} on the +x half"


def test_beam_overflow_flag():
    """The frontier-overflow flag: normal scenes report zero overflow; the
    flag rides the second kernel output."""
    H = W = 32
    tris = _tri_soup(400, seed=8)
    bvh = bvhops.build_bvh(tris)
    btable = jnp.asarray(beamops.beam_table(np.asarray(bvh.table)))
    o, d = _coherent_rays(H, W, seed=6)
    interp = jax.default_backend() != "tpu"
    occ, n_ovf = beamops.beam_any_hit(btable, o, d, jnp.full((H, W), 50.0),
                                      jnp.ones((H, W), bool), H, W,
                                      interpret=interp, return_overflow=True)
    assert int(np.asarray(n_ovf)) == 0
    assert np.asarray(occ).any()


def test_tile_majority_mask():
    """The modal-winner split helper: each 32x32 tile's majority-key lanes
    are selected; stragglers (and lanes in pad-dominated edge tiles) are not."""
    H, W = 40, 64  # 2x2 tile grid with a 8-row pad band on the bottom tiles
    key = np.zeros((H, W), np.int32)
    key[:32, :32] = 7          # uniform tile -> all match
    key[:32, 32:] = 3
    key[5, 40] = 9             # one straggler in an otherwise-uniform tile
    key[32:, :] = 11           # bottom tiles: 8 real rows vs 24 pad rows
    m = np.asarray(beamops.tile_majority_mask(jnp.asarray(key), H, W))
    assert m[:32, :32].all()
    assert not m[5, 40] and m[6, 40] and m[:32, 32:].sum() == 32 * 32 - 1
    # pad rows (key -2^30) outnumber real rows in the bottom tiles: the
    # conservative outcome routes ALL real lanes to the straggler path
    assert not m[32:, :].any()


def test_tile_majority_mask_exclude():
    """exclude= routes the sentinel away from the modal election: a tile
    whose lanes are mostly -1 (done / not shooting) still elects its REAL
    modal winner, and sentinel lanes never match."""
    H, W = 32, 64
    key = np.full((H, W), -1, np.int32)
    key[::3, :32] = 5          # sparse real winners in tile 0 (~1/3 of lanes)
    key[0, 32:] = 4            # tile 1: a single real-winner row
    m = np.asarray(beamops.tile_majority_mask(jnp.asarray(key), H, W,
                                              exclude=-1))
    assert m[::3, :32].all() and not m[1::3, :32].any()
    assert m[0, 32:].all() and not m[1:, 32:].any()
    # without exclude, the sentinel wins both tiles and every lane "matches"
    m0 = np.asarray(beamops.tile_majority_mask(jnp.asarray(key), H, W))
    assert not (m0[::3, :32].all() and m0[0, 32:].all())
