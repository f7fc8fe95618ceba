"""Pallas tile-raster kernel vs the XLA reference formulation.

Runs the kernel in interpreter mode on the CPU backend (tests/conftest.py
forces JAX_PLATFORMS=cpu); on TPU the same code path compiles via Mosaic."""

import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.scene import make_default_cube_scene, make_stress_scene
from hobbyrenderer_tpu.scene.camera import Camera
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu


def _raster_both(scene, w, h, depth_only=False):
    gpu = build_scene_gpu(scene)
    cam = Camera(None, w, h)
    cam.position = scene.center + np.asarray([0.6, 0.5, 1.2], np.float32) * scene.radius * 1.5
    cam.look_at(scene.center)
    vc = cam.view_constants(0)
    cull = cullops.cull_pairs(gpu, vc, alpha_mask=jnp.asarray([True, True, False]))
    slots, _ = cullops.compact_mask(cull["mask"], int(gpu.lod0_pair_capacity))
    oa, _ = rasterops.rasterize(gpu, vc, slots, w, h, backend="xla",
                                depth_only=depth_only)
    ob, _ = rasterops.rasterize(gpu, vc, slots, w, h, backend="pallas",
                                depth_only=depth_only)
    return oa, ob


def test_pallas_matches_xla_cube():
    oa, ob = _raster_both(make_default_cube_scene(), 128, 96)
    assert np.allclose(np.asarray(oa.depth), np.asarray(ob.depth), atol=1e-4)
    # winner ids may differ only where triangles tie within MXU rounding
    mismatch = np.mean(np.asarray(oa.visid) != np.asarray(ob.visid))
    assert mismatch < 0.01, mismatch
    assert int((np.asarray(ob.visid) >= 0).sum()) > 100  # actually drew pixels


def test_pallas_matches_xla_stress_depth_only():
    oa, ob = _raster_both(make_stress_scene(grid=3), 160, 128, depth_only=True)
    assert np.allclose(np.asarray(oa.depth), np.asarray(ob.depth), atol=1e-4)
    cov_a = np.asarray(oa.depth) > 0
    cov_b = np.asarray(ob.depth) > 0
    assert np.mean(cov_a != cov_b) < 0.01
