"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4:
"multi-node without a cluster")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.models.deferred import DeferredRenderer
from hobbyrenderer_tpu.parallel import DeferredShardedRenderer, build_mesh
from hobbyrenderer_tpu.scene import Camera, make_default_cube_scene
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu


def test_mesh_has_8_devices():
    mesh = build_mesh()
    assert mesh.devices.size == 8, "conftest must provide 8 virtual devices"


def test_sharded_deferred_matches_single_device():
    """Row-sharded frame must equal the single-device frame (same math, psum'd
    histogram is identical to the global one)."""
    W, H = 96, 64  # 64 rows = 8 devices x 1 tile row of 8? TILE=32 -> need H % 256 == 0
    # with TILE=32 and 2 devices: H=64 works
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()

    single = DeferredRenderer(gpu, W, H)
    ldr_ref, _ = single.render(gpu, vc, settings)

    mesh = build_mesh(2)
    sharded = DeferredShardedRenderer(gpu, W, H, mesh=mesh)
    ldr_sh, _ = sharded.render(gpu, vc, settings)

    a = np.asarray(ldr_ref).astype(np.int32)
    b = np.asarray(ldr_sh).astype(np.int32)
    # identical math; allow off-by-one from non-determinism in reductions
    assert np.abs(a - b).max() <= 1, f"max diff {np.abs(a - b).max()}"


def test_sharded_8_devices_runs():
    W, H = 64, 256  # 256 rows = 8 devices x 32-row band
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    r = DeferredShardedRenderer(gpu, W, H, mesh=build_mesh(8))
    ldr, _ = r.render(gpu, vc, settings)
    ldr = np.asarray(ldr)
    assert ldr.shape == (H, W, 3)
    assert (ldr.sum(-1) > 0).mean() > 0.5  # sky everywhere at least
