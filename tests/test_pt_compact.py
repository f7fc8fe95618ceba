"""Per-bounce wavefront compaction in the path tracer (trace_paths): the
compacted estimator must agree with the full-width scan path.

With capacities that do not bind (live paths < 0.8*cap — the cube scene's
open view kills most paths at the first miss), the capacity-RR keeps every
path (p_keep == 1) and the compacted walk computes the IDENTICAL estimator;
only float reassociation from the packed gather + scatter-add differs."""

import numpy as np
import jax.numpy as jnp

import hobbyrenderer_tpu.models.pathtracer as ptmod
from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.scene import Camera, make_default_cube_scene
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu


def test_compacted_pt_matches_full_width(monkeypatch):
    W, H = 64, 32
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    rt = ptmod.build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()

    ref = np.asarray(ptmod.trace_paths(gpu, rt, vc, settings, H, W,
                                       jnp.int32(3), max_bounces=5))
    assert ptmod.COMPACT_MIN_LANES > H * W      # ref ran the scan path

    monkeypatch.setattr(ptmod, "COMPACT_MIN_LANES", 1024)
    monkeypatch.setattr(ptmod, "COMPACT_MIN_CAP", 256)
    got = np.asarray(ptmod.trace_paths(gpu, rt, vc, settings, H, W,
                                       jnp.int32(3), max_bounces=5))
    err = np.abs(ref - got).max()
    assert err < 1e-4, f"compacted PT diverges: max abs {err}"
    assert np.isfinite(got).all()
