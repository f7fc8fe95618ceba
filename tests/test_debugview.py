"""Debug-view suite (ref CSMDebug.hlsl modes + SSGIDebugMode/SHARCDebugMode
outputs, src/shaders/Common.sr:170-221): every named view renders.

Unit level: every view function produces a finite [0,1] image on synthetic
inputs. Integration: one CSM view and one SSGI view through the real graph.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbyrenderer_tpu.ops import debugview as dv
from hobbyrenderer_tpu.ops.csm import NUM_CASCADES, SHADOW_RES, CSMData

H, W = 32, 48


class _GB:
    def __init__(self):
        rng = np.random.default_rng(0)
        self.albedo = jnp.asarray(rng.random((H, W, 3), np.float32))
        n = rng.normal(size=(H, W, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        self.normal = jnp.asarray(n)
        self.geo_normal = self.normal
        self.orm = jnp.asarray(rng.random((H, W, 3), np.float32))
        self.world_pos = jnp.asarray(rng.random((H, W, 3), np.float32) * 10)
        self.depth = jnp.asarray(rng.random((H, W), np.float32))
        self.valid = jnp.asarray(rng.random((H, W)) > 0.2)
        self.material = jnp.where(self.valid, 0, -1)


def _vc():
    return {"view": jnp.eye(4), "camera_pos": jnp.zeros(3)}


def _csm():
    S = SHADOW_RES
    rng = np.random.default_rng(1)
    return CSMData(
        view_proj=jnp.asarray(np.stack([np.eye(4, dtype=np.float32) * 0.1
                                        for _ in range(NUM_CASCADES)])),
        depth=jnp.asarray(rng.random((NUM_CASCADES, S, S), np.float32)),
        splits=jnp.asarray([2.0, 5.0, 12.0, 30.0], jnp.float32))


def _check(img):
    a = np.asarray(img)
    assert a.shape == (H, W, 3)
    assert np.isfinite(a).all()
    assert a.min() >= -1e-5 and a.max() <= 1.0 + 1e-5


def test_all_csm_views():
    gb = _GB()
    ldr = jnp.zeros((H, W, 3), jnp.float32)
    mask = jnp.asarray(np.random.default_rng(2).random((H, W), np.float32))
    masked = gb.depth > 0.5
    for name in dv.CSM_VIEWS:
        img = dv.csm_view(name, ldr, gb, _csm(), _vc(), mask, masked=masked)
        _check(img)


def test_all_ssgi_views():
    gb = _GB()
    ldr = jnp.zeros((H, W, 3), jnp.float32)
    rng = np.random.default_rng(3)
    sh, sw = H // 2, W // 2
    dd = {
        "irr_half": jnp.asarray(rng.random((sh, sw, 3), np.float32)),
        "hit": jnp.asarray((rng.random((sh, sw)) > 0.5).astype(np.float32)),
        "ray_t": jnp.asarray(rng.random((sh, sw), np.float32)),
        "direct": jnp.asarray(rng.random((sh, sw, 3), np.float32)),
        "sky_eval": jnp.asarray(rng.random((sh, sw, 3), np.float32)),
        "temporal": jnp.asarray(rng.random((H, W, 3), np.float32)),
        "denoised": jnp.asarray(rng.random((H, W, 3), np.float32)),
        "age": jnp.asarray(rng.random((H, W), np.float32) * 32),
        "composed": jnp.asarray(rng.random((H, W, 3), np.float32)),
        "view_dir": gb.normal,
    }
    for name in dv.SSGI_VIEWS:
        _check(dv.ssgi_view(name, ldr, gb, dd))


def test_all_sharc_views():
    gb = _GB()
    ldr = jnp.zeros((H, W, 3), jnp.float32)
    rng = np.random.default_rng(4)
    dd = {
        "cell": jnp.asarray(rng.integers(0, 1 << 20, (H, W)), jnp.int32),
        "radiance": jnp.asarray(rng.random((H, W, 3), np.float32)),
        "hit": jnp.asarray((rng.random((H, W)) > 0.5).astype(np.float32)),
    }
    for name in dv.SHARC_VIEWS:
        _check(dv.sharc_view(name, ldr, gb, dd))


def test_heatmap_ramp_endpoints():
    h = np.asarray(dv.heatmap(jnp.asarray([0.0, 1.0])))
    assert np.allclose(h[0], [0, 0, 0], atol=1e-5)
    assert np.allclose(h[1], [1, 0, 0], atol=1e-5)


@pytest.mark.parametrize("view,kw", [
    ("csm_depth_compare", dict(mode="normal_basic", indirect_mode="none")),
    ("ssgi_hit_mask", dict(mode="normal_basic", indirect_mode="ssgi")),
])
def test_debug_view_end_to_end(view, kw):
    from hobbyrenderer_tpu.config import Config
    from hobbyrenderer_tpu.renderer import Renderer
    cfg = Config(scene="cube", width=64, height=48, debug_view=view,
                 direct_mode="simple", **kw)
    r = Renderer(cfg)
    ldr = np.asarray(r.render_frame())
    r.shutdown()
    assert ldr.shape == (48, 64, 3)
    assert ldr.dtype == np.uint8
    assert ldr.std() > 0          # the diagnostic actually drew something


def test_unknown_view_rejected():
    from hobbyrenderer_tpu.config import Config
    from hobbyrenderer_tpu.renderer import Renderer
    cfg = Config(scene="cube", width=64, height=48, mode="normal_basic",
                 debug_view="nope")
    with pytest.raises(ValueError, match="unknown --debug-view"):
        Renderer(cfg)
