"""Golden-image gate: the deferred rasterizer must agree with the path tracer
on a shared scene (the project's own acceptance metric — BASELINE.md targets
RMSE <= 1e-2 vs reference output; this gate starts looser and tightens as the
real-time approximations converge on the PT ground truth)."""

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.config import Config, RenderingMode
from hobbyrenderer_tpu.renderer import Renderer

W, H = 96, 64
# current gap: deferred NormalBasic approximates GI with SH-sky IBL ambient +
# CSM/contact shadows, PT integrates transport exactly. Measured ~0.11 RMSE on
# the cube scene; ratcheted down as quality work lands.
RMSE_GATE = 0.16
# flagship Normal mode (the benched config) vs PT, compared at FORCED LOD0:
# PT traces LOD0 geometry while the raster picks simplified LODs, and at this
# tiny test resolution the LOD silhouette error dominates lighting error
# (measured: RMSE 0.132 with LODs, 0.108 at LOD0 — same lighting). The gate
# is a LIGHTING gate; mesh-simplification quality is gated in test_native.
# History: r3 landed at 0.141/corr 0.72; sky-SH exitance at bounce hits +
# PT-consistent transparent compositing + LOD0 brought it to 0.108/0.806;
# r4 measures 0.1155 — AND establishes (scripts/diag_ptnoise.py) that the
# 48-spp PT reference itself carries a ~0.047 RMSE noise floor, i.e. ~0.05
# of this gate is reference variance, real error ~0.105. r4 ablations
# (scripts/diag_{golden,texlod}.py): the indirect-mode choice moves RMSE
# < 0.005 and texture LOD is NOT the gap (forced mip0 is WORSE) — the
# residual is broad-band direct/shadow/filter differences.
# Ratchet toward the 0.05 VERDICT-r2 target / 1e-2 BASELINE north star.
FLAGSHIP_RMSE_GATE = 0.12
FLAGSHIP_CORR_GATE = 0.78
# the same comparison at 256x192 (VERDICT-r3 #4: a gate the 96x64 pixel
# statistics cannot dominate); measured r4: 0.1239 / corr ~0.77
FLAGSHIP_HI_RMSE_GATE = 0.14
FLAGSHIP_HI_CORR_GATE = 0.74


def _render(mode, frames, scene="cube", **cfg_kw):
    cfg = Config(scene=scene, width=W, height=H, mode=mode,
                 cache_dir=".hr_cache_test", **cfg_kw)
    r = Renderer(cfg)
    r.camera.jitter_enabled = False
    ldr = None
    for _ in range(frames):
        ldr = r.render_frame(dt=0.0)   # dt=0: freeze animation for parity
    r.shutdown()
    return np.asarray(ldr).astype(np.float32) / 255.0


def test_deferred_matches_pathtracer_rmse():
    ref = _render(RenderingMode.PATH_TRACER, frames=24)   # 24 spp accumulated
    got = _render(RenderingMode.NORMAL_BASIC, frames=4)   # TAA settled
    assert ref.shape == got.shape
    rmse = float(np.sqrt(np.mean((ref - got) ** 2)))
    # also check the images are actually correlated (catches gross breakage
    # that a loose RMSE would let through)
    corr = float(np.corrcoef(ref.ravel(), got.ravel())[0, 1])
    assert rmse < RMSE_GATE, f"deferred vs PT RMSE {rmse:.4f} (gate {RMSE_GATE})"
    assert corr > 0.85, f"deferred vs PT decorrelated: r={corr:.3f}"


def test_flagship_matches_pathtracer():
    """The BENCHED mode — flagship Normal (ReSTIR DI + GI + traced specular +
    RELAX + TAA), converged over a static camera — against high-spp PT ground
    truth on a scene with emissive, glass AND textured materials (stress:4).
    This gates the config bench.py measures, not just NormalBasic-on-a-cube
    (BASELINE.md north star: RMSE <= 1e-2; tracked ratchet below)."""
    from hobbyrenderer_tpu.ops import culling
    old_err = culling.LOD_TARGET_PIXEL_ERROR
    culling.LOD_TARGET_PIXEL_ERROR = 1e-6   # LOD0: match PT's geometry
    try:
        ref = _render(RenderingMode.PATH_TRACER, frames=48, scene="stress:4")
        got = _render(RenderingMode.NORMAL, frames=24, scene="stress:4",
                      direct_mode="restir", indirect_mode="restir")
    finally:
        culling.LOD_TARGET_PIXEL_ERROR = old_err
    assert ref.shape == got.shape
    rmse = float(np.sqrt(np.mean((ref - got) ** 2)))
    corr = float(np.corrcoef(ref.ravel(), got.ravel())[0, 1])
    assert rmse < FLAGSHIP_RMSE_GATE, \
        f"flagship vs PT RMSE {rmse:.4f} (gate {FLAGSHIP_RMSE_GATE})"
    assert corr > FLAGSHIP_CORR_GATE, \
        f"flagship vs PT decorrelated: r={corr:.3f}"


def test_flagship_matches_pathtracer_256x192():
    """The flagship gate at 4x the pixel count (VERDICT-r3 #4) — same scene
    and config as test_flagship_matches_pathtracer, higher resolution so the
    metric isn't dominated by 96x64 pixel statistics."""
    global W, H
    from hobbyrenderer_tpu.ops import culling
    old_err = culling.LOD_TARGET_PIXEL_ERROR
    culling.LOD_TARGET_PIXEL_ERROR = 1e-6
    oldWH = (W, H)
    W, H = 256, 192
    try:
        ref = _render(RenderingMode.PATH_TRACER, frames=48, scene="stress:4")
        got = _render(RenderingMode.NORMAL, frames=24, scene="stress:4",
                      direct_mode="restir", indirect_mode="restir")
    finally:
        culling.LOD_TARGET_PIXEL_ERROR = old_err
        W, H = oldWH
    rmse = float(np.sqrt(np.mean((ref - got) ** 2)))
    corr = float(np.corrcoef(ref.ravel(), got.ravel())[0, 1])
    assert rmse < FLAGSHIP_HI_RMSE_GATE, \
        f"flagship vs PT @256x192 RMSE {rmse:.4f}"
    assert corr > FLAGSHIP_HI_CORR_GATE, \
        f"flagship vs PT @256x192 decorrelated: r={corr:.3f}"


def test_pathtracer_deterministic():
    """Same seed + frozen time -> bitwise-identical accumulation (the
    golden-image property, ref deterministic PCG seeding RNG.hlsli:21-27)."""
    a = _render(RenderingMode.PATH_TRACER, frames=3)
    b = _render(RenderingMode.PATH_TRACER, frames=3)
    np.testing.assert_array_equal(a, b)
