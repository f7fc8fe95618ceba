"""Blue-noise generation: spectral + uniformity properties, SSGI wiring."""

import numpy as np


def test_blue_noise_spectrum_and_uniformity():
    from hobbyrenderer_tpu.utils.bluenoise import blue_noise
    bn = blue_noise(64, seed=0)
    assert bn.shape == (64, 64)
    # every texel carries a unique rank -> exactly uniform histogram
    assert len(np.unique(bn)) == 64 * 64
    assert abs(bn.mean() - 0.5) < 1e-3
    # spectral test: low-frequency energy must be far below white noise's
    f = np.fft.fftshift(np.abs(np.fft.fft2(bn - bn.mean())))
    n = 64
    yy, xx = np.mgrid[0:n, 0:n]
    r = np.hypot(yy - n // 2, xx - n // 2)
    lo = f[(r > 0) & (r < 6)].mean()
    hi = f[(r > 20) & (r < 30)].mean()
    assert lo < hi * 0.35, f"not blue: low {lo:.2f} vs high {hi:.2f}"

    rng = np.random.default_rng(0)
    w = rng.random((n, n)).astype(np.float32)
    fw = np.fft.fftshift(np.abs(np.fft.fft2(w - w.mean())))
    lo_w = fw[(r > 0) & (r < 6)].mean()
    hi_w = fw[(r > 20) & (r < 30)].mean()
    assert lo / hi < 0.5 * (lo_w / hi_w), "barely better than white noise"


def test_blue_noise_animate_temporal_mean():
    import jax.numpy as jnp
    from hobbyrenderer_tpu.utils.bluenoise import animate, blue_noise
    bn = blue_noise(16, seed=0)
    acc = np.zeros((16, 16))
    N = 64
    for k in range(N):
        acc += np.asarray(animate(bn, jnp.uint32(k)))
    acc /= N
    # golden-ratio rotation: every texel's temporal mean ~ 0.5
    assert np.abs(acc - 0.5).max() < 0.08, np.abs(acc - 0.5).max()


def test_ssgi_still_converges_with_blue_noise():
    """SSGI e2e smoke after the jitter change."""
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer
    cfg = Config(scene="stress:3", width=96, height=64,
                 mode=RenderingMode.NORMAL_BASIC, indirect_mode="ssgi")
    r = Renderer(cfg)
    for _ in range(4):
        ldr = r.render_frame()
    im = np.asarray(ldr)
    assert np.isfinite(im.astype(np.float64)).all()
    assert (im.sum(-1) > 0).mean() > 0.5
