"""Bruneton-class atmosphere: LUT correctness vs direct integration + physical
sky behavior (ref src/shaders/Atmosphere.hlsli capability)."""

import numpy as np
import jax.numpy as jnp

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.ops import atmosphere as atm


def test_transmittance_lut_matches_direct_integral():
    luts = atm.build_luts()
    rng = np.random.default_rng(2)
    r = (atm.RB + rng.random(64).astype(np.float32) * atm.H_ATM * 0.98)
    # stay away from exact horizon grazing (parameterization singularities)
    mu = rng.uniform(-0.3, 1.0, 64).astype(np.float32)
    ref = atm._transmittance_integral(r, mu, steps=256)
    got = np.asarray(atm.sample_transmittance(luts, jnp.asarray(r),
                                              jnp.asarray(mu)))
    ok = np.abs(got - ref) < 0.02 + 0.05 * ref
    assert ok.mean() > 0.95, f"LUT mismatch on {(~ok).mean():.2%} of samples"


def test_transmittance_monotonic_in_mu():
    luts = atm.build_luts()
    mu = jnp.linspace(0.05, 1.0, 32)
    T = np.asarray(atm.sample_transmittance(
        luts, jnp.full((32,), atm.RB + 0.2), mu))
    assert (np.diff(T, axis=0) >= -1e-3).all(), "T must grow toward zenith"


def test_sky_is_blue_at_noon_red_at_sunset():
    s = RenderSettings().as_pytree()
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    horiz = jnp.asarray([[1.0, 0.02, 0.0]])
    noon_sun = np.asarray([0.05, -0.99, 0.0], np.float32)   # travel dir: down
    sunset_sun = np.asarray([-0.999, -0.04, 0.0], np.float32)

    zenith_noon = np.asarray(atm.sky_radiance_lut(up, noon_sun, s,
                                                  with_sun_disk=False))[0]
    assert np.isfinite(zenith_noon).all() and (zenith_noon > 0).all()
    assert zenith_noon[2] > zenith_noon[0], "noon zenith must be blue"

    # near the sun at sunset: transmittance kills blue faster than red
    toward = np.asarray(atm.sky_radiance_lut(horiz, sunset_sun, s,
                                             with_sun_disk=False))[0]
    assert toward[0] / max(toward[2], 1e-6) > \
        zenith_noon[0] / zenith_noon[2], "sunset must redden"


def test_sun_disk_dominates_sky():
    s = RenderSettings().as_pytree()
    sun_travel = np.asarray([0.3, -0.8, 0.5], np.float32)
    sun_travel /= np.linalg.norm(sun_travel)
    to_sun = -sun_travel
    near = to_sun + np.asarray([0.05, 0, 0], np.float32)
    near /= np.linalg.norm(near)
    d = jnp.asarray(np.stack([to_sun, near]))
    L = np.asarray(atm.sky_radiance_lut(d, sun_travel, s))
    assert L[0].sum() > 50 * L[1].sum(), "sun disk must dominate nearby sky"


def test_analytic_sun_transmittance_tracks_integral():
    """The gather-free in-march sun transmittance stays within tolerance of
    the exact integral (it is the march's workhorse)."""
    rng = np.random.default_rng(3)
    h = rng.uniform(0.0, 40.0, 48).astype(np.float32)
    mu = rng.uniform(0.1, 1.0, 48).astype(np.float32)
    got = np.asarray(atm.sun_transmittance_analytic(jnp.asarray(h),
                                                    jnp.asarray(mu)))
    ref = atm._transmittance_integral(atm.RB + h, mu, steps=256)
    # KY airmass vs spherical integral: a few percent everywhere above ~6 deg
    assert (np.abs(got - ref) < 0.03 + 0.08 * ref).mean() > 0.9


def test_sky_fast_disk_matches_full_eval():
    """sky_radiance_fast's analytic disk composite must agree with the full
    sky_radiance evaluation at disk pixels (regression: the fast path briefly
    double-evaluated the full sky to recover the disk)."""
    import jax.numpy as jnp
    from hobbyrenderer_tpu.config import RenderSettings
    from hobbyrenderer_tpu.ops import sky as skyops
    from hobbyrenderer_tpu.utils import math as hm
    s = RenderSettings().as_pytree()
    sun = np.asarray(s.sun_direction, np.float32)
    sun = sun / np.linalg.norm(sun)
    to_sun = -sun
    # a direction image with the sun near the center
    H, W = 32, 64
    t, b = np.linalg.svd(np.eye(3) - np.outer(to_sun, to_sun))[0][:, :2].T
    xs = np.linspace(-0.02, 0.02, W, dtype=np.float32)
    ys = np.linspace(-0.02, 0.02, H, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    d = to_sun[None, None] + gx[..., None] * t + gy[..., None] * b
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    fast = np.asarray(skyops.sky_radiance_fast(d, jnp.asarray(sun), s,
                                               scale=2))
    full = np.asarray(skyops.sky_radiance(d, jnp.asarray(sun), s,
                                          with_sun_disk=True))
    disk = full.max(-1) > 10.0 * np.median(full.max(-1))
    assert disk.any(), "sun disk not in the test frame"
    rel = np.abs(fast[disk] - full[disk]) / np.maximum(full[disk], 1e-6)
    assert rel.max() < 1e-3, rel.max()
