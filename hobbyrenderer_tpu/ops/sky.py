"""Sky radiance.

Reference: src/SkyRenderer.cpp + src/shaders/Atmosphere.hlsli (603 LoC) — full
Bruneton precomputed-LUT atmosphere (transmittance/scattering/irradiance + sun disk)
drawn at stencil==0. The LUTs ship as DDS assets in the reference.

TPU build: sky_radiance() dispatches to the precomputed-LUT atmosphere
(ops/atmosphere.py — transmittance + multiple-scattering LUTs built host-side
at startup, in-scatter march per direction) by default; the analytic gradient
remains as a cheap fallback (SKY_MODEL). sky_radiance_fast() evaluates the
smooth march on a strided grid with a full-res analytic sun disk — image-space
callers (deferred Sky pass, IBL specular) use it."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from hobbyrenderer_tpu.utils import math as hm


# "bruneton": precomputed-LUT atmosphere (ops/atmosphere.py, the reference's
# Atmosphere.hlsli capability); "gradient": the cheap analytic fallback
SKY_MODEL = "bruneton"


def sky_radiance(d, sun_dir, settings, with_sun_disk: bool = True):
    """Sky radiance for view directions d (..., 3); sun_dir = travel direction
    of sunlight (from sun toward scene, like the reference's light dir)."""
    if SKY_MODEL == "bruneton":
        from hobbyrenderer_tpu.ops import atmosphere as atm
        return atm.sky_radiance_lut(d, sun_dir, settings,
                                    with_sun_disk=with_sun_disk)
    return _sky_gradient(d, sun_dir, settings, with_sun_disk)


# default stride of the fast path (None scale arg). Sharded==single parity
# tests set this to 1: the band-local bilinear upsample is not bit-identical
# to the full-frame one at band boundaries.
SKY_FAST_SCALE = 4


def sky_radiance_fast(d, sun_dir, settings, scale: int = None,
                      with_sun_disk: bool = True):
    """Half-angular-resolution sky for (H, W, 3) direction images: the smooth
    in-scatter march runs on a 1/scale grid and upsamples; the sun disk is
    composited at FULL resolution with the analytic transmittance (the march
    at 1080p costs ~25 ms/frame; this form ~6 ms)."""
    import jax
    if scale is None:
        scale = SKY_FAST_SCALE
    if d.ndim != 3 or scale == 1:       # flat (R, 3) dirs: no image to stride
        return sky_radiance(d, sun_dir, settings, with_sun_disk=with_sun_disk)
    H, W = d.shape[0], d.shape[1]
    sh, sw = H // scale, W // scale
    ds = d[::scale, ::scale][:sh, :sw]
    L = sky_radiance(ds, sun_dir, settings, with_sun_disk=False)
    L = jax.image.resize(L, (H, W, 3), "bilinear")
    if with_sun_disk:
        to_sun = -hm.normalize(jnp.asarray(sun_dir), xp=jnp)
        cos_g = jnp.sum(hm.normalize(d, xp=jnp) * to_sun, -1)
        cos_r = jnp.cos(settings.sun_angular_radius)
        # horizon dip for a 0.2 km observer: -sqrt(2h/R) ~= -0.0079 (matches
        # the LUT path's ground-intersection test, not an arbitrary -0.02)
        dip = -float(np.sqrt(2.0 * 0.2 / 6360.0))
        if SKY_MODEL == "bruneton":
            from hobbyrenderer_tpu.ops import atmosphere as atm
            disk = (cos_g >= cos_r) & (d[..., 1] > dip)
            omega = 2 * jnp.pi * (1 - cos_r)
            E_sun = (jnp.asarray(settings.sun_color, jnp.float32)
                     * settings.sun_intensity)
            T = atm.sun_transmittance_analytic(jnp.asarray(0.2), d[..., 1])
            L = jnp.where(disk[..., None], E_sun / omega * T, L)
        else:
            # analytic disk composite (the previous full-res double
            # evaluation + diff cost ~3x the strided march it bypassed)
            disk = (cos_g >= cos_r) & (d[..., 1] > -0.05)
            omega = 2 * jnp.pi * (1 - cos_r)
            sun_rad = settings.sun_intensity / jnp.maximum(omega, 1e-6)
            # matches _sky_gradient: the disk overwrite happens after the
            # daylight multiply, so it carries only the global 0.25
            col = jnp.asarray(settings.sun_color, jnp.float32) * sun_rad * 0.25
            L = jnp.where(disk[..., None], col, L)
    return L


def _sky_gradient(d, sun_dir, settings, with_sun_disk: bool = True):
    """Analytic clear-sky: Rayleigh-ish gradient + aureole + ground haze + sun disk."""
    d = hm.normalize(d, xp=jnp)
    to_sun = -hm.normalize(jnp.asarray(sun_dir), xp=jnp)
    y = jnp.clip(d[..., 1], -1.0, 1.0)
    cos_g = jnp.clip(jnp.sum(d * to_sun, -1), -1.0, 1.0)

    sun_h = jnp.clip(to_sun[1], -1.0, 1.0)
    daylight = jnp.clip(sun_h * 6.0 + 0.3, 0.0, 1.0)

    # zenith->horizon gradient (denser air mass near horizon)
    t = jnp.power(jnp.clip(1.0 - jnp.maximum(y, 0.0), 0.0, 1.0), 2.2)
    zenith = jnp.asarray([0.12, 0.32, 0.85], jnp.float32)
    horizon = jnp.asarray([0.62, 0.75, 0.92], jnp.float32)
    sky = zenith[None] * (1 - t[..., None]) + horizon[None] * t[..., None]
    # aureole: forward-scattering glow around the sun (HG-ish)
    g = 0.76
    hg = (1 - g * g) / jnp.power(jnp.maximum(1 + g * g - 2 * g * cos_g, 1e-4), 1.5) / (4 * jnp.pi)
    sky = sky + jnp.asarray([1.0, 0.9, 0.7], jnp.float32)[None] * (hg * 0.35)[..., None]
    # below-horizon: dark ground haze
    below = jnp.clip(-y * 8.0, 0.0, 1.0)
    ground = jnp.asarray([0.2, 0.19, 0.18], jnp.float32)
    sky = sky * (1 - below[..., None]) + ground[None] * below[..., None]
    sky = sky * (daylight[..., None] ** 1.5)

    if with_sun_disk:
        cos_r = jnp.cos(settings.sun_angular_radius)
        disk = (cos_g >= cos_r) & (y > -0.05)
        # sun radiance so that irradiance ~= intensity (disk solid angle factored)
        omega = 2 * jnp.pi * (1 - cos_r)
        sun_rad = settings.sun_intensity / jnp.maximum(omega, 1e-6)
        sky = jnp.where(disk[..., None],
                        jnp.asarray(settings.sun_color, jnp.float32) * sun_rad, sky)
    return sky * 0.25


def view_dirs_from_pixels(vc, height: int, width: int, y0: int = 0,
                          full_height: int = None):
    """Per-pixel world-space view direction through each pixel center.

    y0/full_height support framebuffer row-sharding: this shard covers rows
    [y0, y0+height) of a full_height-tall image."""
    fh = height if full_height is None else full_height
    px = jnp.stack(jnp.meshgrid(jnp.arange(width, dtype=jnp.float32) + 0.5,
                                jnp.arange(height, dtype=jnp.float32) + y0 + 0.5,
                                indexing="xy"), -1)
    ndc_x = px[..., 0] / width * 2.0 - 1.0
    ndc_y = 1.0 - px[..., 1] / fh * 2.0
    # unproject at depth 0.5 (any depth works for a direction)
    inv = vc["inv_view_proj"]
    p = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, 0.5)], -1)
    w = jnp.einsum("j,hwj->hw", inv[3, :3], p) + inv[3, 3]
    world = (jnp.einsum("ij,hwj->hwi", inv[:3, :3], p) + inv[:3, 3]) / w[..., None]
    return hm.normalize(world - vc["camera_pos"][None, None, :], xp=jnp)
