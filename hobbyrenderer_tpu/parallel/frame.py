"""Multi-chip deferred frame: framebuffer tile-row sharding under shard_map.

SURVEY.md §5.8 / §2.7 "Multi-chip (new for TPU build)": the frame's pixel work is
sharded across the ICI-connected mesh —

- Scene buffers + culling: REPLICATED (cheap relative to pixel work; mirrors the
  reference's single upload of scene buffers, duplicated per chip).
- Raster + G-buffer resolve + lighting + sky: each device owns a horizontal band
  of tile rows (static shapes per shard; meshlet binning is restricted to the
  band so each chip only rasterizes geometry overlapping its rows).
- Luminance histogram: per-shard partial + psum (the collective replaces the
  reference's global atomic histogram, LuminanceHistogram.hlsl).
- Bloom/tonemap: currently all_gather + replicated post (correct; the sharded
  halo-exchange bloom is a planned optimization) — output is the full LDR frame.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

try:  # JAX >= 0.6 moved shard_map around
    from jax import shard_map as _shard_map_mod  # type: ignore
    shard_map = jax.shard_map
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from jax.sharding import PartitionSpec as P

from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import post as postops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops import sky as skyops
from hobbyrenderer_tpu.parallel.mesh import TILE_AXIS, build_mesh
from hobbyrenderer_tpu.ops.raster import TILE


def _sun_dir(gpu, settings):
    lt = gpu.light_type
    is_dir = (lt == 0) & (jnp.arange(lt.shape[0]) < gpu.light_count)
    idx = jnp.argmax(is_dir)
    return jnp.where(is_dir.any(), gpu.light_dir[idx],
                     jnp.asarray(settings.sun_direction))


def _shard_frame_fn(gpu, vc, settings, state, *, width, height, shard_h,
                    capacity, max_per_tile, dt, shadow_capacity=0,
                    csm_max_distance=60.0):
    """Per-device body (runs under shard_map)."""
    idx = jax.lax.axis_index(TILE_AXIS)
    y0 = idx * shard_h

    # replicated culling + compaction
    alpha_ok = jnp.asarray([True, True, False])
    cull = cullops.cull_pairs(gpu, vc, alpha_mask=alpha_ok)
    slots, _count = cullops.compact_mask(cull["mask"], capacity)

    # banded raster + resolve
    ro, aux = rasterops.rasterize(gpu, vc, slots, width, height,
                                  y0=y0, shard_height=shard_h)
    gb = rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux, y0=y0)

    # lighting + sky on the band
    vdir = skyops.view_dirs_from_pixels(vc, shard_h, width, y0=y0,
                                        full_height=height)
    v = -vdir
    rough = gb.orm[..., 1]
    metal = gb.orm[..., 2]
    sun_dir = _sun_dir(gpu, settings)
    shadow_fn = None
    if shadow_capacity > 0:
        # CSM sun shadows, sharded (ref ShadowRenderer + ShadowMaskRenderer;
        # models/deferred.py's ShadowCSM pass): the cascade atlas raster is
        # screen-INDEPENDENT (light-space world geometry), so every device
        # runs the identical replicated raster — no collective; only the
        # half-res PCF mask evaluates on the band. The screen-space contact
        # march stays single-chip (its sunward march crosses band edges).
        from hobbyrenderer_tpu.ops import csm as csmops
        data = csmops.render_cascades(gpu, vc, sun_dir, shadow_capacity,
                                      max_distance=csm_max_distance)
        s = 2
        sh, sw = shard_h // s, width // s
        m = csmops.csm_shadow_mask(
            data, vc, gb.world_pos[::s, ::s][:sh, :sw],
            gb.geo_normal[::s, ::s][:sh, :sw],
            gb.valid[::s, ::s][:sh, :sw], sun_dir)
        mask = jax.image.resize(m, (shard_h, width), method="bilinear")
        lt = gpu.light_type
        is_dir = (lt == 0) & (jnp.arange(lt.shape[0]) < gpu.light_count)
        sun_idx = jnp.argmax(is_dir)
        shadow_fn = lambda i, L, dist: jnp.where(i == sun_idx, mask, 1.0)
    direct = shadeops.shade_all_lights(gpu, gb.world_pos, gb.normal, v,
                                       gb.albedo, metal, rough,
                                       shadow_fn=shadow_fn)
    from hobbyrenderer_tpu.ops import ibl as iblops
    irr = iblops.build_sky_irradiance(sun_dir, settings)   # replicated (cheap)
    ambient = iblops.ibl_ambient(irr, gb.normal, v, gb.albedo, metal, rough,
                                 sun_dir, settings,
                                 intensity=settings.ibl_intensity
                                 * settings.ambient_scale)
    hdr = jnp.where(gb.valid[..., None],
                    direct + ambient + gb.emissive,
                    skyops.sky_radiance_fast(vdir, sun_dir, settings))

    # exposure: partial histogram + psum (ICI collective)
    hist = postops.luminance_histogram(hdr)
    hist = jax.lax.psum(hist, TILE_AXIS)
    exposure = postops.exposure_adapt(hist, state["exposure"], dt, settings)

    # post: gather the full HDR frame, replicated bloom+tonemap
    hdr_full = jax.lax.all_gather(hdr, TILE_AXIS, axis=0, tiled=True)
    hdr_full = postops.bloom(hdr_full, settings)
    ldr = postops.tonemap_to_output(hdr_full, exposure)
    return ldr, {"exposure": exposure}


class DeferredShardedRenderer:
    """Multi-chip counterpart of models.deferred.DeferredRenderer.

    Renders the deferred frame with the framebuffer row-sharded over an
    n-device mesh. API-compatible render(gpu, vc, settings, dt)."""

    def __init__(self, gpu, width: int, height: int, n_devices: int = 0,
                 config=None, max_per_tile: int = 48, mesh=None,
                 with_csm: bool = False):
        self.mesh = mesh if mesh is not None else build_mesh(n_devices)
        n = self.mesh.devices.size
        assert height % (n * TILE) == 0, (
            f"height {height} must be divisible by n_devices*TILE = {n * TILE}")
        self.width, self.height = width, height
        self.shard_h = height // n
        self.capacity = max(int(gpu.lod0_pair_capacity), 1)
        self.max_per_tile = max_per_tile
        self.shadow_capacity = 0
        self.csm_max_distance = 60.0
        if with_csm:
            import numpy as _np
            from hobbyrenderer_tpu.ops.csm import (CASCADE_LOD_BIAS,
                                                   NUM_CASCADES)
            self.shadow_capacity = max(int(gpu.shadow_pair_capacity(
                CASCADE_LOD_BIAS[:NUM_CASCADES])), 1)
            # scene-adaptive CSM range, measured around the scene CENTER
            # (mirrors models/deferred.py's csm_max_distance derivation)
            c = _np.asarray(gpu.inst_center).reshape(-1, 3)
            r = _np.asarray(gpu.inst_radius).reshape(-1)
            ctr = 0.5 * ((c - r[:, None]).min(0) + (c + r[:, None]).max(0))
            radius = float((_np.linalg.norm(c - ctr, axis=1) + r).max())
            self.csm_max_distance = float(min(max(2.0 * radius, 20.0), 400.0))
        self.state: Dict[str, jnp.ndarray] = {"exposure": jnp.float32(1.0)}
        self._jitted = None

    def _build(self):
        body = functools.partial(_shard_frame_fn, width=self.width,
                                 height=self.height, shard_h=self.shard_h,
                                 capacity=self.capacity,
                                 max_per_tile=self.max_per_tile, dt=1.0 / 60.0,
                                 shadow_capacity=self.shadow_capacity,
                                 csm_max_distance=self.csm_max_distance)
        sharded = shard_map(body, mesh=self.mesh,
                            in_specs=(P(), P(), P(), P()),
                            out_specs=(P(), P()),
                            check_vma=False)
        self._jitted = jax.jit(sharded)

    def render(self, gpu, vc, settings, dt: float = 1 / 60):
        if self._jitted is None:
            self._build()
        ldr, self.state = self._jitted(gpu, vc, settings, self.state)
        return ldr, jnp.int32(0)
