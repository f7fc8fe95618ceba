"""Multi-chip FLAGSHIP deferred frame: the Normal-mode graph under shard_map.

SURVEY.md §5.8 / VERDICT r1 #5: the basic sharded frame (parallel/frame.py)
covered only raster + simple lighting; this module shards the flagship chain —

  culling (replicated) -> banded raster/G-buffer resolve -> ReSTIR DI
  (+ optional ReSTIR GI) with ppermute HALO EXCHANGE for temporal + spatial
  reuse -> RELAX denoise (halo'd A-trous) -> IBL/lighting/sky -> TAA (halo'd
  history reprojection) -> exposure (psum histogram) -> all_gather ->
  bloom + tonemap (replicated post).

Every screen-space pass reaches its out-of-band taps through
ops/shard_utils.extend_rows (two ppermutes per array over ICI); RNG is keyed on
GLOBAL pixel ids, so the sharded frame draws exactly the single-chip sample
sequences (tested: sharded == single for the restir+denoise path,
tests/test_parallel.py)."""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

try:  # JAX >= 0.6 moved shard_map around
    shard_map = jax.shard_map
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from jax.sharding import PartitionSpec as P

from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import denoise as dnops
from hobbyrenderer_tpu.ops import post as postops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import restir as restirops
from hobbyrenderer_tpu.ops import restir_gi as giops
from hobbyrenderer_tpu.ops import shard_utils as shu
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops import sky as skyops
from hobbyrenderer_tpu.ops import taa as taaops
from hobbyrenderer_tpu.ops.raster import TILE
from hobbyrenderer_tpu.parallel.mesh import TILE_AXIS, build_mesh

GI_SCALE = 4
GI_HALF_RATE = True   # same checkerboard trade as models/deferred.py
GI_TRACE_STEPS = 512


from hobbyrenderer_tpu.parallel.frame import _sun_dir


def _flagship_fn(gpu, rt, vc, settings, state, dt, *, width, height, shard_h,
                 n_dev, capacity, with_gi, with_transparent,
                 indirect="restir", with_spec=False):
    """Per-device body (runs under shard_map)."""
    shard = shu.make_row_shard(TILE_AXIS, n_dev, shard_h)
    y0 = shard.y0

    # replicated culling + compaction (scene work is small vs pixel work)
    alpha_ok = jnp.asarray([True, True, False])
    cull = cullops.cull_pairs(gpu, vc, alpha_mask=alpha_ok)
    slots, _count = cullops.compact_mask(cull["mask"], capacity)

    # banded raster + G-buffer resolve
    out = rasterops.rasterize(gpu, vc, slots, width, height,
                              y0=y0, shard_height=shard_h, resolve_attrs=True)
    ro, aux, attr = out
    gb = rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux, attr_img=attr,
                                   y0=y0)

    # ReSTIR DI with halo'd temporal/spatial reuse
    direct, new_res = restirops.restir_di(
        gpu, rt, gb, vc, settings, state["restir_reservoir"],
        vc["frame_index"], visibility=rt is not None, shard=shard)
    direct, dn_state = dnops.denoise(direct, gb, state["denoise_state"],
                                     shard=shard)

    # indirect: ReSTIR GI on the banded GI grid (needs rays)
    from hobbyrenderer_tpu.ops import ibl as iblops
    sun_dir = _sun_dir(gpu, settings)
    irr = iblops.build_sky_irradiance(sun_dir, settings)   # replicated (cheap)
    if indirect == "restir" and with_gi:
        ind, gi_res = giops.restir_gi(
            gpu, rt, gb, vc, settings, state["restir_gi_reservoir"],
            vc["frame_index"], scale=GI_SCALE, shard=shard,
            half_rate=GI_HALF_RATE, trace_max_steps=GI_TRACE_STEPS,
            skip_pool_emissive=True, sky_sh=irr,
            ibl_scale=settings.ibl_intensity * settings.ambient_scale)
    elif indirect == "ssgi":
        # screen-space GI marches to arbitrary rows: tap the GATHERED depth
        # + previous lit frame (ICI all_gather), march only this band
        from hobbyrenderer_tpu.ops import ssgi as ssgiops
        depth_full = jax.lax.all_gather(gb.depth, TILE_AXIS, axis=0,
                                        tiled=True)
        prev_full = jax.lax.all_gather(state["taa_history"], TILE_AXIS,
                                       axis=0, tiled=True)
        ind = ssgiops.ssgi_half_res(gb, vc, None, irr, settings,
                                    vc["frame_index"], shard=shard,
                                    depth_full=depth_full,
                                    prev_hdr_full=prev_full)
        gi_res = None
    else:
        ind, gi_res = 0.0, None
    indirect_rad = ind

    # traced specular indirect on the band (ref BrdfRayTracing; same pass as
    # the single-chip flagship — reflection rays + RELAX at the half-res grid
    # ride the shard's halo machinery inside ops/specular.py)
    spec = None
    spec_state = state.get("spec_state")
    if with_spec and rt is not None:
        from hobbyrenderer_tpu.ops import specular as specops
        spec, spec_w, spec_state = specops.specular_indirect(
            gpu, rt, gb, vc, settings, state["spec_state"],
            vc["frame_index"], sun_dir=sun_dir, shard=shard,
            skip_pool_emissive=True, sky_sh=irr,
            ibl_scale=settings.ibl_intensity * settings.ambient_scale)

    # ambient + sky on the band
    vdir = skyops.view_dirs_from_pixels(vc, shard_h, width, y0=y0,
                                        full_height=height)
    v = -vdir
    rough = gb.orm[..., 1]
    metal = gb.orm[..., 2]
    ambient = iblops.ibl_ambient(irr, gb.normal, v, gb.albedo, metal, rough,
                                 sun_dir, settings,
                                 intensity=settings.ibl_intensity
                                 * settings.ambient_scale,
                                 spec_suppress=spec_w if spec is not None
                                 else None)
    hdr = direct + ambient + gb.emissive + indirect_rad
    if spec is not None:
        hdr = hdr + spec
    hdr = jnp.where(gb.valid[..., None], hdr,
                    skyops.sky_radiance_fast(vdir, sun_dir, settings))

    # transparent forward pass on the band: raster/shade stay sharded; the
    # refraction background samples the GATHERED opaque frame (refracted
    # exits cross shard boundaries — one all_gather over ICI)
    if with_transparent:
        from hobbyrenderer_tpu.ops import transparent as transops
        hdr_opaque_full = jax.lax.all_gather(hdr, TILE_AXIS, axis=0,
                                             tiled=True)
        hdr = transops.transparent_composite(
            gpu, vc, settings, gb, hdr, width=width, height=height,
            transparent_capacity=capacity, sun_dir=sun_dir, sky_sh=irr,
            ibl_scale=settings.ibl_intensity * settings.ambient_scale,
            y0=y0, shard_h=shard_h, hdr_full=hdr_opaque_full)

    # TAA: halo'd history reprojection
    hdr = taaops.taa_resolve(hdr, state["taa_history"], gb.motion,
                             state["taa_valid"], settings, shard=shard)
    taa_hist = hdr

    # exposure: partial histogram + psum (ICI collective)
    hist = postops.luminance_histogram(hdr)
    hist = jax.lax.psum(hist, TILE_AXIS)
    exposure = postops.exposure_adapt(hist, state["exposure"], dt, settings)

    # post: BANDED bloom (one ppermute halo row per pyramid level) + banded
    # tonemap; only the final uint8 LDR is gathered — 12x less ICI traffic
    # than the former all_gather-the-f32-HDR + replicated bloom
    hdr = postops.bloom_sharded(hdr, settings, shard, full_h=height)
    ldr_band = postops.tonemap_to_output(hdr, exposure)
    ldr = jax.lax.all_gather(ldr_band, TILE_AXIS, axis=0, tiled=True)

    new_state = dict(state)
    new_state["restir_reservoir"] = new_res
    new_state["denoise_state"] = dn_state
    new_state["taa_history"] = taa_hist
    new_state["taa_valid"] = jnp.bool_(True)
    new_state["exposure"] = exposure
    if indirect == "restir" and with_gi:
        new_state["restir_gi_reservoir"] = gi_res
    if with_spec and rt is not None:
        new_state["spec_state"] = spec_state
    return ldr, new_state


class FlagshipShardedRenderer:
    """Multi-chip flagship (Normal-mode) renderer: ReSTIR DI (+GI), denoise,
    TAA, exposure and post under one shard_map. API-compatible
    render(gpu, vc, settings, dt); rt enables visibility rays + GI.

    Sharded: opaque + masked raster, ReSTIR DI, indirect (ReSTIR GI on the
    banded grid, or SSGI marching the gathered frame), denoise, transparent
    (banded raster/shade; refraction reads the gathered frame), TAA,
    exposure, BANDED bloom + tonemap (only the uint8 LDR is gathered).
    Not yet sharded: the debug overlays.

    indirect: "restir" (needs rt) | "ssgi" | "none"."""

    def __init__(self, gpu, width: int, height: int, rt=None, n_devices: int = 0,
                 with_gi: bool = None, mesh=None, with_transparent: bool = None,
                 indirect: str = "restir", with_spec: bool = None):
        self.mesh = mesh if mesh is not None else build_mesh(n_devices)
        n = self.mesh.devices.size
        assert height % (n * TILE) == 0, (
            f"height {height} must be divisible by n_devices*TILE = {n * TILE}")
        assert (height // n) % GI_SCALE == 0
        self.width, self.height = width, height
        self.n = n
        self.shard_h = height // n
        self.rt = rt
        self.indirect = indirect
        self.with_spec = (rt is not None) if with_spec is None else with_spec
        self.with_gi = (rt is not None) if with_gi is None else with_gi
        if with_transparent is None:
            import numpy as _np
            with_transparent = bool(
                (_np.asarray(gpu.inst_alpha_mode) == 2).any())
        self.with_transparent = with_transparent
        self.capacity = max(int(gpu.lod0_pair_capacity), 1)
        self.state: Dict[str, jnp.ndarray] = {
            "exposure": jnp.float32(1.0),
            "taa_valid": jnp.bool_(False),
            "taa_history": jnp.zeros((height, width, 3), jnp.float32),
            "restir_reservoir": restirops.reservoir_init(height, width),
            "denoise_state": dnops.denoise_init(height, width),
        }
        if self.with_gi and indirect == "restir":
            self.state["restir_gi_reservoir"] = giops.gi_reservoir_init(
                height // GI_SCALE, width // GI_SCALE)
        if self.with_spec and rt is not None:
            from hobbyrenderer_tpu.ops.specular import spec_state_init
            self.state["spec_state"] = spec_state_init(height, width)
        self._jitted = None

    def _state_specs(self):
        return {k: jax.tree_util.tree_map(lambda l: P() if l.ndim == 0
                                          else P(TILE_AXIS), v)
                for k, v in self.state.items()}

    def _build(self):
        body = functools.partial(_flagship_fn, width=self.width,
                                 height=self.height, shard_h=self.shard_h,
                                 n_dev=self.n, capacity=self.capacity,
                                 with_gi=self.with_gi,
                                 with_transparent=self.with_transparent,
                                 indirect=self.indirect,
                                 with_spec=self.with_spec and self.rt is not None)
        st_specs = self._state_specs()
        sharded = shard_map(body, mesh=self.mesh,
                            in_specs=(P(), P(), P(), P(), st_specs, P()),
                            out_specs=(P(), st_specs),
                            check_vma=False)
        # donate the persistent state (reservoirs/history/denoise) so XLA
        # aliases it in place, like the single-chip paths
        self._jitted = jax.jit(sharded, donate_argnums=(4,))

    def render(self, gpu, vc, settings, dt: float = 1 / 60):
        if self._jitted is None:
            self._build()
        ldr, self.state = self._jitted(gpu, self.rt, vc, settings, self.state,
                                       jnp.float32(dt))
        return ldr, jnp.int32(0)
