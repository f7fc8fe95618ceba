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
DI_VIS_SCALE = 2       # reduced-rate winner visibility (preset di_vis_scale)
SPEC_HALF_RATE = True  # traced-specular checkerboard (preset spec_half_rate;
#                        the deferred path reads rq.spec_half_rate — keep the
#                        sharded default in ONE visible place, not inline)
GI_TRACE_STEPS = 512


from hobbyrenderer_tpu.parallel.frame import _sun_dir


def _sharc_indirect_band(gpu, rt, gb, vc, settings, cache, q_state, irr,
                         shard, width, shard_h):
    """Combined SHARC indirect for one row band (mirrors models/deferred.py's
    _sharc + _sharc_query_traced passes; ref src/RTXDIRenderer.cpp:2185-2208).

    Returns (indirect (shard_h, W, 3), new replicated cache, new band q_state).

    RNG is keyed on GLOBAL grid pixel ids and the update-sample set is
    all_gather'd into single-chip row-major order before the deterministic
    sort+segment insert, so the replicated cache — and therefore the frame —
    is bit-identical to the single-chip combined mode. shard=None runs the
    same math on the full frame (the sharded==single test reference)."""
    from hobbyrenderer_tpu.ops import sharc as sharcops
    from hobbyrenderer_tpu.ops import trace as traceops
    from hobbyrenderer_tpu.ops.intersect import offset_ray_origin
    from hobbyrenderer_tpu.ops.restir_gi import _hit_radiance
    from hobbyrenderer_tpu.ops.specular import _SubGB
    from hobbyrenderer_tpu.ops.upsample import joint_bilateral_upsample
    from hobbyrenderer_tpu.ops import sampling as smp
    from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits

    cam = vc["camera_pos"]
    frame = vc["frame_index"].astype(jnp.uint32)
    ibl_scale = settings.ibl_intensity * settings.ambient_scale
    y0 = shu.global_y0(shard)

    def band_rays(s, seed, skip_pool_emissive, feedback):
        """Cosine bounce rays on the band's 1/s grid with GLOBAL RNG ids."""
        sh, sw = shard_h // s, width // s
        sub = lambda img: img[::s, ::s][:sh, :sw]
        pos = sub(gb.world_pos).reshape(-1, 3)
        nrm = sub(gb.normal).reshape(-1, 3)
        gn = sub(gb.geo_normal).reshape(-1, 3)
        alb = sub(gb.albedo).reshape(-1, 3)
        val = sub(gb.valid).reshape(-1)
        R = pos.shape[0]
        ly = jnp.arange(R, dtype=jnp.int32) // sw
        lx = jnp.arange(R, dtype=jnp.int32) % sw
        pix = ((ly + y0 // s) * sw + lx).astype(jnp.uint32)
        bits = pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                                jnp.full_like(pix, seed)], -1))
        u1 = uniform_from_bits(bits[..., 0])
        u2 = uniform_from_bits(bits[..., 1])
        d = smp.to_world(nrm, smp.cosine_sample_hemisphere(u1, u2))
        o = offset_ray_origin(pos, gn, d) + gn * settings.shadow_bias
        hit = traceops.closest_hit_auto(rt, o, d, active=val, max_steps=512)
        hpos, hn, h_rad = _hit_radiance(
            gpu, rt, rt.lights, hit, o, d, pix + jnp.uint32(feedback), frame,
            skip_pool_emissive=skip_pool_emissive, sky_sh=irr,
            ibl_scale=ibl_scale)
        return (sh, sw, pos, nrm, alb, val, hit, hpos, hn, h_rad)

    # ---- quarter-res update samples (seeds match models/deferred._sharc) ---
    (shq, swq, pos4, nrm4, alb4, val4, hit4, hp4, hn4, hr4) = band_rays(
        4, 55, False, 0x5A4C)
    fb, fb_hit = sharcops.sharc_query(cache, hp4, hn4, cam)
    L_hit = hr4 + jnp.where(fb_hit[..., None], fb, 0.0)
    sample = jnp.where((hit4.tri < 0)[..., None], 0.0, alb4 * L_hit)
    pack = jnp.concatenate([pos4, nrm4, sample,
                            val4.astype(jnp.float32)[..., None]],
                           -1).reshape(shq, swq, 10)
    if shard is not None:
        pack = jax.lax.all_gather(pack, TILE_AXIS, axis=0, tiled=True)
    pf = pack.reshape(-1, 10)
    cache = sharcops.sharc_update(cache, pf[:, 0:3], pf[:, 3:6], pf[:, 6:9],
                                  pf[:, 9] > 0.5, cam)
    cache = sharcops.sharc_resolve(cache)

    # ---- half-res traced query (seeds match _sharc_query_traced) -----------
    (sh2, sw2, _, _, _, val2, hit2, hp2, hn2, hr2) = band_rays(
        2, 77, True, 0xC0B1)
    fb2, fb2_ok = sharcops.sharc_query(cache, hp2, hn2, cam)
    rad = hr2 + jnp.where((fb2_ok & (hit2.tri >= 0))[..., None], fb2, 0.0)
    irr_s = jnp.where((val2 & (hit2.tri >= 0))[..., None], rad, 0.0)
    irr_s = irr_s.reshape(sh2, sw2, 3)
    qshard = None if shard is None else shard._replace(
        y0=shard.y0 // 2, shard_h=sh2, full_h=shard.full_h // 2)
    sub2 = lambda img: img[::2, ::2][:sh2, :sw2]
    sgb = _SubGB(motion=sub2(gb.motion) / 2.0, depth=sub2(gb.depth),
                 normal=sub2(gb.normal), valid=sub2(gb.valid))
    color, var, st = dnops.temporal_accumulate(irr_s, sgb, q_state,
                                               shard=qshard)
    color = dnops.atrous_filter(color, var, sgb, iterations=2, shard=qshard)
    full_irr = joint_bilateral_upsample(color, sgb.depth, sgb.normal,
                                        sgb.valid, gb.depth, gb.normal, 2,
                                        shard=shard)
    ind = jnp.where(gb.valid[..., None], gb.albedo * full_irr, 0.0)
    return ind, cache, st


def _ddgi_indirect_band(gpu, rt, gb, vc, settings, vol, shard, width,
                        shard_h):
    """DDGI indirect for one row band (mirrors models/deferred.py's _ddgi
    pass; ref src/DDGIRenderer.cpp:449-548).

    The probe VOLUME is replicated: ddgi_update's inputs (volume, scene,
    lights, frame) carry no screen dependence, so every device runs the
    IDENTICAL deterministic update (16k probe rays — cheaper than any merge
    collective) and the volumes stay bit-equal with no communication. Only
    the quarter-res Chebyshev query + guided upsample run banded."""
    from hobbyrenderer_tpu.ops import ddgi as ddgiops
    from hobbyrenderer_tpu.ops.upsample import joint_bilateral_upsample
    frame = vc["frame_index"]
    # variability-gated tracing + every-8th-frame keep-alive, exactly as the
    # single-chip pass (the gate value is replicated, so lax.cond stays
    # uniform across devices)
    do_trace = (vol.variability > 0.01) | (frame % 8 == 0)
    vol = jax.lax.cond(
        do_trace,
        lambda v: ddgiops.ddgi_update(v, gpu, rt, settings, frame),
        lambda v: v, vol)
    s = GI_SCALE
    sh, sw = shard_h // s, width // s
    sub = lambda img: img[::s, ::s][:sh, :sw]
    pos = sub(gb.world_pos).reshape(-1, 3)
    nrm = sub(gb.normal).reshape(-1, 3)
    E = ddgiops.ddgi_query(vol, pos, nrm).reshape(sh, sw, 3)
    E = joint_bilateral_upsample(E, sub(gb.depth), sub(gb.normal),
                                 sub(gb.valid), gb.depth, gb.normal, s,
                                 shard=shard)
    ind = (gb.albedo / jnp.pi) * E
    return jnp.where(gb.valid[..., None], ind, 0.0), vol


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

    # banded raster + G-buffer resolve. Under texture streaming each band
    # resolves its own (mat, mip) demand histogram (pixel ids are global) and
    # ONE psum over the tile axis yields the full-frame sampler-feedback the
    # host streamer consumes — identical to the single-chip resolve.
    streaming = getattr(gpu, "tex_stream", None) is not None
    out = rasterops.rasterize(gpu, vc, slots, width, height,
                              y0=y0, shard_height=shard_h, resolve_attrs=True)
    ro, aux, attr = out
    gb = rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux, attr_img=attr,
                                   y0=y0, want_feedback=streaming)
    tex_feedback = jnp.int32(0)
    if streaming:
        gb, fb = gb
        if fb is not None:
            tex_feedback = jax.lax.psum(fb, TILE_AXIS)

    # ReSTIR DI with halo'd temporal/spatial reuse (balanced-preset
    # reduced-rate winner visibility, as models/deferred)
    direct, new_res = restirops.restir_di(
        gpu, rt, gb, vc, settings, state["restir_reservoir"],
        vc["frame_index"], visibility=rt is not None, shard=shard,
        vis_scale=DI_VIS_SCALE)
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
    elif indirect == "sharc" and rt is not None:
        # combined SHARC indirect, multi-chip (ref bCombinedMode,
        # src/RTXDIRenderer.cpp:2185-2208). The hash cache is REPLICATED:
        # every device computes its band's quarter-res update samples, the
        # (small) sample set is all_gather'd in single-chip row-major order,
        # and each device runs the IDENTICAL deterministic sort+segment
        # update — the caches stay bit-equal with no merge collective. The
        # half-res traced query + RELAX + guided upsample run banded.
        ind, sharc_cache, sharc_q_state = _sharc_indirect_band(
            gpu, rt, gb, vc, settings, state["sharc_cache"],
            state["sharc_q_state"], irr, shard, width, shard_h)
        gi_res = None
    elif indirect == "ddgi" and rt is not None:
        # replicated probe volume + banded query (see _ddgi_indirect_band)
        ind, ddgi_vol = _ddgi_indirect_band(
            gpu, rt, gb, vc, settings, state["ddgi_volume"], shard,
            width, shard_h)
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
            sharc_cache=sharc_cache if indirect == "sharc" else None,
            ibl_scale=settings.ibl_intensity * settings.ambient_scale,
            half_rate=SPEC_HALF_RATE)

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
    if indirect == "sharc" and rt is not None:
        new_state["sharc_cache"] = sharc_cache
        new_state["sharc_q_state"] = sharc_q_state
    if indirect == "ddgi" and rt is not None:
        new_state["ddgi_volume"] = ddgi_vol
    if with_spec and rt is not None:
        new_state["spec_state"] = spec_state
    return ldr, new_state, tex_feedback


class FlagshipShardedRenderer:
    """Multi-chip flagship (Normal-mode) renderer: ReSTIR DI (+GI), denoise,
    TAA, exposure and post under one shard_map. API-compatible
    render(gpu, vc, settings, dt); rt enables visibility rays + GI.

    Sharded: opaque + masked raster, ReSTIR DI, indirect (ReSTIR GI on the
    banded grid, SSGI marching the gathered frame, combined SHARC with a
    replicated hash cache + banded traced query, or DDGI with a replicated
    probe volume + banded query), denoise, transparent (banded raster/shade;
    refraction reads the gathered frame), TAA, exposure, BANDED bloom +
    tonemap (only the uint8 LDR is gathered). Not yet sharded: the debug
    overlays.

    indirect: "restir" (needs rt) | "ssgi" | "sharc" (needs rt) |
    "ddgi" (needs rt) | "none"."""

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
        if indirect == "sharc" and rt is not None:
            from hobbyrenderer_tpu.ops.sharc import sharc_init
            self.state["sharc_cache"] = sharc_init()
            self.state["sharc_q_state"] = dnops.denoise_init(height // 2,
                                                             width // 2)
        if indirect == "ddgi" and rt is not None:
            import numpy as _np
            from hobbyrenderer_tpu.ops.ddgi import ddgi_init
            _c = _np.asarray(gpu.inst_center).reshape(-1, 3)
            _r = _np.asarray(gpu.inst_radius).reshape(-1)
            self.state["ddgi_volume"] = ddgi_init(
                (_c - _r[:, None]).min(0), (_c + _r[:, None]).max(0))
        if self.with_spec and rt is not None:
            from hobbyrenderer_tpu.ops.specular import spec_state_init
            self.state["spec_state"] = spec_state_init(height, width)
        self._jitted = None

    def _state_specs(self):
        # the SHARC hash cache and the DDGI probe volume are REPLICATED
        # (every device runs the identical deterministic update — SHARC over
        # the all_gather'd sample set, DDGI over the screen-independent probe
        # rays); everything else row-shards along the tile axis
        return {k: jax.tree_util.tree_map(
                    lambda l: P() if (l.ndim == 0
                                      or k in ("sharc_cache", "ddgi_volume"))
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
                            out_specs=(P(), st_specs, P()),
                            check_vma=False)
        # donate the persistent state (reservoirs/history/denoise) so XLA
        # aliases it in place, like the single-chip paths
        self._jitted = jax.jit(sharded, donate_argnums=(4,))

    def render(self, gpu, vc, settings, dt: float = 1 / 60):
        if self._jitted is None:
            self._build()
        ldr, self.state, fb = self._jitted(gpu, self.rt, vc, settings,
                                           self.state, jnp.float32(dt))
        # full-frame sampler-feedback histogram (psum'd across bands) for the
        # host streamer when the scene streams textures; 0 otherwise
        self.last_tex_feedback = fb
        return ldr, jnp.int32(0)
