"""Deferred rendering mode (the Normal / NormalBasic / IBL family).

Reference pass order (src/Renderer.cpp:1282-1313): Clear -> [TLAS] -> base pass
(GPU culling + meshlet raster G-buffer) -> HZB -> shadows -> [RTXDI/SHARC | SSGI/
DDGI] -> Deferred lighting -> Sky -> transparent -> TAA -> Bloom -> HDR post.

Implemented graph: Culling (frustum + cone + optional prev-frame HZB occlusion) ->
Raster -> HZBBuild -> ResolveGBuffer -> SunShadow (ray-traced, Normal/IBL modes,
ref "ray-traced sun shadows" src/Renderer.cpp:1300-1313) -> DeferredLighting ->
Sky -> TAA (FSR3-class accumulate-resolve) -> AutoExposure -> Bloom -> Tonemap.
ReSTIR/SHARC/SSGI/DDGI slot in as additional passes."""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.config import RenderingMode
from hobbyrenderer_tpu.graph.rendergraph import FrameContext, RenderGraph, render_pass
from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import hzb as hzbops
from hobbyrenderer_tpu.ops import post as postops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops import sky as skyops
from hobbyrenderer_tpu.ops import taa as taaops
from hobbyrenderer_tpu.ops.intersect import offset_ray_origin
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits


GI_SCALE = 4      # ReSTIR GI grid divisor (ray budget, SURVEY.md §7)
GI_HALF_RATE = True   # frame-alternating checkerboard GI tracing (Rg/2 rays)
GI_TRACE_STEPS = 512  # bounce-ray traversal step cap (tail truncation)


def _csm_lod_biases():
    from hobbyrenderer_tpu.ops.csm import CASCADE_LOD_BIAS, NUM_CASCADES
    return CASCADE_LOD_BIAS[:NUM_CASCADES]


def _sun_index(gpu):
    lt = gpu.light_type
    is_dir = (lt == 0) & (jnp.arange(lt.shape[0]) < gpu.light_count)
    return jnp.argmax(is_dir), is_dir.any()


def _scene_sun_dir(ctx):
    """First directional light's direction (the sun), falling back to settings."""
    idx, has = _sun_index(ctx.gpu)
    return jnp.where(has, ctx.gpu.light_dir[idx],
                     jnp.asarray(ctx.settings.sun_direction))


def build_deferred_graph(width: int, height: int, visible_capacity: int,
                         mode: str = RenderingMode.NORMAL,
                         with_rt_shadows: bool = True,
                         occlusion_culling: bool = True,
                         with_taa: bool = True,
                         direct_mode: str = "simple",
                         indirect_mode: str = "none",
                         has_masked: bool = True,
                         has_transparent: bool = True,
                         masked_capacity: int = None,
                         transparent_capacity: int = None,
                         shadow_capacity: int = None,
                         ddgi_debug: bool = False,
                         csm_debug: bool = False,
                         tex_debug: bool = False,
                         streaming: bool = False,
                         scene_radius: float = 30.0,
                         use_regir: bool = False,
                         scene_bounds=None,
                         env_as_lights: bool = False,
                         out_width: int = None,
                         out_height: int = None,
                         denoiser_profile: str = "relax",
                         specular_indirect: bool = False,
                         restir_quality: str = "balanced",
                         regir_mode: str = "onion",
                         debug_view: str = None) -> RenderGraph:
    g = RenderGraph()
    from hobbyrenderer_tpu.ops.restir_presets import get_preset
    rq = get_preset(restir_quality)
    masked_capacity = max(masked_capacity or visible_capacity, 1)
    transparent_capacity = max(transparent_capacity or visible_capacity, 1)
    shadow_capacity = max(shadow_capacity or 4 * visible_capacity, 1)
    # scene-adaptive CSM range: a fixed world-unit shadow distance (v1: 60)
    # breaks on assets of a different scale; size it to the scene's bounding
    # sphere once at build time (ref ShadowRenderer's scene-fit cascades)
    csm_max_distance = float(min(max(2.0 * scene_radius, 20.0), 400.0))
    h0, w0, hzb_levels = hzbops.hzb_sizes(width, height)
    hzb_eff = hzbops.hzb_effective_size(width, height)

    @g.add
    @render_pass("Culling", reads=("hzb",),
                 writes=("visible_slots", "visible_count", "occluded_mask",
                         "occluded_count", "phase2_count",
                         "cull_center", "cull_radius"))
    def _culling(ctx: FrameContext, res):
        """Phase 1 of two-phase occlusion culling (Aaltonen SIGGRAPH'15, ref
        GPUCulling.hlsl:9-21): frustum/cone survivors that ALSO passed last
        frame's HZB raster now; the rest re-test against the fresh pyramid in
        RasterPhase2."""
        # opaque bucket; masked gets its own alpha-tested layer below,
        # transparent a forward pass later (ref alpha-mode instance buckets)
        alpha_ok = jnp.asarray([True, not has_masked, False])
        cull = cullops.cull_pairs(ctx.gpu, ctx.vc, alpha_mask=alpha_ok)
        base = cull["mask"]
        if occlusion_culling:
            vis_prev = cullops.hzb_test_spheres(
                res["hzb"], hzb_levels, ctx.vc,
                cull["ml_center_world"], cull["ml_radius_world"],
                eff_hw=hzb_eff)
            p1 = base & vis_prev
            occ = base & ~vis_prev
        else:
            p1 = base
            occ = jnp.zeros_like(base)
        slots, count = cullops.compact_mask(p1, visible_capacity)
        res["visible_slots"] = slots
        res["visible_count"] = count
        res["occluded_mask"] = occ
        res["occluded_count"] = occ.sum().astype(jnp.int32)
        res["phase2_count"] = jnp.int32(0)
        res["cull_center"] = cull["ml_center_world"]
        res["cull_radius"] = cull["ml_radius_world"]

    @g.add
    @render_pass("Raster", reads=("visible_slots",),
                 writes=("raster_depth", "raster_visid", "raster_overflow",
                         "raster_aux", "raster_attr"))
    def _raster(ctx, res):
        out, aux, attr = rasterops.rasterize(ctx.gpu, ctx.vc,
                                             res["visible_slots"],
                                             width, height, resolve_attrs=True)
        res["raster_depth"] = out.depth
        res["raster_visid"] = out.visid
        res["raster_overflow"] = out.overflow
        # pallas backend resolves attributes in-kernel (raster_attr);
        # the XLA backend resolves later from the per-triangle aux records
        res["raster_aux"] = aux if attr is None else jnp.int32(0)
        res["raster_attr"] = attr if attr is not None else jnp.int32(0)

    @g.add
    @render_pass("HZBBuild", reads=("raster_depth",), writes=("hzb",),
                 persistent=("hzb",))
    def _hzb(ctx, res):
        # persistent: next frame's culling tests against THIS frame's pyramid
        # (temporal coherence, ref two-phase culling phase 1, GPUCulling.hlsl:9-21)
        res["hzb"] = hzbops.build_hzb(res["raster_depth"], hzb_levels, h0, w0)

    @g.add
    @render_pass("RasterPhase2",
                 reads=("hzb", "raster_depth", "raster_visid", "raster_attr",
                        "raster_aux", "occluded_mask", "cull_center",
                        "cull_radius", "visible_slots", "phase2_count"),
                 writes=("raster_depth", "raster_visid", "raster_attr",
                         "raster_aux", "visible_slots", "phase2_count"))
    def _raster_phase2(ctx, res):
        """Phase 2: re-test last frame's occludees against the FRESH pyramid
        and raster the newly-visible ones into the visibility buffer (ref
        phase-2 re-test, src/BasePassRenderer.cpp:816-845 — this closes the
        popping hole of one-phase temporal HZB culling)."""
        vis2 = cullops.hzb_test_spheres(res["hzb"], hzb_levels, ctx.vc,
                                        res["cull_center"], res["cull_radius"],
                                        eff_hw=hzb_eff)
        mask2 = res["occluded_mask"] & vis2
        # newly-revealed pairs per frame are a small fraction of the visible
        # set (camera-coherent frames); raster setup cost scales with CAPACITY,
        # so phase 2 gets a slim table — overflowed revivals appear one frame
        # later through the same re-test (conservative, never stale-forever)
        phase2_capacity = max(visible_capacity // 8, 256)
        slots2, cnt2 = cullops.compact_mask(mask2, phase2_capacity)
        ro2, aux2, attr2 = rasterops.rasterize(ctx.gpu, ctx.vc, slots2,
                                               width, height,
                                               resolve_attrs=True)
        d1 = res["raster_depth"]
        win = ro2.depth > d1
        offset = visible_capacity * rasterops.MESHLET_MAX_TRIS
        del phase2_capacity
        res["raster_depth"] = jnp.where(win, ro2.depth, d1)
        res["raster_visid"] = jnp.where(win & (ro2.visid >= 0),
                                        ro2.visid + offset,
                                        res["raster_visid"])
        attr1 = res["raster_attr"]
        if attr2 is not None and attr1.ndim != 0:
            res["raster_attr"] = jnp.where(win[..., None], attr2, attr1)
        else:
            res["raster_aux"] = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0),
                res["raster_aux"], aux2)
        res["visible_slots"] = jnp.concatenate([res["visible_slots"], slots2])
        res["phase2_count"] = cnt2

    if not occlusion_culling:
        g.get("RasterPhase2").enabled = False

    resolve_writes = ("gbuffer",) + (("tex_feedback",) if streaming else ()) \
        + (("tex_clamp",) if tex_debug and streaming else ())

    @g.add
    @render_pass("ResolveGBuffer", reads=("raster_depth", "raster_visid",
                                          "raster_aux", "raster_attr",
                                          "visible_slots"),
                 writes=resolve_writes)
    def _resolve(ctx, res):
        ro = rasterops.RasterOutput(res["raster_depth"], res["raster_visid"],
                                    jnp.int32(0))
        attr = res["raster_attr"]
        attr = None if attr.ndim == 0 else attr
        aux = res["raster_aux"] if attr is None else None
        want_dbg = tex_debug and streaming
        out = rasterops.resolve_gbuffer(ctx.gpu, ctx.vc, ro,
                                        res["visible_slots"],
                                        aux=aux, attr_img=attr,
                                        want_feedback=streaming,
                                        want_tex_debug=want_dbg)
        if want_dbg:
            res["gbuffer"], fb, res["tex_clamp"] = out
        elif streaming:
            res["gbuffer"], fb = out
        else:
            res["gbuffer"] = out
            fb = None
        if streaming:
            # sampler-feedback resolve for the host streamer (ref
            # FeedbackManager feedback resolves)
            res["tex_feedback"] = fb if fb is not None else jnp.zeros(
                (ctx.gpu.mat_f.shape[0], 11), jnp.int32)

    @g.add
    @render_pass("MaskedLayer", reads=("gbuffer",), writes=("gbuffer",))
    def _masked_layer(ctx, res):
        """Alpha-tested (MASK) geometry as a second visibility layer: raster
        the masked bucket, sample base-color alpha at resolve, and merge
        pixels that pass the cutoff and are nearer than the opaque layer
        (ref MaskedPassRenderer's _AlphaTest PS permutation,
        src/BasePassRenderer.cpp:606-692 — the HW discards in-raster; a
        visibility buffer applies the test at resolve, one layer deep)."""
        gb = res["gbuffer"]
        alpha_ok = jnp.asarray([False, True, False])
        cull = cullops.cull_pairs(ctx.gpu, ctx.vc, alpha_mask=alpha_ok)
        slots, _cnt = cullops.compact_mask(cull["mask"], masked_capacity)
        ro, aux, attr = rasterops.rasterize(ctx.gpu, ctx.vc, slots, width,
                                            height, resolve_attrs=True)
        mgb = rasterops.resolve_gbuffer(ctx.gpu, ctx.vc, ro, slots, aux=aux,
                                        attr_img=attr)
        keep = mgb.valid & (mgb.alpha >= 0.0) & (mgb.depth > gb.depth)

        def merge(m, g_):
            k = keep[..., None] if m.ndim == 3 else keep
            return jnp.where(k, m, g_)

        merged = rasterops.GBuffer(*[merge(m, g_) for m, g_ in zip(mgb, gb)])
        res["gbuffer"] = merged._replace(valid=gb.valid | keep)

    if not has_masked:
        g.get("MaskedLayer").enabled = False

    @g.add
    @render_pass("SunShadow", reads=("gbuffer",),
                 writes=("sun_shadow", "rt_overflow_sun"))
    def _sun_shadow(ctx, res):
        """Ray-traced sun shadow mask (ref RT sun shadows + the ShadowMask R8
        target). One cone-jittered shadow ray per shadow-res pixel through the
        BVH; traced at reduced resolution (shadow_scale) and bilinearly
        upsampled — TAA integrates the jitter over frames."""
        gb = res["gbuffer"]
        res["rt_overflow_sun"] = jnp.int32(0)
        if ctx.rt is None:
            res["sun_shadow"] = jnp.ones((height, width), jnp.float32)
            return
        s = int(getattr(ctx.config, "shadow_scale", 2) or 2) if ctx.config else 2
        sh, sw = height // s, width // s
        pos_s = gb.world_pos[::s, ::s][:sh, :sw]
        gn_s = gb.geo_normal[::s, ::s][:sh, :sw]
        valid_s = gb.valid[::s, ::s][:sh, :sw]
        sun_dir = _scene_sun_dir(ctx)
        to_sun = -sun_dir
        pos = pos_s.reshape(-1, 3)
        gn = gn_s.reshape(-1, 3)
        pix = jnp.arange(pos.shape[0], dtype=jnp.uint32)
        frame = jnp.broadcast_to(ctx.vc["frame_index"].astype(jnp.uint32), pix.shape)
        bits = pcg3d(jnp.stack([pix, frame, jnp.full_like(pix, 77)], -1))
        u1 = uniform_from_bits(bits[..., 0])
        u2 = uniform_from_bits(bits[..., 1])
        cos_max = jnp.cos(ctx.settings.sun_angular_radius)
        L = smp.sample_cone(jnp.broadcast_to(to_sun, pos.shape), cos_max, u1, u2)
        facing = (jnp.sum(L * gn, -1) > 0) & valid_s.reshape(-1)
        bias = ctx.settings.shadow_bias
        o = pos + gn * bias + L * bias
        if getattr(ctx.rt, "btable", None) is not None \
                and rasterops._use_pallas(None):
            # coherent sun rays: beam-traversal kernel (ops/beam.py) — one
            # shared BVH walk per 32x32 tile, ~80x the per-ray wavefront
            from hobbyrenderer_tpu.ops import beam as beamops
            occ, n_ovf = beamops.beam_any_hit(
                ctx.rt.btable, o.reshape(sh, sw, 3), L.reshape(sh, sw, 3),
                jnp.where(facing, 1e8, 1e-4).reshape(sh, sw),
                facing.reshape(sh, sw), sh, sw, return_overflow=True)
            occ = occ.reshape(-1)
            res["rt_overflow_sun"] = n_ovf
        else:
            occ = bvhops.bvh_any_hit(ctx.rt.bvh, o, L,
                                     t_max=jnp.where(facing, 1e8, 1e-4))
        vis = jnp.where(facing, 1.0 - occ.astype(jnp.float32), 0.0)
        vis = jnp.where(valid_s.reshape(-1), vis, 1.0).reshape(sh, sw)
        if s > 1:
            vis = jax.image.resize(vis, (height, width), method="bilinear")
        res["sun_shadow"] = vis

    use_restir = (direct_mode == "restir"
                  and mode in (RenderingMode.NORMAL, RenderingMode.IBL))
    if use_restir or not (with_rt_shadows
                          and mode in (RenderingMode.NORMAL, RenderingMode.IBL)):
        g.get("SunShadow").enabled = False

    dv_csm = bool(debug_view and debug_view.startswith("csm_"))
    dv_ssgi = bool(debug_view and debug_view.startswith("ssgi_"))
    dv_sharc = bool(debug_view and debug_view.startswith("sharc_"))
    csm_writes = (("sun_shadow", "csm_data") if (csm_debug or dv_csm)
                  else ("sun_shadow",))

    @g.add
    @render_pass("ShadowCSM", reads=("gbuffer",), writes=csm_writes)
    def _shadow_csm(ctx, res):
        """NormalBasic sun shadows: 4-cascade depth raster from the light +
        fullscreen PCF mask (ref ShadowRenderer + ShadowMaskRenderer)."""
        from hobbyrenderer_tpu.ops import csm as csmops
        from hobbyrenderer_tpu.ops import sss as sssops
        gb = res["gbuffer"]
        sun_dir = _scene_sun_dir(ctx)
        data = csmops.render_cascades(ctx.gpu, ctx.vc, sun_dir, shadow_capacity,
                                      max_distance=csm_max_distance)
        if csm_debug or dv_csm:
            res["csm_data"] = data
        # mask evaluated at half res (PCF table lookups are gather-bound on
        # TPU); PCF + bilinear upsample + TAA hide the resolution
        s = 2
        sh, sw = height // s, width // s
        mask = csmops.csm_shadow_mask(
            data, ctx.vc, gb.world_pos[::s, ::s][:sh, :sw],
            gb.geo_normal[::s, ::s][:sh, :sw],
            gb.valid[::s, ::s][:sh, :sw], sun_dir)
        mask = jax.image.resize(mask, (height, width), method="bilinear")
        # Bend-style screen-space contact shadows multiplied in
        # (ref ShadowMaskRenderer: bend_sss march * CSM mask)
        mask = mask * sssops.screen_space_shadows(gb, ctx.vc, sun_dir)
        res["sun_shadow"] = mask

    if mode != RenderingMode.NORMAL_BASIC:
        g.get("ShadowCSM").enabled = False

    @g.add
    @render_pass("IBL", reads=(), writes=("sky_irradiance",))
    def _ibl(ctx, res):
        """Per-frame sky irradiance integration (ref CommonResources IBL
        cubemaps; dynamic here because the env is the procedural sky). With an
        authored environment map, its load-time SH projection is used
        instead (ref IBL mode's prebaked irradiance cubemap). Ordered before
        the RT indirect passes: they add the sky-SH exitance at bounce hits."""
        from hobbyrenderer_tpu.ops import ibl as iblops
        if env_as_lights:
            # the env rides the ReSTIR pool as directional lights; zero the
            # ambient term so its energy is not counted twice
            res["sky_irradiance"] = jnp.zeros((9, 3), jnp.float32)
        elif ctx.gpu.env_sh is not None:
            res["sky_irradiance"] = ctx.gpu.env_sh
        else:
            res["sky_irradiance"] = iblops.build_sky_irradiance(
                _scene_sun_dir(ctx), ctx.settings)

    @g.add
    @render_pass("RTXDI", reads=("gbuffer", "restir_reservoir"),
                 writes=("restir_direct", "restir_reservoir",
                         "rt_overflow_di"),
                 persistent=("restir_reservoir",))
    def _rtxdi(ctx, res):
        """ReSTIR DI chain (ref RTXDIRenderer, SURVEY.md §2.6 #41)."""
        from hobbyrenderer_tpu.ops import restir as restirops
        grid = None
        if use_regir and ctx.rt is not None and ctx.rt.lights is not None \
                and scene_bounds is not None:
            # per-frame world-space cell reservoirs (ref ReGIR grid build).
            # Onion mode is the reference default (RTXDIRenderer.cpp:781-786):
            # camera-centered detail+coverage shells.
            from hobbyrenderer_tpu.ops import regir as regirops
            if regir_mode == "onion":
                grid = regirops.build_regir_onion(
                    ctx.rt.lights, ctx.vc["camera_pos"], scene_radius,
                    ctx.vc["frame_index"])
            else:
                grid = regirops.build_regir_grid(
                    ctx.rt.lights, jnp.asarray(scene_bounds[0]),
                    jnp.asarray(scene_bounds[1]), ctx.vc["frame_index"])
        so = {}
        direct, new_res = restirops.restir_di(
            ctx.gpu, ctx.rt, res["gbuffer"], ctx.vc, ctx.settings,
            res["restir_reservoir"], ctx.vc["frame_index"],
            visibility=ctx.rt is not None, regir_grid=grid, stats_out=so,
            num_candidates=rq.di_candidates, spatial_taps=rq.di_spatial_taps,
            boiling_mult=rq.di_boiling_mult,
            checkerboard=rq.di_checkerboard, vis_scale=rq.di_vis_scale)
        res["restir_direct"] = direct
        res["restir_reservoir"] = new_res
        res["rt_overflow_di"] = so.get("overflow", jnp.int32(0))

    if not use_restir:
        g.get("RTXDI").enabled = False

    use_restir_gi = (indirect_mode == "restir"
                     and mode in (RenderingMode.NORMAL, RenderingMode.IBL))

    @g.add
    @render_pass("RTXDIGI", reads=("gbuffer", "restir_gi_reservoir",
                                   "sky_irradiance"),
                 writes=("restir_indirect", "restir_gi_reservoir",
                         "rt_overflow_gi"),
                 persistent=("restir_gi_reservoir",))
    def _rtxdi_gi(ctx, res):
        """ReSTIR GI chain (ref RTXDIRenderer GI passes,
        src/RTXDIRenderer.cpp:2256-2293). Bounce hits add the sky-SH diffuse
        exitance (the sky->hit->receiver path PT integrates)."""
        from hobbyrenderer_tpu.ops import restir_gi as giops
        so = {}
        ind, new_res = giops.restir_gi(
            ctx.gpu, ctx.rt, res["gbuffer"], ctx.vc, ctx.settings,
            res["restir_gi_reservoir"], ctx.vc["frame_index"],
            scale=GI_SCALE, half_rate=rq.gi_half_rate,
            trace_max_steps=GI_TRACE_STEPS,
            skip_pool_emissive=use_restir, stats_out=so,
            sky_sh=res["sky_irradiance"],
            ibl_scale=ctx.settings.ibl_intensity * ctx.settings.ambient_scale,
            spatial_taps=rq.gi_spatial_taps, m_clamp=rq.gi_m_clamp)
        res["restir_indirect"] = ind
        res["restir_gi_reservoir"] = new_res
        res["rt_overflow_gi"] = so.get("overflow", jnp.int32(0))

    if not use_restir_gi:
        g.get("RTXDIGI").enabled = False

    @g.add
    @render_pass("Denoise", reads=("restir_direct", "gbuffer", "denoise_state"),
                 writes=("restir_direct", "denoise_state"),
                 persistent=("denoise_state",))
    def _denoise(ctx, res):
        """NRD-class denoise of the stochastic direct signal (ref
        NrdIntegration, SURVEY.md §2.6 #53): RELAX or REBLUR profile
        (--denoiser)."""
        from hobbyrenderer_tpu.ops import denoise as dnops
        out, st = dnops.denoise(res["restir_direct"], res["gbuffer"],
                                res["denoise_state"],
                                profile=denoiser_profile)
        res["restir_direct"] = out
        res["denoise_state"] = st

    if not use_restir:
        g.get("Denoise").enabled = False

    # "combined" = ReSTIR DI + SHARC-backed indirect (ref bCombinedMode,
    # src/RTXDIRenderer.cpp:2185-2208): the cache updates as usual, but the
    # indirect signal comes from a TRACED half-res diffuse ray whose hit
    # queries the resolved cache — first-bounce visibility is exact, the
    # cache supplies the multi-bounce tail.
    use_sharc = (indirect_mode in ("sharc", "combined")
                 and mode in (RenderingMode.NORMAL, RenderingMode.IBL))
    use_sharc_traced = use_sharc and indirect_mode == "combined"

    @g.add
    @render_pass("SHARC", reads=("gbuffer", "sharc_cache", "sky_irradiance"),
                 writes=("sharc_cache", "sharc_indirect"),
                 persistent=("sharc_cache",))
    def _sharc(ctx, res):
        """SHARC radiance cache: sparse secondary-bounce update + resolve +
        full-res query (ref SHARCRenderer, SURVEY.md §2.6 #42)."""
        from hobbyrenderer_tpu.ops import sharc as sharcops
        gb = res["gbuffer"]
        cache = res["sharc_cache"]
        cam = ctx.vc["camera_pos"]
        if ctx.rt is not None:
            s = 4  # sparse update: quarter-res sample grid
            sh, sw = height // s, width // s
            pos = gb.world_pos[::s, ::s][:sh, :sw].reshape(-1, 3)
            nrm = gb.normal[::s, ::s][:sh, :sw].reshape(-1, 3)
            gn = gb.geo_normal[::s, ::s][:sh, :sw].reshape(-1, 3)
            alb = gb.albedo[::s, ::s][:sh, :sw].reshape(-1, 3)
            val = gb.valid[::s, ::s][:sh, :sw].reshape(-1)
            R = pos.shape[0]
            pix = jnp.arange(R, dtype=jnp.uint32)
            frame = ctx.vc["frame_index"].astype(jnp.uint32)
            bits = pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                                    jnp.full_like(pix, 55)], -1))
            u1 = uniform_from_bits(bits[..., 0])
            u2 = uniform_from_bits(bits[..., 1])
            d = smp.to_world(nrm, smp.cosine_sample_hemisphere(u1, u2))
            o = offset_ray_origin(pos, gn, d) + gn * ctx.settings.shadow_bias
            from hobbyrenderer_tpu.ops import trace as traceops
            hit = traceops.closest_hit_auto(ctx.rt, o, d, active=val,
                                            max_steps=512)
            # outgoing radiance at the bounce hit: emissive + ONE power-CDF
            # NEE light sample WITH a shadow ray (ref SHARCUpdate.hlsl's real
            # NEE; the former unshadowed sun-only sample converged the cache
            # to a biased value in occluded interiors). Shared GI machinery.
            from hobbyrenderer_tpu.ops.restir_gi import _hit_radiance
            hpos, hn, h_rad = _hit_radiance(
                ctx.gpu, ctx.rt, ctx.rt.lights, hit, o, d,
                pix + jnp.uint32(0x5A4C), frame,
                skip_pool_emissive=False,
                sky_sh=res["sky_irradiance"],
                ibl_scale=(ctx.settings.ibl_intensity
                           * ctx.settings.ambient_scale))
            # multi-bounce propagation: the cache's previous-frame value at
            # the HIT cell is the indirect exitance there (ref SHARC
            # path-continuation cache lookups) — one extra bounce per frame
            fb, fb_hit = sharcops.sharc_query(cache, hpos, hn, cam)
            L_hit = h_rad + jnp.where(fb_hit[..., None], fb, 0.0)
            # cosine-sampled bounce: indirect irradiance/pi estimate = albedo*L
            sample = alb * L_hit
            # miss -> 0: sky visibility is covered by the IBL ambient term
            miss = hit.tri < 0
            sample = jnp.where(miss[..., None], 0.0, sample)
            cache = sharcops.sharc_update(cache, pos, nrm, sample, val, cam)
        cache = sharcops.sharc_resolve(cache)
        res["sharc_cache"] = cache
        ind, hit_mask = sharcops.sharc_query(
            cache, gb.world_pos.reshape(-1, 3), gb.normal.reshape(-1, 3), cam)
        res["sharc_indirect"] = ind.reshape(height, width, 3)

    if not use_sharc:
        g.get("SHARC").enabled = False

    @g.add
    @render_pass("SharcIndirectQuery",
                 reads=("gbuffer", "sharc_cache", "sky_irradiance",
                        "sharc_q_state"),
                 writes=("sharc_indirect", "sharc_q_state"),
                 persistent=("sharc_q_state",))
    def _sharc_query_traced(ctx, res):
        """Combined ReSTIR-GI+SHARC indirect (ref SharcIndirectQuery,
        src/RTXDIRenderer.cpp:2185-2208): one cosine diffuse ray per half-res
        pixel; the hit contributes its NEE-shaded direct + emissive + sky-SH
        exitance PLUS the resolved cache's multi-bounce tail at the hit cell.
        Replaces the primary-surface cache query (exact first-bounce
        visibility; no primary-cell light leaks). RELAX temporal + short
        A-trous at the trace grid, bilinearly upsampled."""
        from hobbyrenderer_tpu.ops import denoise as dnops
        from hobbyrenderer_tpu.ops import sharc as sharcops
        from hobbyrenderer_tpu.ops import trace as traceops
        from hobbyrenderer_tpu.ops.restir_gi import _hit_radiance
        from hobbyrenderer_tpu.ops.specular import _SubGB
        gb = res["gbuffer"]
        if ctx.rt is None:
            res["sharc_indirect"] = jnp.zeros((height, width, 3), jnp.float32)
            res["sharc_q_state"] = res["sharc_q_state"]
            return
        s_ = 2
        sh, sw = height // s_, width // s_
        sub = lambda img: img[::s_, ::s_][:sh, :sw]
        pos = sub(gb.world_pos).reshape(-1, 3)
        nrm = sub(gb.normal).reshape(-1, 3)
        gn = sub(gb.geo_normal).reshape(-1, 3)
        alb = sub(gb.albedo).reshape(-1, 3)
        val = sub(gb.valid).reshape(-1)
        R = pos.shape[0]
        pix = jnp.arange(R, dtype=jnp.uint32)
        frame = ctx.vc["frame_index"].astype(jnp.uint32)
        bits = pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                                jnp.full_like(pix, 77)], -1))
        u1 = uniform_from_bits(bits[..., 0])
        u2 = uniform_from_bits(bits[..., 1])
        d = smp.to_world(nrm, smp.cosine_sample_hemisphere(u1, u2))
        o = offset_ray_origin(pos, gn, d) + gn * ctx.settings.shadow_bias
        hit = traceops.closest_hit_auto(ctx.rt, o, d, active=val,
                                            max_steps=512)
        hpos, hn, h_rad = _hit_radiance(
            ctx.gpu, ctx.rt, ctx.rt.lights, hit, o, d,
            pix + jnp.uint32(0xC0B1), frame,
            skip_pool_emissive=use_restir,
            sky_sh=res["sky_irradiance"],
            ibl_scale=(ctx.settings.ibl_intensity
                       * ctx.settings.ambient_scale))
        fb, fb_ok = sharcops.sharc_query(res["sharc_cache"], hpos, hn,
                                         ctx.vc["camera_pos"])
        rad = h_rad + jnp.where((fb_ok & (hit.tri >= 0))[..., None], fb, 0.0)
        # cosine-sampled single bounce, DEMODULATED: the grid carries
        # irradiance/pi (rad; cos/pi pdf cancels) so full-res albedo detail
        # is re-applied after the filter/upsample instead of being blurred
        # (the NRD demodulation convention)
        irr = jnp.where((val & (hit.tri >= 0))[..., None], rad, 0.0)
        irr = irr.reshape(sh, sw, 3)
        sgb = _SubGB(motion=sub(gb.motion) / float(s_), depth=sub(gb.depth),
                     normal=sub(gb.normal), valid=sub(gb.valid))
        color, var, st = dnops.temporal_accumulate(irr, sgb,
                                                   res["sharc_q_state"])
        color = dnops.atrous_filter(color, var, sgb, iterations=2)
        from hobbyrenderer_tpu.ops.upsample import joint_bilateral_upsample
        full_irr = joint_bilateral_upsample(
            color, sgb.depth, sgb.normal, sgb.valid,
            gb.depth, gb.normal, s_)
        res["sharc_indirect"] = jnp.where(gb.valid[..., None],
                                          gb.albedo * full_irr, 0.0)
        res["sharc_q_state"] = st

    if not use_sharc_traced:
        g.get("SharcIndirectQuery").enabled = False

    use_ddgi = indirect_mode == "ddgi"

    @g.add
    @render_pass("DDGI", reads=("gbuffer", "ddgi_volume"),
                 writes=("ddgi_indirect", "ddgi_volume"),
                 persistent=("ddgi_volume",))
    def _ddgi(ctx, res):
        """DDGI probe volume: per-frame probe-ray trace + octahedral blend +
        classification, then a quarter-res irradiance query (ref
        src/DDGIRenderer.cpp:449-548, SURVEY.md §2.6 #44)."""
        from hobbyrenderer_tpu.ops import ddgi as ddgiops
        gb = res["gbuffer"]
        # variability-gated tracing (ref DDGI variability reduction): once
        # the volume has converged, the probe-ray trace is skipped except for
        # a keep-alive update every 8th frame (catches slow scene changes)
        prev_vol = res["ddgi_volume"]
        frame = ctx.vc["frame_index"]
        do_trace = (prev_vol.variability > 0.01) | (frame % 8 == 0)
        vol = jax.lax.cond(
            do_trace,
            lambda v: ddgiops.ddgi_update(v, ctx.gpu, ctx.rt, ctx.settings,
                                          frame),
            lambda v: v,
            prev_vol)
        s = 4
        sh, sw = height // s, width // s
        sub = lambda img: img[::s, ::s][:sh, :sw]
        pos = sub(gb.world_pos).reshape(-1, 3)
        nrm = sub(gb.normal).reshape(-1, 3)
        E = ddgiops.ddgi_query(vol, pos, nrm).reshape(sh, sw, 3)
        # depth/normal-guided upsample (the quarter-res irradiance grid
        # bleeds across geometry edges under a plain bilinear resize)
        from hobbyrenderer_tpu.ops.upsample import joint_bilateral_upsample
        E = joint_bilateral_upsample(E, sub(gb.depth), sub(gb.normal),
                                     sub(gb.valid), gb.depth, gb.normal, s)
        ind = (gb.albedo / jnp.pi) * E
        res["ddgi_indirect"] = jnp.where(gb.valid[..., None], ind, 0.0)
        res["ddgi_volume"] = vol

    if not use_ddgi:
        g.get("DDGI").enabled = False

    use_ssgi = indirect_mode == "ssgi"

    ssgi_writes = ("ssgi_indirect", "ssgi_state") \
        + (("ssgi_debug",) if dv_ssgi else ())

    @g.add
    @render_pass("SSGI", reads=("gbuffer", "sky_irradiance", "taa_history",
                                "ssgi_state"),
                 writes=ssgi_writes,
                 persistent=("ssgi_state",))
    def _ssgi(ctx, res):
        """Screen-space GI (ref SSGIRenderer, SURVEY.md §2.6 #43): half-res
        march + temporal accumulation via the RELAX temporal stage."""
        from hobbyrenderer_tpu.ops import ssgi as ssgiops
        from hobbyrenderer_tpu.ops import denoise as dnops
        gb = res["gbuffer"]
        prev_hdr = res["taa_history"]
        if upscale:
            # under TAA upscaling the history lives at OUTPUT resolution;
            # SSGI marches at render resolution
            prev_hdr = jax.image.resize(prev_hdr, (height, width, 3),
                                        "bilinear")
        dv = {} if dv_ssgi else None
        raw = ssgiops.ssgi_half_res(gb, ctx.vc, prev_hdr,
                                    res["sky_irradiance"], ctx.settings,
                                    ctx.vc["frame_index"], debug_out=dv)
        # full denoise chain (demodulated internally): the A-trous smooths
        # irradiance, not albedo detail
        out, st = dnops.denoise(raw, gb, res["ssgi_state"], debug_out=dv)
        res["ssgi_indirect"] = out
        res["ssgi_state"] = st
        if dv_ssgi:
            dv["composed"] = out
            dv["view_dir"] = skyops.view_dirs_from_pixels(ctx.vc, height,
                                                          width)
            res["ssgi_debug"] = dv

    if not use_ssgi:
        g.get("SSGI").enabled = False

    # traced specular indirect (ref BrdfRayTracing + ShadeSecondarySurfaces,
    # src/RTXDIRenderer.cpp:2218-2235): any RT indirect mode gets it
    use_spec = (specular_indirect and with_rt_shadows
                and mode in (RenderingMode.NORMAL, RenderingMode.IBL)
                and indirect_mode in ("restir", "sharc", "ddgi",
                                      "combined"))
    spec_reads = ("gbuffer", "spec_state", "sky_irradiance") \
        + (("sharc_cache",) if use_sharc else ())

    @g.add
    @render_pass("SpecularIndirect", reads=spec_reads,
                 writes=("spec_indirect", "spec_weight", "spec_state"),
                 persistent=("spec_state",))
    def _spec_indirect(ctx, res):
        """GGX-VNDF reflection rays for glossy pixels (ops/specular.py):
        replaces the split-sum IBL specular where roughness permits tracing —
        mirrors show geometry/emitters, env reflections get occlusion."""
        from hobbyrenderer_tpu.ops import specular as specops
        gb = res["gbuffer"]
        if ctx.rt is None:
            res["spec_indirect"] = jnp.zeros((height, width, 3), jnp.float32)
            res["spec_weight"] = jnp.zeros((height, width), jnp.float32)
            res["spec_state"] = res["spec_state"]
            return
        env_fn = None
        if ctx.gpu.env_map is not None and not env_as_lights:
            from hobbyrenderer_tpu.ops import envmap as envops
            env_fn = lambda dd: envops.sample_equirect(ctx.gpu.env_map, dd)
        spec, w_blend, st = specops.specular_indirect(
            ctx.gpu, ctx.rt, gb, ctx.vc, ctx.settings, res["spec_state"],
            ctx.vc["frame_index"], env_fn=env_fn,
            sun_dir=_scene_sun_dir(ctx),
            sharc_cache=res.get("sharc_cache") if use_sharc else None,
            skip_pool_emissive=use_restir,
            include_env_miss=not env_as_lights,
            sky_sh=res["sky_irradiance"],
            ibl_scale=(ctx.settings.ibl_intensity
                       * ctx.settings.ambient_scale),
            half_rate=rq.spec_half_rate)
        res["spec_indirect"] = spec
        res["spec_weight"] = w_blend
        res["spec_state"] = st

    if not use_spec:
        g.get("SpecularIndirect").enabled = False

    reads = ("gbuffer", "sun_shadow", "sky_irradiance") \
        + (("spec_indirect", "spec_weight") if use_spec else ()) \
        + (("restir_direct",) if use_restir else ()) \
        + (("sharc_indirect",) if use_sharc else ()) \
        + (("ssgi_indirect",) if use_ssgi else ()) \
        + (("restir_indirect",) if use_restir_gi else ()) \
        + (("ddgi_indirect",) if use_ddgi else ())

    @g.add
    @render_pass("DeferredLighting", reads=reads, writes=("hdr",))
    def _deferred(ctx, res):
        gb = res["gbuffer"]
        vdir = skyops.view_dirs_from_pixels(ctx.vc, height, width)
        v = -vdir
        rough = gb.orm[..., 1]
        metal = gb.orm[..., 2]
        if use_restir:
            direct = res["restir_direct"]
        else:
            sun_idx, _has = _sun_index(ctx.gpu)
            if g.get("SunShadow").enabled or g.get("ShadowCSM").enabled:
                mask = res["sun_shadow"]

                def shadow_fn(i, L, dist):
                    return jnp.where(i == sun_idx, mask, 1.0)
            else:
                shadow_fn = None
            direct = shadeops.shade_all_lights(ctx.gpu, gb.world_pos, gb.normal, v,
                                               gb.albedo, metal, rough,
                                               shadow_fn=shadow_fn)
        from hobbyrenderer_tpu.ops import ibl as iblops
        ibl_scale = ctx.settings.ibl_intensity * ctx.settings.ambient_scale
        if mode == RenderingMode.IBL:
            ibl_scale = ibl_scale * 2.0   # IBL-dominant mode (ref ApplyRenderingModeDefaults)
        if env_as_lights:
            # the env rides the ReSTIR pool (diffuse AND specular through
            # eval_brdf) — any ambient term would double count it
            ambient = jnp.zeros_like(gb.albedo)
        else:
            env_fn = None
            if ctx.gpu.env_map is not None:
                from hobbyrenderer_tpu.ops import envmap as envops
                env_fn = lambda d: envops.sample_equirect(ctx.gpu.env_map, d)
            ambient = iblops.ibl_ambient(
                res["sky_irradiance"], gb.normal, v, gb.albedo, metal, rough,
                _scene_sun_dir(ctx), ctx.settings, intensity=ibl_scale,
                env_fn=env_fn,
                spec_suppress=res["spec_weight"] if use_spec else None,
                brdf_lut=ctx.gpu.brdf_lut)
        hdr = direct + ambient + gb.emissive
        if use_spec:
            hdr = hdr + res["spec_indirect"]
        if use_sharc:
            hdr = hdr + res["sharc_indirect"]
        if use_ssgi:
            hdr = hdr + res["ssgi_indirect"]
        if use_restir_gi:
            hdr = hdr + res["restir_indirect"]
        if use_ddgi:
            hdr = hdr + res["ddgi_indirect"]
        res["hdr"] = jnp.where(gb.valid[..., None], hdr, 0.0)

    @g.add
    @render_pass("Sky", reads=("gbuffer", "hdr"), writes=("hdr",))
    def _sky(ctx, res):
        gb = res["gbuffer"]
        vdir = skyops.view_dirs_from_pixels(ctx.vc, height, width)
        if ctx.gpu.env_map is not None:
            from hobbyrenderer_tpu.ops import envmap as envops
            sky = envops.sample_equirect(ctx.gpu.env_map, vdir)
        else:
            sky = skyops.sky_radiance_fast(vdir, _scene_sun_dir(ctx),
                                           ctx.settings)
        res["hdr"] = jnp.where(gb.valid[..., None], res["hdr"], sky)

    @g.add
    @render_pass("Transparent", reads=("gbuffer", "hdr", "sky_irradiance"),
                 writes=("hdr",))
    def _transparent(ctx, res):
        """Forward transparency over the lit opaque frame — shared shard-aware
        implementation in ops/transparent.py (ref TransparentPassRenderer,
        src/BasePassRenderer.cpp:694-814, src/shaders/BasePass.hlsl:266-483)."""
        from hobbyrenderer_tpu.ops import transparent as transops
        env_fn = None
        if ctx.gpu.env_map is not None:
            from hobbyrenderer_tpu.ops import envmap as envops
            env_fn = lambda d: envops.sample_equirect(ctx.gpu.env_map, d)
        ibl_scale = ctx.settings.ibl_intensity * ctx.settings.ambient_scale
        if mode == RenderingMode.IBL:
            ibl_scale = ibl_scale * 2.0   # match DeferredLighting
        res["hdr"] = transops.transparent_composite(
            ctx.gpu, ctx.vc, ctx.settings, res["gbuffer"], res["hdr"],
            width=width, height=height,
            transparent_capacity=transparent_capacity,
            sun_dir=_scene_sun_dir(ctx), sky_sh=res["sky_irradiance"],
            env_as_lights=env_as_lights, env_fn=env_fn, ibl_scale=ibl_scale)

    if not has_transparent:
        g.get("Transparent").enabled = False

    ow = out_width or width
    oh = out_height or height
    upscale = (ow != width) or (oh != height)

    @g.add
    @render_pass("TAA", reads=("hdr", "gbuffer", "taa_history", "taa_valid"),
                 writes=("hdr", "taa_history", "taa_valid"),
                 persistent=("taa_history", "taa_valid"))
    def _taa(ctx, res):
        gb = res["gbuffer"]
        if upscale:
            # TAA UPSCALING (the FSR3 upscaler capability): jittered low-res
            # render accumulates into a full-res history; post runs full-res
            out = taaops.taau_resolve(res["hdr"], res["taa_history"],
                                      gb.motion, res["taa_valid"],
                                      ctx.settings, ctx.vc["jitter"], oh, ow)
        else:
            out = taaops.taa_resolve(res["hdr"], res["taa_history"], gb.motion,
                                     res["taa_valid"], ctx.settings)
        res["hdr"] = out
        res["taa_history"] = out
        res["taa_valid"] = jnp.bool_(True)

    if not with_taa:
        g.get("TAA").enabled = False

    @g.add
    @render_pass("AutoExposure", reads=("hdr",), writes=("exposure", "histogram"),
                 persistent=("exposure",))
    def _exposure(ctx, res):
        hist = postops.luminance_histogram(res["hdr"])
        prev = res.get("exposure")
        res["histogram"] = hist
        res["exposure"] = postops.exposure_adapt(hist, prev, ctx.dt, ctx.settings)

    @g.add
    @render_pass("Bloom", reads=("hdr",), writes=("hdr",))
    def _bloom(ctx, res):
        res["hdr"] = postops.bloom(res["hdr"], ctx.settings)

    @g.add
    @render_pass("Tonemap", reads=("hdr", "exposure"), writes=("ldr",))
    def _tonemap(ctx, res):
        res["ldr"] = postops.tonemap_to_output(res["hdr"], res["exposure"])


    @g.add
    @render_pass("DDGIDebug", reads=("ldr", "ddgi_volume"), writes=("ldr",))
    def _ddgi_debug(ctx, res):
        """Probe visualization overlay (ref DDGI probe vis, SURVEY.md
        §2.6 #52): live probes splat their mean irradiance, dead probes red."""
        from hobbyrenderer_tpu.ops import ddgi as ddgiops
        res["ldr"] = ddgiops.ddgi_probe_overlay(res["ldr"], res["ddgi_volume"],
                                                ctx.vc)

    if not (use_ddgi and ddgi_debug) or upscale:
        g.get("DDGIDebug").enabled = False

    @g.add
    @render_pass("CSMDebug", reads=("ldr", "csm_data", "gbuffer"),
                 writes=("ldr",))
    def _csm_debug(ctx, res):
        """Cascade debug view (ref src/CSMDebugRenderer.cpp, SURVEY.md §2.6
        #40): per-pixel cascade tint + shadow-map thumbnails."""
        from hobbyrenderer_tpu.ops import csm as csmops
        gb = res["gbuffer"]
        res["ldr"] = csmops.csm_debug_overlay(res["ldr"], res["csm_data"],
                                              ctx.vc, gb.world_pos, gb.valid)

    # debug overlays sample render-res G-buffer data against the output-res
    # LDR; they stay native-res-only
    if not (csm_debug and mode == RenderingMode.NORMAL_BASIC) or upscale:
        g.get("CSMDebug").enabled = False

    @g.add
    @render_pass("TexResidencyDebug", reads=("ldr", "tex_clamp"),
                 writes=("ldr",))
    def _tex_debug(ctx, res):
        """Texture-streaming residency heatmap (ref
        src/Streaming/TileResidencyDebugRenderer.cpp): each textured pixel
        tints by how many mips COARSER its sample came back than the
        footprint asked for (residency clamp) — green = desired mip resident,
        yellow ~1 mip short, red >= 3 mips short. Untextured/sky pixels keep
        the frame."""
        c = res["tex_clamp"]                       # (H, W) mips clamped away
        t = jnp.clip(c / 3.0, 0.0, 1.0)
        heat = jnp.stack([jnp.clip(2.0 * t, 0.0, 1.0),
                          jnp.clip(2.0 - 2.0 * t, 0.0, 1.0),
                          jnp.zeros_like(t)], -1)
        w = jnp.where(c > 1e-3, 0.55, 0.22)[..., None]
        ldr_f = res["ldr"].astype(jnp.float32) / 255.0
        out = ldr_f * (1.0 - w) + heat * w
        res["ldr"] = (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    if not (tex_debug and streaming) or upscale:
        g.get("TexResidencyDebug").enabled = False

    if debug_view:
        from hobbyrenderer_tpu.ops import debugview as dvops
        if debug_view not in dvops.ALL_VIEWS:
            raise ValueError(f"unknown --debug-view '{debug_view}' "
                             f"(one of {', '.join(dvops.ALL_VIEWS)})")
        if upscale:
            raise ValueError("--debug-view needs native resolution "
                             "(no --render-scale)")
        if dv_csm and mode != RenderingMode.NORMAL_BASIC:
            raise ValueError("csm_* debug views need --mode normal_basic "
                             "(CSM is the NormalBasic sun-shadow path)")
        if dv_ssgi and not use_ssgi:
            raise ValueError("ssgi_* debug views need --indirect-mode ssgi")
        if dv_sharc and not (use_sharc or use_sharc_traced):
            raise ValueError("sharc_* debug views need --indirect-mode "
                             "sharc/combined")
        dv_reads = ("ldr", "gbuffer") \
            + (("csm_data", "sun_shadow") if dv_csm else ()) \
            + (("ssgi_debug",) if dv_ssgi else ()) \
            + (("sharc_cache",) if dv_sharc else ()) \
            + (("sharc_indirect",) if dv_sharc else ())

        @g.add
        @render_pass("DebugView", reads=dv_reads, writes=("ldr",))
        def _debug_view(ctx, res):
            """Named debug visualization (ref CSMDebug.hlsl modes /
            SSGIDebugMode / SHARCDebugMode outputs — src/shaders/
            Common.sr:170-221). Replaces the frame with the diagnostic."""
            gb = res["gbuffer"]
            ldr_f = res["ldr"].astype(jnp.float32) / 255.0
            if dv_csm:
                from hobbyrenderer_tpu.scene.gpu import MATI_ALPHA_MODE
                mid = jnp.maximum(gb.material, 0)
                masked = (ctx.gpu.mat_i[mid, MATI_ALPHA_MODE] == 1) \
                    & (gb.material >= 0)
                img = dvops.csm_view(debug_view, ldr_f, gb, res["csm_data"],
                                     ctx.vc, res["sun_shadow"],
                                     masked=masked)
            elif dv_ssgi:
                img = dvops.ssgi_view(debug_view, ldr_f, gb,
                                      res["ssgi_debug"])
            else:
                from hobbyrenderer_tpu.ops import sharc as sharcops
                cache = res["sharc_cache"]
                cam = ctx.vc["camera_pos"]
                pos = gb.world_pos.reshape(-1, 3)
                nrm = gb.normal.reshape(-1, 3)
                rad, hit = sharcops.sharc_query(cache, pos, nrm, cam)
                dv = {"cell": sharcops._cell_key(pos, nrm, cam)
                      .reshape(height, width).astype(jnp.int32),
                      "radiance": res["sharc_indirect"],
                      "hit": hit.reshape(height, width)
                      .astype(jnp.float32)}
                img = dvops.sharc_view(debug_view, ldr_f, gb, dv)
            res["ldr"] = (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5) \
                .astype(jnp.uint8)

    return g


def initial_frame_state(width: int, height: int,
                        direct_mode: str = "simple",
                        indirect_mode: str = "none",
                        scene_bounds=None,
                        out_width: int = None,
                        out_height: int = None,
                        specular_indirect: bool = False) -> Dict[str, jnp.ndarray]:
    """Persistent resources seed (ref persistent render-graph resources:
    exposure, HZB, TAA history, light reservoirs — src/CommonRenderers.cpp).
    out_* differ from width/height under TAA upscaling (the history lives at
    OUTPUT resolution)."""
    h0, w0, levels = hzbops.hzb_sizes(width, height)
    state = {
        "exposure": jnp.float32(1.0),
        "hzb": jnp.zeros((levels, h0, w0), jnp.float32),
        "taa_history": jnp.zeros((out_height or height, out_width or width, 3),
                                 jnp.float32),
        "taa_valid": jnp.bool_(False),
    }
    if direct_mode == "restir":
        from hobbyrenderer_tpu.ops.restir import reservoir_init
        from hobbyrenderer_tpu.ops.denoise import denoise_init
        state["restir_reservoir"] = reservoir_init(height, width)
        state["denoise_state"] = denoise_init(height, width)
    if indirect_mode in ("sharc", "combined"):
        from hobbyrenderer_tpu.ops.sharc import sharc_init
        state["sharc_cache"] = sharc_init()
    if indirect_mode == "combined":
        from hobbyrenderer_tpu.ops.denoise import denoise_init
        state["sharc_q_state"] = denoise_init(height // 2, width // 2)
    if indirect_mode == "ssgi":
        from hobbyrenderer_tpu.ops.denoise import denoise_init
        state["ssgi_state"] = denoise_init(height, width)
    if indirect_mode == "restir":
        from hobbyrenderer_tpu.ops.restir_gi import gi_reservoir_init
        state["restir_gi_reservoir"] = gi_reservoir_init(height // GI_SCALE,
                                                         width // GI_SCALE)
    if indirect_mode == "ddgi":
        from hobbyrenderer_tpu.ops.ddgi import ddgi_init
        lo, hi = scene_bounds if scene_bounds is not None \
            else ((-10.0, -10.0, -10.0), (10.0, 10.0, 10.0))
        state["ddgi_volume"] = ddgi_init(lo, hi)
    if specular_indirect and indirect_mode in ("restir", "sharc", "ddgi",
                                               "combined"):
        from hobbyrenderer_tpu.ops.specular import spec_state_init
        state["spec_state"] = spec_state_init(height, width)
    return state


class DeferredRenderer:
    """Host-side wrapper: builds the graph, jits the frame function, carries
    persistent FrameState (the 'persistent render-graph resources')."""

    def __init__(self, gpu, width: int, height: int, config=None, rt=None,
                 mode: str = RenderingMode.NORMAL,
                 occlusion_culling: bool = True,
                 with_taa: bool = True,
                 with_rt_shadows: bool = None,
                 direct_mode: str = None,
                 indirect_mode: str = None,
                 max_per_tile: int = None,
                 env_as_lights: bool = False,
                 out_width: int = None, out_height: int = None):
        self.width, self.height = width, height
        self.out_width = out_width or width
        self.out_height = out_height or height
        cap = max(int(gpu.lod0_pair_capacity), 1)
        if with_rt_shadows is None:
            with_rt_shadows = rt is not None
        if direct_mode is None:
            direct_mode = getattr(config, "direct_mode", "simple") or "simple"
        if indirect_mode is None:
            indirect_mode = getattr(config, "indirect_mode", "none") or "none"
        self.rt = rt
        import numpy as _np
        alpha_modes = _np.asarray(gpu.inst_alpha_mode)
        _c = _np.asarray(gpu.inst_center).reshape(-1, 3)
        _r = _np.asarray(gpu.inst_radius).reshape(-1)
        _bounds = ((_c - _r[:, None]).min(0), (_c + _r[:, None]).max(0)) \
            if _c.size else (_np.full(3, -30.0), _np.full(3, 30.0))
        # bounding-sphere radius around the scene CENTER (a norm-from-origin
        # radius exploded for off-origin assets, stretching the CSM range)
        _mid = 0.5 * (_bounds[0] + _bounds[1])
        scene_radius = (float((_np.linalg.norm(_c - _mid, axis=1) + _r).max())
                        if _c.size else 30.0)
        self.graph = build_deferred_graph(width, height, cap, mode=mode,
                                          with_rt_shadows=with_rt_shadows and rt is not None,
                                          occlusion_culling=occlusion_culling,
                                          with_taa=with_taa,
                                          direct_mode=direct_mode,
                                          indirect_mode=indirect_mode,
                                          has_masked=bool((alpha_modes == 1).any()),
                                          has_transparent=bool((alpha_modes == 2).any()),
                                          masked_capacity=gpu.bucket_pair_capacity((1,)),
                                          transparent_capacity=gpu.bucket_pair_capacity((2,)),
                                          shadow_capacity=gpu.shadow_pair_capacity(
                                              _csm_lod_biases()),
                                          ddgi_debug=bool(getattr(
                                              config, "ddgi_debug", False)),
                                          csm_debug=bool(getattr(
                                              config, "csm_debug", False)),
                                          tex_debug=bool(getattr(
                                              config, "tex_debug", False)),
                                          streaming=gpu.tex_stream is not None,
                                          scene_radius=scene_radius,
                                          use_regir=bool(getattr(
                                              config, "regir", False)),
                                          scene_bounds=_bounds,
                                          env_as_lights=env_as_lights,
                                          out_width=self.out_width,
                                          out_height=self.out_height,
                                          denoiser_profile=getattr(
                                              config, "denoiser", "relax")
                                          or "relax",
                                          specular_indirect=bool(getattr(
                                              config, "specular_indirect",
                                              False)),
                                          restir_quality=getattr(
                                              config, "restir_quality",
                                              "balanced") or "balanced",
                                          regir_mode=getattr(
                                              config, "regir_mode",
                                              "onion") or "onion",
                                          debug_view=getattr(
                                              config, "debug_view", None))
        self.streaming = gpu.tex_stream is not None
        self.state = initial_frame_state(width, height, direct_mode=direct_mode,
                                         indirect_mode=indirect_mode,
                                         scene_bounds=_bounds,
                                         out_width=self.out_width,
                                         out_height=self.out_height,
                                         specular_indirect=bool(getattr(
                                             config, "specular_indirect",
                                             False)))
        self.config = config
        self._jitted = None

    def _overflow_outputs(self):
        """Beam-kernel frontier-overflow counters written by ENABLED passes
        (a frontier-overflowed tile under-reports occlusion; surfaced in
        Renderer.stats() so silent quality loss is observable)."""
        names = []
        for pname, rname in (("SunShadow", "rt_overflow_sun"),
                             ("RTXDI", "rt_overflow_di"),
                             ("RTXDIGI", "rt_overflow_gi")):
            try:
                if self.graph.get(pname).enabled:
                    names.append(rname)
            except KeyError:
                pass
        return tuple(names)

    def frame_fn(self, gpu, rt, vc, settings, state, dt):
        ctx = FrameContext(gpu=gpu, vc=vc, settings=settings, config=self.config,
                           dt=dt, rt=rt)
        outputs = ("ldr", "raster_overflow", "visible_count",
                   "occluded_count", "phase2_count", "exposure")
        ovf_names = self._overflow_outputs()
        outputs += ovf_names
        # the full HDR frame is a ~24 MB live output at 1080p: only keep it
        # when the run actually wants .hdr screenshots (Config.keep_hdr)
        keep_hdr = bool(getattr(self.config, "keep_hdr", False))
        if keep_hdr:
            outputs += ("hdr",)
        if self.streaming:
            outputs += ("tex_feedback",)
        out = self.graph.execute(ctx, state, outputs=outputs)
        o = out["outputs"]
        stats = {"raster_overflow": o["raster_overflow"],
                 "visible_pairs": o["visible_count"],
                 "occluded_pairs": o["occluded_count"],
                 "phase2_pairs": o["phase2_count"],
                 "exposure": o["exposure"]}
        if ovf_names:
            stats["rt_overflow_tiles"] = sum(o[n] for n in ovf_names)
        if keep_hdr:
            stats["hdr_frame"] = o["hdr"]
        if self.streaming:
            stats["tex_feedback"] = o["tex_feedback"]
        return o["ldr"], stats, out["state"]

    def render(self, gpu, vc, settings, dt: float = 1 / 60):
        if self.config is not None and getattr(self.config, "execute_per_pass", False):
            # bisection/per-pass-timing mode: each pass jitted + blocked
            ctx = FrameContext(gpu=gpu, vc=vc, settings=settings,
                               config=self.config, dt=jnp.float32(dt), rt=self.rt)
            keep_hdr = bool(getattr(self.config, "keep_hdr", False))
            outputs = ("ldr", "raster_overflow", "visible_count",
                       "occluded_count", "phase2_count", "exposure")
            ovf_names = self._overflow_outputs()
            outputs += ovf_names
            if keep_hdr:
                outputs += ("hdr",)
            if self.streaming:
                outputs += ("tex_feedback",)
            out = self.graph.execute_per_pass(ctx, self.state, outputs=outputs)
            o = out["outputs"]
            self.state = out["state"]
            self.last_stats = {"raster_overflow": o["raster_overflow"],
                               "visible_pairs": o["visible_count"],
                               "occluded_pairs": o["occluded_count"],
                               "phase2_pairs": o["phase2_count"],
                               "exposure": o["exposure"]}
            if ovf_names:
                self.last_stats["rt_overflow_tiles"] = sum(
                    o[n] for n in ovf_names)
            if keep_hdr:
                self.last_stats["hdr_frame"] = o["hdr"]
            if self.streaming:
                self.last_stats["tex_feedback"] = o["tex_feedback"]
            return o["ldr"], o["raster_overflow"]
        if self._jitted is None:
            self._jitted = jax.jit(self.frame_fn, donate_argnums=(4,))
        ldr, stats, self.state = self._jitted(gpu, self.rt, vc, settings,
                                              self.state, jnp.float32(dt))
        self.last_stats = stats
        return ldr, stats["raster_overflow"]

    def profile_passes(self, gpu, vc, settings, dt: float = 1 / 60,
                       repeats: int = 4, sync=None):
        """Per-pass device-time breakdown (ref per-pass GPU timer queries,
        RenderGraph.cpp:329-349): runs the frame pass-by-pass with `repeats`
        re-dispatches per pass (identical inputs) between two syncs, returning
        [{pass, ms}]. Pass a host-fetch `sync` through remote device tunnels
        where block_until_ready does not truly block. State is advanced once."""
        ctx = FrameContext(gpu=gpu, vc=vc, settings=settings,
                           config=self.config, dt=jnp.float32(dt), rt=self.rt)
        out = self.graph.execute_per_pass(ctx, self.state, outputs=("ldr",),
                                          repeats=repeats, sync=sync)
        self.state = out["state"]
        return list(self.graph.last_pass_timings)

    def reload(self):
        """Shader hot-reload analogue (ref F5 ReloadShaders): drop the compiled
        frame so the next render re-traces + re-compiles current code."""
        self._jitted = None
