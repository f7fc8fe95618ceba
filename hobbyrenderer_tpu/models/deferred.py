"""Deferred rendering mode (the NormalBasic/Normal/IBL family).

Reference pass order (src/Renderer.cpp:1282-1313): Clear -> [TLAS] -> base pass
(GPU culling + meshlet raster G-buffer) -> HZB -> shadows -> [RTXDI/SHARC | SSGI/
DDGI] -> Deferred lighting -> Sky -> transparent -> TAA -> Bloom -> HDR post.

This module builds the TPU pass graph for the deferred family. v1 slice implements:
Culling -> Raster -> ResolveGBuffer -> DeferredLighting (all lights + hemisphere
ambient) -> Sky -> AutoExposure (histogram) -> Bloom -> Tonemap. RT shadows, ReSTIR,
SHARC, TAA etc. are added as passes in later milestones, slotting into the same
graph."""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.graph.rendergraph import FrameContext, RenderGraph, render_pass
from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import post as postops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops import sky as skyops
from hobbyrenderer_tpu.scene.scene import ALPHA_BLEND


def build_deferred_graph(width: int, height: int, visible_capacity: int,
                         max_per_tile: int = 48) -> RenderGraph:
    g = RenderGraph()

    @g.add
    @render_pass("Culling", reads=(), writes=("visible_slots", "visible_count"))
    def _culling(ctx: FrameContext, res):
        # opaque+masked buckets raster; transparent handled by a forward pass later
        alpha_ok = jnp.asarray([True, True, False])
        cull = cullops.cull_pairs(ctx.gpu, ctx.vc, alpha_mask=alpha_ok)
        slots, count = cullops.compact_mask(cull["mask"], visible_capacity)
        res["visible_slots"] = slots
        res["visible_count"] = count

    @g.add
    @render_pass("Raster", reads=("visible_slots",),
                 writes=("raster_depth", "raster_visid", "raster_overflow",
                         "raster_aux"))
    def _raster(ctx, res):
        out, aux = rasterops.rasterize(ctx.gpu, ctx.vc, res["visible_slots"],
                                       width, height)
        res["raster_depth"] = out.depth
        res["raster_visid"] = out.visid
        res["raster_overflow"] = out.overflow
        res["raster_aux"] = aux

    @g.add
    @render_pass("ResolveGBuffer", reads=("raster_depth", "raster_visid",
                                          "raster_aux", "visible_slots"),
                 writes=("gbuffer",))
    def _resolve(ctx, res):
        ro = rasterops.RasterOutput(res["raster_depth"], res["raster_visid"],
                                    jnp.int32(0))
        res["gbuffer"] = rasterops.resolve_gbuffer(ctx.gpu, ctx.vc, ro,
                                                   res["visible_slots"],
                                                   aux=res["raster_aux"])

    @g.add
    @render_pass("DeferredLighting", reads=("gbuffer",), writes=("hdr",))
    def _deferred(ctx, res):
        gb = res["gbuffer"]
        vdir = skyops.view_dirs_from_pixels(ctx.vc, height, width)
        v = -vdir
        rough = gb.orm[..., 1]
        metal = gb.orm[..., 2]
        direct = shadeops.shade_all_lights(ctx.gpu, gb.world_pos, gb.normal, v,
                                           gb.albedo, metal, rough)
        sky_c = jnp.asarray([0.3, 0.42, 0.6], jnp.float32) * ctx.settings.ambient_scale
        gnd_c = jnp.asarray([0.12, 0.11, 0.10], jnp.float32) * ctx.settings.ambient_scale
        ambient = shadeops.ambient_hemisphere(gb.normal, gb.albedo, metal, rough,
                                              sky_c, gnd_c)
        hdr = direct + ambient + gb.emissive
        res["hdr"] = jnp.where(gb.valid[..., None], hdr, 0.0)

    @g.add
    @render_pass("Sky", reads=("gbuffer", "hdr"), writes=("hdr",))
    def _sky(ctx, res):
        gb = res["gbuffer"]
        vdir = skyops.view_dirs_from_pixels(ctx.vc, height, width)
        sun_dir = _scene_sun_dir(ctx)
        sky = skyops.sky_radiance(vdir, sun_dir, ctx.settings)
        res["hdr"] = jnp.where(gb.valid[..., None], res["hdr"], sky)

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

    return g


def _scene_sun_dir(ctx):
    """First directional light's direction (the sun), falling back to settings."""
    lt = ctx.gpu.light_type
    is_dir = (lt == 0) & (jnp.arange(lt.shape[0]) < ctx.gpu.light_count)
    idx = jnp.argmax(is_dir)
    return jnp.where(is_dir.any(), ctx.gpu.light_dir[idx],
                     jnp.asarray(ctx.settings.sun_direction))


def initial_frame_state(width: int, height: int) -> Dict[str, jnp.ndarray]:
    """Persistent resources seed (exposure starts at 1.0, like the reference's
    exposure texture cleared on init)."""
    return {"exposure": jnp.float32(1.0)}


class DeferredRenderer:
    """Host-side wrapper: builds the graph, jits the frame function, carries
    persistent FrameState (the 'persistent render-graph resources')."""

    def __init__(self, gpu, width: int, height: int, config=None,
                 max_per_tile: int = 48):
        self.width, self.height = width, height
        cap = max(int(gpu.lod0_pair_capacity), 1)
        self.graph = build_deferred_graph(width, height, cap, max_per_tile)
        self.state = initial_frame_state(width, height)
        self.config = config
        self._jitted = None

    def frame_fn(self, gpu, vc, settings, state, dt):
        ctx = FrameContext(gpu=gpu, vc=vc, settings=settings, config=self.config,
                           dt=dt)
        out = self.graph.execute(ctx, state, outputs=("ldr", "raster_overflow"))
        return out["outputs"]["ldr"], out["outputs"]["raster_overflow"], out["state"]

    def render(self, gpu, vc, settings, dt: float = 1 / 60):
        if self._jitted is None:
            self._jitted = jax.jit(self.frame_fn, donate_argnums=(3,))
        ldr, overflow, self.state = self._jitted(gpu, vc, settings, self.state,
                                                 jnp.float32(dt))
        return ldr, overflow
