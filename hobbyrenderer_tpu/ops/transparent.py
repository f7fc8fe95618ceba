"""Forward transparency, shared by the single-chip graph and the sharded
flagship frame.

Reference: TransparentPassRenderer — forward shading into the HDR target,
depth-read-no-write against the opaque depth, Fresnel/coverage split,
refraction through the downsampled opaque mip chain with roughness-driven LOD
+ Beer-Lambert absorption over the in-medium travel
(src/BasePassRenderer.cpp:694-814, src/shaders/BasePass.hlsl:266-483).

TPU shape: back-to-front compositing at MESHLET granularity — transparent
pairs split into far/near camera-distance bins, each rasterized (nearest
fragment per pixel within a bin) and blended far-first; the TPU analogue of
the reference's CPU-sorted transparent draw order. Overlapping layers INSIDE
one bin still collapse to the nearest.

Row sharding (multi-chip): the raster/resolve/shade runs on the device's row
band; only the refraction background needs cross-band reads, so it samples
the GATHERED full frame (ops/refraction.refracted_background docstring). The
caller all_gathers the opaque hdr once and passes it as hdr_full."""

from __future__ import annotations

import jax.numpy as jnp

from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import ibl as iblops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import refraction as refrops
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops import sky as skyops


def transparent_composite(gpu, vc, settings, gb, hdr, *, width, height,
                          transparent_capacity, sun_dir, sky_sh,
                          env_as_lights: bool = False, env_fn=None,
                          ibl_scale=1.0, y0: int = 0, shard_h: int = None,
                          hdr_full=None):
    """Render the scene's alpha-BLEND geometry over hdr. Returns new hdr.

    gb/hdr: the opaque G-buffer + lit HDR for this device's row band
    (rows [y0, y0+shard_h) of the full image; full image when y0=0 and
    shard_h=height). hdr_full: the gathered full frame for refraction
    fetches (defaults to hdr — only valid single-chip). sky_sh: (9, 3)
    irradiance SH for the ambient term."""
    from hobbyrenderer_tpu.scene.gpu import (MAT_ATTEN_COLOR, MAT_ATTEN_DIST,
                                             MAT_IOR, MAT_TRANSMISSION)
    shard_h = height if shard_h is None else shard_h
    if hdr_full is None:
        hdr_full = hdr
    alpha_ok = jnp.asarray([False, False, True])
    cull = cullops.cull_pairs(gpu, vc, alpha_mask=alpha_ok)
    vdir = skyops.view_dirs_from_pixels(vc, shard_h, width, y0=y0,
                                        full_height=height)
    v = -vdir
    Mt = gpu.mat_f.shape[0]

    def miss_env(d):
        """Environment radiance where the refracted exit leaves the screen."""
        if env_fn is not None:
            return env_fn(d)
        return skyops.sky_radiance_fast(d, sun_dir, settings)

    # mip stack shared by both bins: both refract into the SAME opaque frame
    stack = refrops.build_level_stack(hdr_full)
    R = shard_h * width
    # static capacity for the compacted shade chain (below): a transparent
    # BIN rarely covers more than a few percent of the frame (the chain cost
    # scales with CAP, not actual coverage — R//3 left 200+ ms on the table
    # at 1080p, R//8 another ~2x); lanes past the cap composite as pure
    # background (the same static-capacity contract as the raster worklists)
    CAP = max(R // 16, 2048)

    def shade_layer(hdr_band, slots):
        """Rasterize one bin's slots and composite over hdr_band.

        The compaction happens straight off the VISIBILITY buffer: the
        G-buffer resolve (material one-hot, texture row gather, normal map)
        AND the shade chain (light loop, IBL, the 8-gather refraction fetch)
        all run on lanes compacted to the bin's actual coverage — the former
        full-grid resolve alone cost two full-res texture-gather passes per
        frame for bins covering a few percent of the pixels. Texture LOD uses
        the pixel-cone footprint (the PT hit rule) since compacted neighbors
        aren't screen neighbors."""
        ro, aux, attr = rasterops.rasterize(gpu, vc, slots, width, height,
                                            double_sided_all=False,
                                            y0=y0, shard_height=shard_h,
                                            resolve_attrs=True)
        # depth-READ against the opaque depth: keep strictly nearer frags
        nearer = ro.depth > gb.depth

        # ---- compact covered lanes off the visibility buffer ---------------
        val = ((ro.visid >= 0) & nearer).reshape(R)
        rank = jnp.cumsum(val.astype(jnp.int32)) - 1
        slot = jnp.where(val & (rank < CAP), rank, CAP)
        sel = jnp.full((CAP + 1,), R, jnp.int32) \
            .at[slot].set(jnp.arange(R, dtype=jnp.int32), mode="drop")[:CAP]
        pad = sel >= R
        selc = jnp.minimum(sel, R - 1)
        take = lambda a: jnp.where(
            pad.reshape((-1,) + (1,) * (a.ndim - 2)), 0,
            a.reshape((R,) + a.shape[2:])[selc])
        # compacted (1, CAP) pseudo-image resolve, bit-equal to the grid form
        vis_c = jnp.where(pad, -1, ro.visid.reshape(R)[selc])
        dep_c = jnp.where(pad, 0.0, ro.depth.reshape(R)[selc])
        ro_c = rasterops.RasterOutput(depth=dep_c.reshape(1, CAP),
                                      visid=vis_c.reshape(1, CAP),
                                      overflow=ro.overflow)
        attr_c = None
        if attr is not None:
            attr_c = take(attr).reshape(1, CAP, attr.shape[-1])
        gx_c = selc % width
        gy_c = y0 + selc // width
        pids = (gy_c * width + gx_c).astype(jnp.int32).reshape(1, CAP)
        tgb = rasterops.resolve_gbuffer(gpu, vc, ro_c, slots,
                                        aux=aux, attr_img=attr_c,
                                        pix_ids=pids, tex_lod_mode="cone")
        flat = lambda a: a.reshape((CAP,) + a.shape[2:])
        pos_c, n_c, alb_c = flat(tgb.world_pos), flat(tgb.normal), \
            flat(tgb.albedo)
        em_c = flat(tgb.emissive)
        v_c = take(v)
        rough_c = flat(tgb.orm)[..., 1]
        metal_c = flat(tgb.orm)[..., 2]
        alpha_c = jnp.clip(flat(tgb.alpha), 0.0, 1.0)[..., None]

        direct = shadeops.shade_all_lights(gpu, pos_c, n_c, v_c,
                                           alb_c, metal_c, rough_c)
        if env_as_lights:
            ambient = jnp.zeros_like(alb_c)
        else:
            ambient = iblops.ibl_ambient(sky_sh, n_c, v_c, alb_c,
                                         metal_c, rough_c, sun_dir, settings,
                                         intensity=ibl_scale, env_fn=env_fn,
                                         brdf_lut=gpu.brdf_lut)
        shaded = direct + ambient
        # material constants: a row gather at CAP lanes (the full-grid form
        # used a one-hot MXU einsum — only worth it at dense grid width)
        mf = gpu.mat_f[jnp.maximum(flat(tgb.material), 0)]
        transmission = mf[..., MAT_TRANSMISSION][..., None]
        atten = mf[..., MAT_ATTEN_COLOR:MAT_ATTEN_COLOR + 3]
        # the scene seen THROUGH the surface: refracted + roughness-blurred
        # fetch of the behind-layer mip chain, Beer-Lambert over the travel;
        # off-screen exits fall back to the environment (PT parity)
        vdir_c = take(vdir)
        opq_c = jnp.where(take(gb.valid)[..., None], take(gb.world_pos),
                          pos_c + vdir_c)
        # each lane's own screen uv (TIR / behind-camera fallback)
        pix_uv = jnp.stack(
            [(selc % width + 0.5) / width,
             (y0 + selc // width + 0.5) / height], -1)
        bg_refr = refrops.refracted_background(
            hdr_full, vc, pos_c, opq_c, n_c, vdir_c,
            mf[..., MAT_IOR], rough_c, atten, mf[..., MAT_ATTEN_DIST],
            ~pad, y0=y0, miss_fn=miss_env, stack=stack, pix_uv=pix_uv)
        # the path tracer's expectation over its coverage pass-through + BSDF
        # lobe split (models/pathtracer.py): with prob (1 - coverage) the ray
        # ignores the surface; otherwise the surface emits its FULL Le, the
        # transmission lobe carries `transmission` of the scattered energy
        # (refracted background) and the remainder is surface shading.
        # coverage = max(alpha, transmission) — honors both glTF authoring
        # conventions (alpha~0+T=1 glass AND spec-correct alpha=1+T=1). The
        # former formula scaled emissive glass by alpha*(1-T) (~0.16x on the
        # stress scene) and read visibly dark against PT.
        cov_c = jnp.maximum(alpha_c, transmission)
        surf_c = em_c + transmission * bg_refr \
            + (1.0 - transmission) * shaded
        blend_c = jnp.where(pad[:, None], 0.0, surf_c * cov_c)
        cov_c = jnp.where(pad[:, None], 0.0, cov_c)

        # ---- scatter back to the band grid --------------------------------
        surf = jnp.zeros((R, 3), hdr_band.dtype) \
            .at[sel].set(blend_c, mode="drop") \
            .reshape(shard_h, width, 3)
        cov = jnp.zeros((R, 1), hdr_band.dtype) \
            .at[sel].set(cov_c, mode="drop") \
            .reshape(shard_h, width, 1)
        return hdr_band * (1.0 - cov) + surf

    # far/near partition by meshlet camera distance (threshold = midpoint
    # of the live range, a traced scalar -> static shapes throughout)
    dist = jnp.linalg.norm(cull["ml_center_world"]
                           - vc["camera_pos"][None, :], axis=-1)
    live = cull["mask"]
    d_min = jnp.min(jnp.where(live, dist, jnp.inf))
    d_max = jnp.max(jnp.where(live, dist, -jnp.inf))
    thresh = 0.5 * (d_min + d_max)
    far_mask = live & (dist >= thresh)
    near_mask = live & (dist < thresh)
    slots_far, _ = cullops.compact_mask(far_mask, transparent_capacity)
    slots_near, _ = cullops.compact_mask(near_mask, transparent_capacity)
    hdr = shade_layer(hdr, slots_far)
    return shade_layer(hdr, slots_near)
