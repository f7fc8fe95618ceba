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

    def shade_layer(hdr_band, slots):
        """Rasterize one bin's slots and composite over hdr_band."""
        ro, aux, attr = rasterops.rasterize(gpu, vc, slots, width, height,
                                            double_sided_all=False,
                                            y0=y0, shard_height=shard_h,
                                            resolve_attrs=True)
        # depth-READ against the opaque depth: keep strictly nearer frags
        nearer = ro.depth > gb.depth
        ro2 = rasterops.RasterOutput(depth=jnp.where(nearer, ro.depth, 0.0),
                                     visid=jnp.where(nearer, ro.visid, -1),
                                     overflow=ro.overflow)
        tgb = rasterops.resolve_gbuffer(gpu, vc, ro2, slots,
                                        aux=aux, attr_img=attr, y0=y0)
        rough = tgb.orm[..., 1]
        metal = tgb.orm[..., 2]
        direct = shadeops.shade_all_lights(gpu, tgb.world_pos, tgb.normal, v,
                                           tgb.albedo, metal, rough)
        if env_as_lights:
            ambient = jnp.zeros_like(tgb.albedo)
        else:
            ambient = iblops.ibl_ambient(sky_sh, tgb.normal, v, tgb.albedo,
                                         metal, rough, sun_dir, settings,
                                         intensity=ibl_scale, env_fn=env_fn,
                                         brdf_lut=gpu.brdf_lut)
        shaded = direct + ambient
        # coverage/transmission from the material table
        mat = jnp.maximum(tgb.material, 0)
        moh = (mat[..., None] == jnp.arange(Mt)).astype(jnp.float32)
        mf = jnp.einsum("hwm,mf->hwf", moh, gpu.mat_f)
        # textured alpha from the resolve (cutoff = 0 for BLEND materials)
        alpha = jnp.clip(tgb.alpha, 0.0, 1.0)[..., None]
        transmission = mf[..., MAT_TRANSMISSION][..., None]
        atten = mf[..., MAT_ATTEN_COLOR:MAT_ATTEN_COLOR + 3]
        # the scene seen THROUGH the surface: refracted + roughness-blurred
        # fetch of the behind-layer mip chain, Beer-Lambert over the travel;
        # off-screen exits fall back to the environment (PT parity)
        opaque_pos = jnp.where(gb.valid[..., None], gb.world_pos,
                               tgb.world_pos + vdir)
        bg_refr = refrops.refracted_background(
            hdr_full, vc, tgb.world_pos, opaque_pos, tgb.normal, vdir,
            mf[..., MAT_IOR], rough, atten, mf[..., MAT_ATTEN_DIST],
            tgb.valid, y0=y0, miss_fn=miss_env)
        # the path tracer's expectation over its coverage pass-through + BSDF
        # lobe split (models/pathtracer.py): with prob (1 - coverage) the ray
        # ignores the surface; otherwise the surface emits its FULL Le, the
        # transmission lobe carries `transmission` of the scattered energy
        # (refracted background) and the remainder is surface shading.
        # coverage = max(alpha, transmission) — honors both glTF authoring
        # conventions (alpha~0+T=1 glass AND spec-correct alpha=1+T=1). The
        # former formula scaled emissive glass by alpha*(1-T) (~0.16x on the
        # stress scene) and read visibly dark against PT.
        cov = jnp.maximum(alpha, transmission)
        surf = tgb.emissive + transmission * bg_refr \
            + (1.0 - transmission) * shaded
        out = hdr_band * (1.0 - cov) + surf * cov
        return jnp.where(tgb.valid[..., None], out, hdr_band)

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
