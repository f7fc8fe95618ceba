"""Named debug visualizations (--debug-view NAME).

Reference: the CSM debug overlay modes (src/shaders/CSMDebug.hlsl:1-206,
enum src/shaders/Common.sr:210-221), the SSGI debug outputs
(src/shaders/Common.sr:170-191) and the SHARC debug modes
(src/shaders/Common.sr:193-201). Each reference mode has a named analogue
here; where this build's TPU pipeline collapses a reference pass (e.g. SSGI
specular marching — specular is a separate traced pass here), the view
renders the documented nearest signal.

All view functions take float [0,1] images and return float [0,1] images;
the DebugView graph pass does the uint8 conversion.
"""

from __future__ import annotations

import jax.numpy as jnp

from hobbyrenderer_tpu.ops.csm import (CASCADE_COLORS, NUM_CASCADES,
                                       SHADOW_RES, CSMData)

CSM_VIEWS = (
    "csm_cascade_splits",    # ref CSM_DEBUG_CASCADE_SPLITS
    "csm_shadow_map",        # ref CSM_DEBUG_SHADOW_MAP_VIZ (bottom strips)
    "csm_shadow_mask",       # ref CSM_DEBUG_SHADOW_MASK
    "csm_pcf_footprint",     # ref CSM_DEBUG_PCF_FOOTPRINT (texel checker)
    "csm_alpha_masked",      # ref CSM_DEBUG_ALPHA_MASKED
    "csm_depth_compare",     # ref CSM_DEBUG_DEPTH_COMPARE
    "csm_frustum_wire",      # ref CSM_DEBUG_FRUSTUM_WIRE
    "csm_blend_zone",        # ref CSM_DEBUG_BLEND_ZONE (reserved in ref; here:
    #                          distance-to-next-split band visualization)
)

SSGI_VIEWS = (
    "ssgi_raw_diffuse",      # pre-temporal half-res march result
    "ssgi_raw_specular",     # N/A here (specular is the traced pass) -> black
    "ssgi_temporal_diffuse",
    "ssgi_temporal_specular",        # N/A -> black
    "ssgi_denoised_diffuse",
    "ssgi_denoised_specular",        # N/A -> black
    "ssgi_composed",         # the indirect term in isolation
    "ssgi_diffuse_age",      # temporal history length heatmap
    "ssgi_specular_age",             # N/A -> black
    "ssgi_ray_length",       # grey = hit distance, magenta = miss
    "ssgi_hit_mask",         # green = hit, red = miss
    "ssgi_sample_type",      # blue = diffuse ray (all rays diffuse here)
    "ssgi_sky_fallback",     # sky irradiance along the march direction
    "ssgi_direct_light",     # lit-HDR radiance tapped at ray hits
    "ssgi_fresnel",          # compose-pass Fresnel term
    "ssgi_validity",         # magenta NaN/Inf, yellow negative, grey ok
    "ssgi_denoiser_delta_diffuse",   # |temporal - denoised|
    "ssgi_denoiser_delta_specular",  # N/A -> black
)

SHARC_VIEWS = (
    "sharc_voxel_color",     # hash-based color per cache voxel
    "sharc_radiance",        # raw cache output before BRDF modulation
    "sharc_heatmap",         # green = cache hit, red = miss
)

ALL_VIEWS = CSM_VIEWS + SSGI_VIEWS + SHARC_VIEWS


def heatmap(t):
    """Scalar ramp black->blue->cyan->green->yellow->red (ref DebugHeatmap)."""
    t = jnp.clip(t, 0.0, 1.0)
    stops = jnp.asarray([[0, 0, 0], [0, 0, 1], [0, 1, 1],
                         [0, 1, 0], [1, 1, 0], [1, 0, 0]], jnp.float32)
    s = t * 5.0
    i = jnp.clip(s.astype(jnp.int32), 0, 4)
    f = (s - i.astype(jnp.float32))[..., None]
    return stops[i] * (1 - f) + stops[i + 1] * f


def _cascade_index(csm: CSMData, vc, world_pos):
    V = vc["view"]
    p_view = jnp.einsum("ij,hwj->hwi", V[:3, :3], world_pos) + V[:3, 3]
    dist = -p_view[..., 2]
    cidx = jnp.sum((dist[..., None] > csm.splits[None, None, :])
                   .astype(jnp.int32), axis=-1)
    return jnp.clip(cidx, 0, NUM_CASCADES - 1), dist


def csm_view(name: str, ldr_f, gb, csm: CSMData, vc, sun_mask, masked=None):
    """One of CSM_VIEWS -> (H, W, 3) float image. masked: optional (H, W)
    bool — pixels of MASK-alpha-mode materials (for csm_alpha_masked)."""
    H, W = ldr_f.shape[0], ldr_f.shape[1]
    albedo = gb.albedo
    cidx, dist = _cascade_index(csm, vc, gb.world_pos)
    ccol = jnp.asarray(CASCADE_COLORS, jnp.float32)[cidx]
    valid3 = gb.valid[..., None]

    if name == "csm_cascade_splits":
        # 50/50 blend so geometry stays readable (ref DebugCascadeSplits)
        return jnp.where(valid3, ccol * 0.5 + albedo * 0.5, ldr_f)

    if name == "csm_shadow_map":
        # 4 strips across the bottom quarter (ref DebugShadowMapViz)
        out = albedo
        strip_h = H // 4
        y = jnp.arange(H)[:, None]
        x = jnp.arange(W)[None, :]
        in_strip = y >= (H - strip_h)
        ci = jnp.clip(x * 4 // W, 0, 3)
        lu = (x * 4 % W).astype(jnp.float32) / W          # local strip u
        lv = ((y - (H - strip_h)).astype(jnp.float32)
              / max(strip_h, 1)).clip(0.0, 1.0)
        sx = jnp.clip((lu * SHADOW_RES).astype(jnp.int32), 0, SHADOW_RES - 1)
        sy = jnp.clip((lv * SHADOW_RES).astype(jnp.int32), 0, SHADOW_RES - 1)
        sx = jnp.broadcast_to(sx, (H, W))
        sy = jnp.broadcast_to(sy, (H, W))
        ci2 = jnp.broadcast_to(ci, (H, W))
        d = csm.depth.reshape(-1)[ci2 * (SHADOW_RES * SHADOW_RES)
                                  + sy * SHADOW_RES + sx]
        return jnp.where(in_strip[..., None],
                         jnp.broadcast_to(d[..., None], (H, W, 3)), out)

    if name == "csm_shadow_mask":
        return jnp.broadcast_to(sun_mask[..., None], (H, W, 3))

    if name == "csm_pcf_footprint":
        # shadow-texel-scale checker over the scene, tinted by cascade
        # (ref CSM_DEBUG_PCF_FOOTPRINT)
        texel = 1.0 / SHADOW_RES
        x = jnp.arange(W, dtype=jnp.float32)[None, :]
        y = jnp.arange(H, dtype=jnp.float32)[:, None]
        checker = ((jnp.floor(x * W * texel / 8.0)
                    + jnp.floor(y * H * texel / 8.0)) % 2.0)
        w = (checker * 0.3)[..., None]
        return jnp.where(valid3, albedo * (1 - w) + ccol * w, ldr_f)

    if name == "csm_alpha_masked":
        # masked-material pixels render orange (ref DebugAlphaMasked)
        if masked is None:
            return jnp.where(valid3, albedo, ldr_f)
        orange = jnp.asarray([1.0, 0.5, 0.0], jnp.float32)
        return jnp.where((masked & gb.valid)[..., None], orange,
                         jnp.where(valid3, albedo, ldr_f))

    if name == "csm_depth_compare":
        sh = jnp.asarray([0.8, 0.1, 0.1], jnp.float32)
        lit = jnp.asarray([0.1, 0.8, 0.1], jnp.float32)
        t = sun_mask[..., None]
        return jnp.where(valid3, sh * (1 - t) + lit * t, ldr_f)

    if name == "csm_frustum_wire":
        # cascade ortho-box outlines on geometry: pixels whose light-space
        # |x| or |y| is within a line width of a cascade's box edge (the
        # analytic analogue of the reference's ImGui 3D frustum lines,
        # whose shader is albedo pass-through)
        out = jnp.where(valid3, albedo, ldr_f)
        for c in range(NUM_CASCADES):
            vp = csm.view_proj[c]
            clip = jnp.einsum("ij,hwj->hwi", vp[:3, :3], gb.world_pos) \
                + vp[:3, 3]
            ax = jnp.abs(clip[..., 0])
            ay = jnp.abs(clip[..., 1])
            lw = 0.004
            inside = (ax <= 1.0 + lw) & (ay <= 1.0 + lw)
            edge = inside & ((jnp.abs(ax - 1.0) < lw)
                             | (jnp.abs(ay - 1.0) < lw))
            col = jnp.asarray(CASCADE_COLORS[c], jnp.float32)
            out = jnp.where((edge & gb.valid)[..., None], col, out)
        return out

    if name == "csm_blend_zone":
        # fraction of the way through the selected cascade's depth range:
        # bright bands mark where a split handoff is imminent
        near = jnp.where(cidx > 0, csm.splits[jnp.maximum(cidx - 1, 0)], 0.0)
        far = csm.splits[cidx]
        t = jnp.clip((dist - near) / jnp.maximum(far - near, 1e-3), 0.0, 1.0)
        band = jnp.clip((t - 0.8) * 5.0, 0.0, 1.0)        # last 20% highlighted
        return jnp.where(valid3,
                         albedo * 0.4 + ccol * 0.3 + band[..., None] * 0.3,
                         ldr_f)

    raise ValueError(f"unknown CSM debug view '{name}'")


def _tone(x):
    """Simple display transform for HDR debug signals."""
    return jnp.clip(x / (1.0 + x), 0.0, 1.0)


def ssgi_view(name: str, ldr_f, gb, dv: dict):
    """One of SSGI_VIEWS -> (H, W, 3). dv carries the SSGI pass's debug
    intermediates (see ops/ssgi.py debug_out)."""
    import jax
    H, W = ldr_f.shape[0], ldr_f.shape[1]

    def up(img):
        if img.shape[0] == H and img.shape[1] == W:
            return img
        tgt = (H, W) + img.shape[2:]
        return jax.image.resize(img, tgt, method="nearest")

    black = jnp.zeros((H, W, 3), jnp.float32)
    if name in ("ssgi_raw_specular", "ssgi_temporal_specular",
                "ssgi_denoised_specular", "ssgi_specular_age",
                "ssgi_denoiser_delta_specular"):
        # this build traces specular in a separate pass (ops/specular.py);
        # the SSGI marcher is diffuse-only by design
        return black
    if name == "ssgi_raw_diffuse":
        return _tone(up(dv["irr_half"]))
    if name == "ssgi_temporal_diffuse":
        return _tone(dv["temporal"])
    if name == "ssgi_denoised_diffuse":
        return _tone(dv["denoised"])
    if name == "ssgi_composed":
        return _tone(dv["composed"])
    if name == "ssgi_diffuse_age":
        return heatmap(1.0 - dv["age"] / 32.0)   # red = young (working hard)
    if name == "ssgi_ray_length":
        t = up(dv["ray_t"][..., None])
        grey = jnp.broadcast_to(jnp.clip(t, 0.0, 1.0), (H, W, 3))
        magenta = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
        hit = up(dv["hit"][..., None]) > 0.5
        return jnp.where(hit, grey, magenta)
    if name == "ssgi_hit_mask":
        hit = up(dv["hit"][..., None]) > 0.5
        green = jnp.asarray([0.1, 0.9, 0.1], jnp.float32)
        red = jnp.asarray([0.9, 0.1, 0.1], jnp.float32)
        return jnp.where(hit, green, red)
    if name == "ssgi_sample_type":
        # all marched rays carry the diffuse estimate (blue per the ref code)
        return jnp.broadcast_to(jnp.asarray([0.2, 0.2, 1.0], jnp.float32),
                                (H, W, 3)) * jnp.ones((H, W, 3))
    if name == "ssgi_sky_fallback":
        return _tone(up(dv["sky_eval"]))
    if name == "ssgi_direct_light":
        return _tone(up(dv["direct"]))
    if name == "ssgi_fresnel":
        from hobbyrenderer_tpu.ops.shading import brdf_params, fresnel_schlick
        from hobbyrenderer_tpu.ops import sky as skyops
        vdir = dv["view_dir"]
        nov = jnp.maximum(jnp.sum(gb.normal * (-vdir), -1), 0.0)
        _, f0, _ = brdf_params(gb.albedo, gb.orm[..., 2], gb.orm[..., 1])
        F = fresnel_schlick(nov[..., None], f0)
        return jnp.clip(F, 0.0, 1.0)
    if name == "ssgi_validity":
        x = dv["composed"]
        bad = ~jnp.isfinite(x).all(-1)
        neg = (x < 0.0).any(-1) & ~bad
        grey = jnp.broadcast_to(jnp.asarray(0.5, jnp.float32), (H, W, 3)) \
            * jnp.ones((H, W, 3))
        out = jnp.where(bad[..., None],
                        jnp.asarray([1.0, 0.0, 1.0], jnp.float32), grey)
        return jnp.where(neg[..., None],
                         jnp.asarray([1.0, 1.0, 0.0], jnp.float32), out)
    if name == "ssgi_denoiser_delta_diffuse":
        d = jnp.abs(dv["temporal"] - dv["denoised"]).mean(-1)
        return heatmap(d * 4.0)
    raise ValueError(f"unknown SSGI debug view '{name}'")


def sharc_view(name: str, ldr_f, gb, dv: dict):
    """One of SHARC_VIEWS -> (H, W, 3). dv from the SHARC query pass."""
    import jax
    H, W = ldr_f.shape[0], ldr_f.shape[1]

    def up(img):
        if img.shape[0] == H and img.shape[1] == W:
            return img
        return jax.image.resize(img, (H, W) + img.shape[2:], method="nearest")

    if name == "sharc_voxel_color":
        cell = up(dv["cell"][..., None])[..., 0].astype(jnp.uint32)
        h = cell * jnp.uint32(2654435761)
        r = (h & 0xFF).astype(jnp.float32) / 255.0
        g = ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0
        b = ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0
        col = jnp.stack([r, g, b], -1)
        return jnp.where(gb.valid[..., None], col, ldr_f)
    if name == "sharc_radiance":
        return _tone(up(dv["radiance"]))
    if name == "sharc_heatmap":
        ok = up(dv["hit"][..., None]) > 0.5
        green = jnp.asarray([0.1, 0.9, 0.1], jnp.float32)
        red = jnp.asarray([0.9, 0.1, 0.1], jnp.float32)
        return jnp.where(gb.valid[..., None], jnp.where(ok, green, red),
                         ldr_f)
    raise ValueError(f"unknown SHARC debug view '{name}'")
