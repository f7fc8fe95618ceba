"""Rough refraction through a downsampled opaque-scene mip chain.

Reference capability: BasePassRenderer renders the lit opaque HDR into a mip
pyramid before the transparent pass (src/BasePassRenderer.cpp:694-814) and the
transparent shader refracts the view ray at the surface, offsetting the screen
UV and sampling the pyramid with a roughness-driven LOD — "rough transmission"
— plus Beer-Lambert attenuation along the in-medium travel distance
(src/shaders/BasePass.hlsl:266-483).

TPU-first shape: the pyramid is materialised as a dense (K, H, W, 3) level
stack — each mip is box-downsampled then bilinearly re-upsampled to full
resolution — so the per-pixel trilinear fetch is one vectorised gather into a
static-shape array: no ragged mip addressing, no per-pixel control flow, and
the level dimension folds into the flat gather index. Cost is K extra
full-res buffers, paid only when the scene has transparent materials (the
pass is disabled otherwise).
"""

from __future__ import annotations

import jax.numpy as jnp

from hobbyrenderer_tpu.ops.post import _downsample2, _upsample2

LEVELS = 5


def refract_dir(v: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray):
    """Snell refraction of incident dir v (pointing INTO the surface) about
    normal n. Returns (dir, valid) — valid False on total internal
    reflection."""
    cos_i = -jnp.sum(v * n, axis=-1, keepdims=True)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    valid = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    d = eta * v + (eta * cos_i - cos_t) * n
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    return d, valid[..., 0]


def build_level_stack(hdr: jnp.ndarray, levels: int = LEVELS) -> jnp.ndarray:
    """(H, W, 3) lit opaque HDR -> (K, H, W, 3) progressively-blurred stack.

    Level k is the scene box-filtered at 2^k texel footprint (mip k
    re-upsampled), standing in for the reference's opaque mip chain."""
    H, W = hdr.shape[:2]
    out = [hdr]
    cur = hdr
    for _ in range(1, levels):
        cur = _downsample2(cur)
        out.append(_upsample2(cur, H, W))
    return jnp.stack(out, axis=0)


def sample_level_stack(stack: jnp.ndarray, uv: jnp.ndarray,
                       lod: jnp.ndarray) -> jnp.ndarray:
    """Trilinear fetch: bilinear in screen space, linear across levels.

    stack: (K, H, W, 3); uv: (H, W, 2) in [0,1]; lod: (H, W) float level.
    8 flat gathers total (4 spatial taps x 2 levels)."""
    K, H, W = stack.shape[:3]
    flat = stack.reshape(K * H * W, stack.shape[-1])
    lod = jnp.clip(lod, 0.0, K - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, K - 1)
    fl = (lod - l0.astype(jnp.float32))[..., None]

    x = jnp.clip(uv[..., 0], 0.0, 1.0) * W - 0.5
    y = jnp.clip(uv[..., 1], 0.0, 1.0) * H - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]

    def tap(level, yi, xi):
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        return jnp.take(flat, (level * H + yi) * W + xi, axis=0)

    def bilin(level):
        c00 = tap(level, y0, x0)
        c01 = tap(level, y0, x0 + 1)
        c10 = tap(level, y0 + 1, x0)
        c11 = tap(level, y0 + 1, x0 + 1)
        top = c00 * (1 - fx) + c01 * fx
        bot = c10 * (1 - fx) + c11 * fx
        return top * (1 - fy) + bot * fy

    return bilin(l0) * (1 - fl) + bilin(l1) * fl


def refracted_background(hdr: jnp.ndarray, vc, surf_pos: jnp.ndarray,
                         opaque_pos: jnp.ndarray, normal: jnp.ndarray,
                         vdir: jnp.ndarray, ior: jnp.ndarray,
                         rough: jnp.ndarray, atten_color: jnp.ndarray,
                         atten_dist: jnp.ndarray, valid: jnp.ndarray,
                         y0: int = 0, miss_fn=None, stack=None,
                         pix_uv=None):
    """The scene seen THROUGH a transparent surface.

    Refract the camera ray at the surface, march the in-medium travel to the
    opaque hit distance behind the pixel, reproject to screen UV, and fetch
    the opaque mip stack at a roughness-driven LOD; tint by Beer-Lambert
    absorption over the travel distance. Returns the background at the shape
    of surf_pos.

    Row sharding: hdr is always the FULL frame (refraction offsets cross
    shard boundaries, so each device samples the gathered frame); surf_pos &
    friends may be a row band starting at full-image row y0.

    miss_fn (dirs (..., 3) -> radiance (..., 3)), optional: environment
    radiance along the refracted direction, used where the refracted exit
    point leaves the screen — screen-space refraction has no data there, and
    clamping to the frame edge reads as a dark smear against the path-traced
    truth (which exits to the sky). Blended over an edge band.

    stack, optional: a prebuilt build_level_stack(hdr) — pass it when shading
    several transparent bins against the SAME opaque frame (the stack build
    is ~1/4 of this op's cost and was paid per bin).
    pix_uv (..., 2), optional: each lane's OWN screen uv (the TIR/behind-
    camera fallback). Required when surf_pos is a compacted (N, 3) lane list
    instead of a (bh, W) grid — the grid meshgrid fallback is skipped."""
    H, W = hdr.shape[:2]
    eta = 1.0 / jnp.maximum(ior, 1.0 + 1e-4)[..., None]
    rdir, no_tir = refract_dir(vdir, normal, eta)
    # in-medium travel: distance to the opaque surface behind this pixel
    travel = jnp.linalg.norm(opaque_pos - surf_pos, axis=-1)
    travel = jnp.clip(jnp.where(jnp.isfinite(travel), travel, 1.0), 1e-3, 1e3)
    exit_pos = surf_pos + rdir * travel[..., None]

    vp = jnp.asarray(vc["view_proj_no_jitter"])
    clip = exit_pos @ vp[:3, :3].T + vp[:3, 3]
    w = exit_pos @ vp[3, :3] + vp[3, 3]
    in_front = w > 1e-6
    ndc = clip[..., :2] / jnp.maximum(w, 1e-6)[..., None]
    uv_r = jnp.stack([ndc[..., 0] * 0.5 + 0.5,
                      0.5 - ndc[..., 1] * 0.5], axis=-1)
    # fall back to the unrefracted pixel on TIR / behind-camera projection
    if pix_uv is None:
        bh = surf_pos.shape[0]
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
        ys = (y0 + jnp.arange(bh, dtype=jnp.float32) + 0.5) / H
        pix_uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    ok = (no_tir & in_front & valid)[..., None]
    uv = jnp.where(ok, uv_r, pix_uv)

    if stack is None:
        stack = build_level_stack(hdr)
    # roughness -> footprint: GGX lobe spread grows ~ rough^2; sqrt gives a
    # perceptually even LOD ramp across the K levels (ref BasePass.hlsl uses
    # a roughness-indexed mip of its refraction chain)
    lod = jnp.sqrt(jnp.clip(rough, 0.0, 1.0)) * (stack.shape[0] - 1.0)
    bg = sample_level_stack(stack, uv, lod)
    if miss_fn is not None:
        # smoothstep to the environment over the outer 5% UV band; fully
        # env once the exit point is off-screen or behind the camera
        MARGIN = 0.05
        e = jnp.minimum(jnp.minimum(uv_r[..., 0], 1.0 - uv_r[..., 0]),
                        jnp.minimum(uv_r[..., 1], 1.0 - uv_r[..., 1]))
        t = jnp.clip(e / MARGIN, 0.0, 1.0)
        on_screen = t * t * (3.0 - 2.0 * t) * in_front.astype(jnp.float32)
        env = miss_fn(rdir)
        w = jnp.where(no_tir & valid, 1.0 - on_screen, 0.0)[..., None]
        bg = bg * (1.0 - w) + env * w

    # Beer-Lambert over the travel distance (ref KHR_materials_volume)
    sigma = -jnp.log(jnp.clip(atten_color, 1e-4, 1.0)) \
        / jnp.maximum(atten_dist, 1e-3)[..., None]
    trans = jnp.exp(-sigma * travel[..., None])
    return bg * trans
