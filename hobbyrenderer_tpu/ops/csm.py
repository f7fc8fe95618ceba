"""Cascaded shadow maps (the NormalBasic sun-shadow path).

Reference: src/ShadowRenderer.cpp (4-cascade 2048^2 D32 depth raster with
sphere-fit rotation-invariant cascade bounds + texel snapping, split distances
log/uniform-blended — src/Renderer.cpp:1093-1261) + src/ShadowMaskRenderer.cpp
(fullscreen PCF evaluation with per-cascade normal bias into an R8 mask).

TPU build: each cascade reuses the SAME software meshlet rasterizer from the
light's orthographic view (depth only); the mask pass selects a cascade per
pixel, projects, and PCF-filters. Matrices are built in jnp inside the frame
(dynamic sun)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.utils import math as hm

NUM_CASCADES = 4        # ref src/Renderer.cpp:1288
SHADOW_RES = 1024       # ref 2048^2; 1024 bounds the raster cost
SPLIT_LAMBDA = 0.6      # log/uniform blend


class CSMData(NamedTuple):
    view_proj: jnp.ndarray   # (C, 4, 4) light clip from world
    depth: jnp.ndarray       # (C, S, S) reversed-Z light depth (1 = near light)
    splits: jnp.ndarray      # (C,) far split view distances


def _look_at_j(eye, center, up):
    fwd = (center - eye)
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-8)
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
    u = jnp.cross(right, fwd)
    m = jnp.eye(4)
    m = m.at[0, :3].set(right).at[1, :3].set(u).at[2, :3].set(-fwd)
    t = -m[:3, :3] @ eye
    return m.at[:3, 3].set(t)


def _ortho_j(r, near, far):
    """Symmetric ortho box [-r, r]^2, reversed-Z depth in [0,1]."""
    m = jnp.eye(4)
    m = m.at[0, 0].set(1.0 / r).at[1, 1].set(1.0 / r)
    m = m.at[2, 2].set(1.0 / (far - near)).at[2, 3].set(far / (far - near))
    return m


def cascade_matrices(vc, sun_dir, max_distance: float = 60.0):
    """Sphere-fit cascade view-proj matrices + split distances.

    Split scheme: blend of logarithmic and uniform (ref lambda-blended splits);
    each cascade slice gets a bounding sphere on the camera view ray (rotation-
    invariant => stable under camera rotation, ref sphere-fit bounds) and a
    texel-snapped ortho frame (ref texel snapping)."""
    near = vc["znear"]
    cam = vc["camera_pos"]
    fwd = -vc["view"][2, :3]
    up = jnp.where(jnp.abs(sun_dir[1]) > 0.95,
                   jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))

    i = jnp.arange(NUM_CASCADES + 1, dtype=jnp.float32) / NUM_CASCADES
    log_split = near * (max_distance / near) ** i
    uni_split = near + (max_distance - near) * i
    splits = SPLIT_LAMBDA * log_split + (1 - SPLIT_LAMBDA) * uni_split  # (C+1,)

    # inverse tan of half fov for slice extents
    inv_p11 = 1.0 / vc["proj11"]
    inv_p00 = 1.0 / vc["proj00"]

    vps = []
    for c in range(NUM_CASCADES):
        n_d, f_d = splits[c], splits[c + 1]
        # slice corner radius at far plane
        rx = f_d * inv_p00
        ry = f_d * inv_p11
        center = cam + fwd * (0.5 * (n_d + f_d))
        radius = jnp.sqrt((0.5 * (f_d - n_d)) ** 2 + rx * rx + ry * ry)
        # texel snap: quantize the light-space center to the texel grid
        texel = (2.0 * radius) / SHADOW_RES
        eye = center - sun_dir * (radius * 2.0)
        V = _look_at_j(eye, center, up)
        c_ls = V[:3, :3] @ center + V[:3, 3]
        snap = jnp.round(c_ls[:2] / texel) * texel - c_ls[:2]
        V = V.at[:2, 3].add(snap)
        P = _ortho_j(radius, 0.0, radius * 4.0)
        vps.append(P @ V)
    return jnp.stack(vps), splits[1:]


# per-cascade shadow LOD bias: far cascades cover a huge area per texel, so a
# coarser simplification level is below the shadow-map Nyquist rate anyway
CASCADE_LOD_BIAS = (1, 1, 2, 3)


def render_cascades(gpu, vc, sun_dir, visible_capacity: int,
                    max_distance: float = 60.0) -> CSMData:
    """Depth-only meshlet raster of all cascades in ONE atlas pass.

    The reference runs per-cascade GPU culling + depth raster
    (src/ShadowRenderer.cpp); here culling is one vectorized (cascade, pair)
    mask and rasterization one shadow-atlas kernel (see
    ops/raster.rasterize_shadow_atlas — the per-pass fixed costs made 4
    sequential cascade rasters ~4x the cost of the fused form)."""
    vps, splits = cascade_matrices(vc, sun_dir, max_distance)
    sel = cullops.select_instance_lods(gpu, vc)  # LODs from the MAIN camera
    lc = gpu.prim_lod_count[gpu.inst_prim]                        # (N,)
    bias = jnp.asarray(CASCADE_LOD_BIAS[:NUM_CASCADES], jnp.int32)
    sel_c = jnp.minimum(sel[None, :] + bias[:, None], lc[None, :] - 1)  # (C,N)

    inst = gpu.pair_inst
    ml = gpu.pair_meshlet
    base = gpu.inst_alpha_mode[inst] < 2   # opaque + masked cast shadows
    W = gpu.inst_transform[inst]
    c_w = jnp.einsum("dij,dj->di", W[:, :3, :3], gpu.ml_center[ml]) + W[:, :3, 3]
    r_w = gpu.ml_radius[ml] * gpu.inst_scale_max[inst]
    planes = jnp.stack([hm.extract_frustum_planes(vps[c], xp=jnp)
                        for c in range(NUM_CASCADES)])            # (C, 6, 4)
    d = jnp.einsum("dj,ckj->cdk", c_w, planes[..., :3]) + planes[:, None, :, 3]
    in_f = jnp.all(d >= -r_w[None, :, None], axis=-1)             # (C, D)
    mask4 = in_f & base[None, :] & (gpu.pair_lod[None, :] == sel_c[:, inst])
    # cascade-major flatten: on overflow, far-cascade casters drop first
    slots, _cnt = cullops.compact_mask(mask4.reshape(-1), visible_capacity)
    depth = rasterops.rasterize_shadow_atlas(gpu, vps, slots, SHADOW_RES)
    return CSMData(view_proj=vps, depth=depth, splits=splits)


CASCADE_COLORS = ((1.0, 0.25, 0.25), (0.25, 1.0, 0.25),
                  (0.3, 0.45, 1.0), (1.0, 1.0, 0.3))


def csm_debug_overlay(ldr, csm: CSMData, vc, world_pos, valid):
    """CSM debug view (ref src/CSMDebugRenderer.cpp): tint each pixel by its
    selected cascade and inset the cascade depth maps along the bottom edge.

    ldr (H, W, 3) uint8 tonemapped frame -> uint8 frame."""
    H, W = ldr.shape[0], ldr.shape[1]
    V = vc["view"]
    p_view = jnp.einsum("ij,hwj->hwi", V[:3, :3], world_pos) + V[:3, 3]
    dist = -p_view[..., 2]
    cidx = jnp.sum((dist[..., None] > csm.splits[None, None, :])
                   .astype(jnp.int32), axis=-1)
    cidx = jnp.clip(cidx, 0, NUM_CASCADES - 1)
    colors = jnp.asarray(CASCADE_COLORS, jnp.float32)[cidx]   # (H, W, 3)
    out = ldr.astype(jnp.float32) / 255.0
    out = jnp.where(valid[..., None], out * 0.65 + colors * 0.35, out)

    # thumbnails: strided subsample of each cascade's depth map
    th = max(H // 5, 8)
    s = max(SHADOW_RES // th, 1)
    pad = 8
    for c in range(NUM_CASCADES):
        thumb = csm.depth[c][::s, ::s][:th, :th]              # reversed-Z
        tint = jnp.asarray(CASCADE_COLORS[c], jnp.float32)
        img = thumb[..., None] * (0.75 * tint + 0.25)[None, None, :]
        x0 = pad + c * (th + pad)
        if x0 + th > W:
            break
        out = jax.lax.dynamic_update_slice(out, img, (H - th - pad, x0, 0))
    return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)


def csm_shadow_mask(csm: CSMData, vc, world_pos, normal, valid,
                    sun_dir, bias_scale: float = 1.0) -> jnp.ndarray:
    """Fullscreen CSM evaluation -> visibility mask (ref ShadowMask.hlsl PCF
    with per-cascade normal bias)."""
    H, W = world_pos.shape[0], world_pos.shape[1]
    V = vc["view"]
    p_view = jnp.einsum("ij,hwj->hwi", V[:3, :3], world_pos) + V[:3, 3]
    dist = -p_view[..., 2]
    # cascade select: first cascade whose far split exceeds the view distance
    cidx = jnp.sum((dist[..., None] > csm.splits[None, None, :]).astype(jnp.int32),
                   axis=-1)
    cidx = jnp.clip(cidx, 0, NUM_CASCADES - 1)
    vp = csm.view_proj[cidx]                                  # (H, W, 4, 4)

    # normal offset against acne (ref anisotropic normal bias), scaled by the
    # SELECTED cascade's texel size — using the last cascade's scale offset
    # near receivers by ~30x their actual texel, peter-panning close shadows
    ndl = jnp.abs(jnp.sum(normal * (-sun_dir), -1, keepdims=True))
    texel_world = ((4.0 * csm.splits[cidx] / NUM_CASCADES)
                   / SHADOW_RES)[..., None]
    p = world_pos + normal * (texel_world * 2.0 * bias_scale * (1.0 + (1.0 - ndl)))

    clip = jnp.einsum("hwij,hwj->hwi", vp[..., :3, :3], p) + vp[..., :3, 3]
    u = jnp.clip(clip[..., 0] * 0.5 + 0.5, 0.0, 1.0)
    v = jnp.clip(0.5 - clip[..., 1] * 0.5, 0.0, 1.0)
    z = clip[..., 2]                                          # reversed-Z light depth

    x = jnp.clip((u * SHADOW_RES).astype(jnp.int32), 0, SHADOW_RES - 1)
    y = jnp.clip((v * SHADOW_RES).astype(jnp.int32), 0, SHADOW_RES - 1)
    # 2x2 PCF: the footprint is pre-packed into a quad table so the filter is
    # ONE row gather per pixel instead of four 2D-indexed gathers (TPU gathers
    # are per-row latency-bound)
    S = SHADOW_RES
    d = csm.depth                                             # (C, S, S)
    right = jnp.concatenate([d[:, :, 1:], d[:, :, -1:]], 2)
    down = jnp.concatenate([d[:, 1:], d[:, -1:]], 1)
    downright = jnp.concatenate([right[:, 1:], right[:, -1:]], 1)
    quad = jnp.stack([d, right, down, downright], -1).reshape(-1, 4)
    q = quad[cidx * (S * S) + y * S + x]                      # (H, W, 4)
    depth_bias = 2e-3 * bias_scale
    # occluded when a NEARER-to-light surface exists (larger depth)
    vis = jnp.mean(jnp.where(q > (z + depth_bias)[..., None], 0.0, 1.0), -1)
    # beyond the last cascade there is no shadow data: return LIT (the
    # clamped-cascade fetch marked everything past the range sun-shadowed)
    vis = jnp.where(dist > csm.splits[-1], 1.0, vis)
    return jnp.where(valid, vis, 1.0)
