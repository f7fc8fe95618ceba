"""GPU culling: per-instance LOD selection + per-meshlet frustum/cone/HZB culling
with prefix-sum stream compaction.

Reference: src/shaders/GPUCulling.hlsl (two-phase culling, LOD select by projected
error targeting 2px, GPUCulling.hlsl:78-100) + per-meshlet tests in the amplification
shader (src/shaders/BasePass.hlsl:83-138) + Culling.hlsli helpers.

TPU design: culling is a pure mask over the static (instance, meshlet, lod) pair
table (SceneGPU.pair_*). The reference's InterlockedAdd compaction
(GPUCulling.hlsl:104-146) becomes a cumsum prefix-sum scatter — deterministic and
XLA-friendly. Two-phase HZB occlusion (Aaltonen SIGGRAPH'15) keeps the same
structure: phase 1 tests against last frame's HZB, phase 2 re-tests the occluded
set against the freshly built HZB.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from hobbyrenderer_tpu.utils import math as hm

LOD_TARGET_PIXEL_ERROR = 2.0  # ref GPUCulling.hlsl:87


def select_instance_lods(gpu, vc) -> jnp.ndarray:
    """Per-instance LOD choice: the coarsest LOD whose projected object-space error
    stays under LOD_TARGET_PIXEL_ERROR on screen (ref GPUCulling.hlsl:78-100).

    Projected size of world-space length e at distance d:
    px ≈ e * (proj11 * height/2) / d.
    """
    cam = vc["camera_pos"]
    dist = jnp.linalg.norm(gpu.inst_center - cam[None, :], axis=-1)
    dist = jnp.maximum(dist - gpu.inst_radius, vc["znear"])  # conservative: nearest point
    scale = vc["proj11"] * vc["viewport"][1] * 0.5
    err_world = gpu.prim_lod_error[gpu.inst_prim] * gpu.inst_scale_max[:, None]  # (N, L)
    err_px = err_world * (scale / dist)[:, None]
    ok = err_px <= LOD_TARGET_PIXEL_ERROR  # lod 0 has error 0 -> always ok
    lod_count = gpu.prim_lod_count[gpu.inst_prim]
    lods = jnp.arange(err_px.shape[1], dtype=jnp.int32)[None, :]
    valid = ok & (lods < lod_count[:, None])
    # pick the HIGHEST valid lod index (coarsest acceptable)
    best = jnp.max(jnp.where(valid, lods, 0), axis=1)
    return best.astype(jnp.int32)


def cull_pairs(gpu, vc, hzb: Optional[jnp.ndarray] = None,
               hzb_levels: int = 0,
               alpha_mask=None) -> dict:
    """Produce the visible-pair mask. Tests, per (instance, meshlet, lod) pair:
      1. lod == selected lod of the instance
      2. meshlet world bounding sphere vs frustum
      3. meshlet backface cone (meshopt convention)
      4. optional HZB occlusion (phase 1 uses last frame's pyramid)
      5. optional alpha-mode filter (separate opaque/masked raster passes)
    Returns dict with 'mask' (D,), 'sel_lod' (N,), plus world-space meshlet bounds.
    """
    inst = gpu.pair_inst
    ml = gpu.pair_meshlet
    sel = select_instance_lods(gpu, vc)
    mask = gpu.pair_lod == sel[inst]

    if alpha_mask is not None:
        mask &= alpha_mask[gpu.inst_alpha_mode[inst]]

    # world-space meshlet sphere
    W = gpu.inst_transform[inst]                       # (D, 4, 4)
    c_obj = gpu.ml_center[ml]
    c_world = jnp.einsum("dij,dj->di", W[:, :3, :3], c_obj) + W[:, :3, 3]
    r_world = gpu.ml_radius[ml] * gpu.inst_scale_max[inst]

    planes = hm.extract_frustum_planes(vc["view_proj"], xp=jnp)
    mask &= hm.sphere_in_frustum(planes, c_world, r_world, xp=jnp)

    # backface cone: cull when every triangle faces away
    # (cull if dot(axis, c - cam) >= cutoff * |c - cam| + r)
    axis_obj = gpu.ml_cone_axis[ml]
    axis_world = jnp.einsum("dij,dj->di", gpu.inst_normal_mat[inst], axis_obj)
    axis_world = axis_world / jnp.maximum(
        jnp.linalg.norm(axis_world, axis=-1, keepdims=True), 1e-20)
    to_c = c_world - vc["camera_pos"][None, :]
    dist = jnp.linalg.norm(to_c, axis=-1)
    cone_cull = (jnp.einsum("di,di->d", axis_world, to_c)
                 >= gpu.ml_cone_cutoff[ml] * dist + r_world)
    # cutoff >= 1 disables the cone
    cone_cull &= gpu.ml_cone_cutoff[ml] < 0.999
    mask &= ~cone_cull

    if hzb is not None and hzb_levels > 0:
        vis = hzb_test_spheres(hzb, hzb_levels, vc, c_world, r_world)
        mask &= vis

    return {"mask": mask, "sel_lod": sel, "ml_center_world": c_world,
            "ml_radius_world": r_world}


def hzb_test_spheres(hzb: jnp.ndarray, levels: int, vc, centers_world, radii,
                     eff_hw=None) -> jnp.ndarray:
    """Occlusion test of world spheres against a min-depth pyramid (reversed-Z:
    HZB stores the MIN depth = farthest; sphere visible if its nearest depth >= HZB).

    Reference: Culling.hlsli:29-85 — project sphere to NDC AABB, pick the mip where
    the AABB spans <= 2x2 texels, compare sphere's closest depth against the
    conservative min depth. hzb is (H0, W0) f32 level-0-major mip chain packed as a
    list via same-array power-of-two offsets; here we take a (levels, H0, W0) padded
    stack for static shapes (small memory cost, 1080p HZB stack ~ 4 MB x levels/?).
    """
    V = vc["view"]
    c_view = jnp.einsum("ij,dj->di", V[:3, :3], centers_world) + V[:3, 3]
    mn, mx, valid = hm.sphere_screen_extent(c_view, radii, vc["proj00"], vc["proj11"],
                                            vc["znear"], xp=jnp)
    # closest depth of sphere (reversed-Z infinite: depth = znear / dist)
    dist = jnp.maximum(-c_view[..., 2] - radii, vc["znear"])
    sphere_depth = vc["znear"] / dist

    h0, w0 = hzb.shape[-2], hzb.shape[-1]
    # the IMAGE occupies only the top-left (he0, we0) of each level (build_hzb
    # fixed-stride fold); uv maps through that extent, NOT (h0, w0) — mapping
    # through the padded size caused false culls whenever W < fx*w0. When the
    # caller passes no eff_hw, derive it from the viewport (traced floats are
    # fine: the extent only feeds float uv math).
    if eff_hw is None:
        Wv, Hv = vc["viewport"][0], vc["viewport"][1]
        he0 = Hv / jnp.ceil(Hv / h0)
        we0 = Wv / jnp.ceil(Wv / w0)
    else:
        he0, we0 = eff_hw
    # uv AABB in [0,1] with y flip
    u0 = jnp.clip(mn[..., 0] * 0.5 + 0.5, 0.0, 1.0)
    u1 = jnp.clip(mx[..., 0] * 0.5 + 0.5, 0.0, 1.0)
    v0 = jnp.clip(0.5 - mx[..., 1] * 0.5, 0.0, 1.0)
    v1 = jnp.clip(0.5 - mn[..., 1] * 0.5, 0.0, 1.0)
    # mip where AABB covers <= 2 texels at effective level-0 size we0 x he0
    size_px = jnp.maximum((u1 - u0) * we0, (v1 - v0) * he0)
    mip_raw = jnp.ceil(jnp.log2(jnp.maximum(size_px, 1.0)))
    mip = jnp.clip(mip_raw, 0, levels - 1).astype(jnp.int32)
    # if the wanted mip exceeds the pyramid (non-square HZB: levels is set by
    # the SMALLER dimension), the 2x2 corner gather would skip interior
    # texels and could falsely cull — treat such spheres as visible
    too_big = mip_raw > (levels - 1)

    # gather 2x2 from the selected level (levels stacked on axis 0, each level
    # stored at its own resolution in the top-left corner)
    scale = 1.0 / (2.0 ** mip.astype(jnp.float32))
    lw_max = jnp.maximum(w0 // (2 ** mip), 1)
    lh_max = jnp.maximum(h0 // (2 ** mip), 1)
    x0 = jnp.clip((u0 * we0 * scale).astype(jnp.int32), 0, lw_max - 1)
    x1 = jnp.clip((u1 * we0 * scale).astype(jnp.int32), 0, lw_max - 1)
    y0 = jnp.clip((v0 * he0 * scale).astype(jnp.int32), 0, lh_max - 1)
    y1 = jnp.clip((v1 * he0 * scale).astype(jnp.int32), 0, lh_max - 1)
    d00 = hzb[mip, y0, x0]
    d01 = hzb[mip, y0, x1]
    d10 = hzb[mip, y1, x0]
    d11 = hzb[mip, y1, x1]
    occ_depth = jnp.minimum(jnp.minimum(d00, d01), jnp.minimum(d10, d11))
    visible = sphere_depth >= occ_depth
    # spheres that clip the near plane or have invalid projection: always
    # visible; likewise spheres wider than the coarsest mip's 2x2 footprint
    return visible | ~valid | too_big


def compact_mask(mask: jnp.ndarray, capacity: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic stream compaction: indices of True lanes packed into a
    (capacity,) i32 array (padded with -1) + the true count.

    Replaces the reference's InterlockedAdd append buffers
    (GPUCulling.hlsl:104-146) with cumsum + scatter."""
    idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    count = jnp.sum(mask.astype(jnp.int32))
    src = jnp.arange(mask.shape[0], dtype=jnp.int32)
    slots = jnp.where(mask & (idx < capacity), idx, capacity)  # overflow -> dropped
    out = jnp.full((capacity + 1,), -1, jnp.int32).at[slots].set(
        jnp.where(mask, src, -1), mode="drop")
    return out[:capacity], jnp.minimum(count, capacity)
