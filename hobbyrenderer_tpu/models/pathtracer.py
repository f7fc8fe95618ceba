"""ReferencePathTracer mode: unbiased progressive Monte Carlo path tracer.

Reference: src/PathTracerRenderer.cpp (111) + src/shaders/PathTracer.hlsl (340):
per-pixel loop of <=8 bounces over an inline-RT query, NEE on lights with
cone-sampled soft sun + per-light shadow rays, GGX-VNDF / cosine importance
sampling, Russian roulette after bounce 2, Bruneton sky on miss with primary-only
sun disk, progressive running-average accumulation with camera-move reset
(PathTracerRenderer.cpp:41-50), always LOD 0 (PathTracer.hlsl:102-103).

TPU design: a wavefront over all pixels — every bounce is one lockstep BVH
traversal over the full ray population (masked lanes for terminated paths), then
fully-regular shading/sampling. Deterministic: the RNG is a pure function of
(pixel, accumulation_index, dimension) like the reference's PCG seeding
(RNG.hlsli:21-27), so image N is reproducible — the golden-image property."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import post as postops
from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops import sky as skyops
from hobbyrenderer_tpu.ops.intersect import INF, offset_ray_origin
from hobbyrenderer_tpu.scene.gpu import (MAT_ATTEN_COLOR, MAT_ATTEN_DIST,
                                         MAT_BASE_COLOR, MAT_EMISSIVE,
                                         MAT_IOR, MAT_METALLIC, MAT_ROUGHNESS,
                                         MAT_TRANSMISSION)
from hobbyrenderer_tpu.scene.scene import LIGHT_DIRECTIONAL
from hobbyrenderer_tpu.utils import math as hm
from hobbyrenderer_tpu.utils.rng import pcg3d, uniform_from_bits


class SceneRT(NamedTuple):
    """Ray-tracing snapshot: world-space BVH + per-triangle attribute tables.

    A flattened snapshot at LOD0 (matching the reference path tracer's
    always-LOD0). DYNAMIC scenes stay correct through refit_scene_rt(): the
    tree topology is host-built once, and per-frame instance motion re-runs the
    device-side box/leaf refit (the per-frame TLAS-rebuild analogue, ref
    src/CommonRenderers.cpp:186-250, src/Scene.cpp:67-214).

    Oversized triangles are SUBDIVIDED before the BVH build (a giant triangle's
    AABB poisons every ancestor's bounds: grazing rays were taking 16k lockstep
    steps). BVH ids are split-triangle ids; split_to_orig/split_bary map hits
    back to original triangles + barycentrics for attribute fetch."""

    bvh: bvhops.BVH
    tri_gv: jnp.ndarray        # (T, 3) i32 global vertex ids (ORIGINAL tris)
    tri_inst: jnp.ndarray      # (T,) i32 instance id
    tri_mat: jnp.ndarray       # (T,) i32 material id
    split_to_orig: jnp.ndarray  # (Ts,) i32 split tri -> original tri
    split_bary: jnp.ndarray    # (Ts, 3, 2) f32 original (u,v) of split verts
    split_world0: jnp.ndarray  # (Ts, 3, 3) f32 split verts at LOAD-time world
    inst_inv0: jnp.ndarray     # (N, 4, 4) f32 inverse load-time world matrix
    lights: object = None      # ops.lights.LightPool (analytic + emissive tris)
    btable: jnp.ndarray = None  # (I+L, 128) beam-traversal table (ops.beam)
    bvh16: object = None       # ops.bvh16.BVH16 — the incoherent-ray fast
    #                            path (6-14 fat-row gathers per ray vs the
    #                            4-ary walk's ~40-100 narrow ones)
    em_index: jnp.ndarray = None  # (T,) i32 original tri -> light-pool emissive
    #                               entry (-1 = not NEE-sampled); the inverse
    #                               of lights.em_orig, for hit-emission MIS


def _subdivide_large(tri_verts: np.ndarray, max_rounds: int = 4,
                     rel_threshold: float = 1.0 / 24.0):
    """1->4 midpoint subdivision of triangles larger than rel_threshold x scene
    diagonal. Returns (split_verts, split_to_orig, split_bary)."""
    T = tri_verts.shape[0]
    orig = np.arange(T, dtype=np.int32)
    bary = np.tile(np.asarray([[[0, 0], [1, 0], [0, 1]]], np.float32), (T, 1, 1))
    verts = tri_verts
    lo = tri_verts.reshape(-1, 3).min(0)
    hi = tri_verts.reshape(-1, 3).max(0)
    thresh = float(np.linalg.norm(hi - lo)) * rel_threshold
    for _ in range(max_rounds):
        ext = verts.max(1) - verts.min(1)                # (Ts, 3)
        big = np.linalg.norm(ext, axis=1) > thresh
        if not big.any():
            break
        keep_v, keep_o, keep_b = verts[~big], orig[~big], bary[~big]
        bv, bo, bb = verts[big], orig[big], bary[big]
        m01v = 0.5 * (bv[:, 0] + bv[:, 1])
        m12v = 0.5 * (bv[:, 1] + bv[:, 2])
        m02v = 0.5 * (bv[:, 0] + bv[:, 2])
        m01b = 0.5 * (bb[:, 0] + bb[:, 1])
        m12b = 0.5 * (bb[:, 1] + bb[:, 2])
        m02b = 0.5 * (bb[:, 0] + bb[:, 2])
        child_v = np.concatenate([
            np.stack([bv[:, 0], m01v, m02v], 1),
            np.stack([m01v, bv[:, 1], m12v], 1),
            np.stack([m02v, m12v, bv[:, 2]], 1),
            np.stack([m01v, m12v, m02v], 1)], 0)
        child_b = np.concatenate([
            np.stack([bb[:, 0], m01b, m02b], 1),
            np.stack([m01b, bb[:, 1], m12b], 1),
            np.stack([m02b, m12b, bb[:, 2]], 1),
            np.stack([m01b, m12b, m02b], 1)], 0)
        child_o = np.tile(bo, 4)
        verts = np.concatenate([keep_v, child_v], 0)
        orig = np.concatenate([keep_o, child_o], 0)
        bary = np.concatenate([keep_b, child_b], 0)
    return (verts.astype(np.float32), orig.astype(np.int32),
            bary.astype(np.float32))


def build_scene_rt(scene, gpu) -> SceneRT:
    """Host-side flatten: every instance's LOD0 triangles to world space."""
    tris, gvs, insts, mats = [], [], [], []
    voff = {}
    off = 0
    for p, mesh in enumerate(scene.meshes):
        voff[p] = off
        off += mesh.num_vertices
    for i, I in enumerate(scene.instances):
        mesh = scene.meshes[I.prim]
        w = scene.nodes[I.node].world
        idx = mesh.lods[0].indices  # (t, 3) local
        pw = hm.transform_points(w, mesh.positions)
        tris.append(pw[idx])
        gvs.append(idx.astype(np.int32) + voff[I.prim])
        insts.append(np.full(idx.shape[0], i, np.int32))
        mats.append(np.full(idx.shape[0], I.material, np.int32))
    tri_verts = np.concatenate(tris, 0).astype(np.float32)
    split_verts, split_to_orig, split_bary = _subdivide_large(tri_verts)
    bvh = bvhops.build_bvh(split_verts)
    inst_inv0 = np.stack([np.linalg.inv(scene.nodes[I.node].world)
                          for I in scene.instances]).astype(np.float32)
    rt = SceneRT(bvh=bvh,
                   tri_gv=jnp.asarray(np.concatenate(gvs, 0)),
                   tri_inst=jnp.asarray(np.concatenate(insts, 0)),
                   tri_mat=jnp.asarray(np.concatenate(mats, 0)),
                   split_to_orig=jnp.asarray(split_to_orig),
                   split_bary=jnp.asarray(split_bary),
                   split_world0=jnp.asarray(split_verts),
                   inst_inv0=jnp.asarray(inst_inv0))
    from hobbyrenderer_tpu.ops import beam as beamops
    from hobbyrenderer_tpu.ops import lights as lightops
    pool = lightops.build_light_pool(scene, gpu)
    # inverse of em_orig: original tri id -> pool emissive entry (-1 = none)
    T = rt.tri_inst.shape[0]
    em_index = np.full(T, -1, np.int32)
    orig = np.asarray(pool.em_orig)
    live = orig >= 0
    em_index[orig[live]] = np.nonzero(live)[0].astype(np.int32)
    from hobbyrenderer_tpu.ops import bvh16 as b16ops
    return rt._replace(lights=pool,
                       em_index=jnp.asarray(em_index),
                       btable=jnp.asarray(beamops.beam_table(
                           np.asarray(bvh.table))),
                       bvh16=b16ops.build_bvh16(split_verts))


@jax.jit
def refit_scene_rt(rt: SceneRT, inst_transform) -> SceneRT:
    """Per-frame RT update for moved/animated instances.

    inst_transform (N, 4, 4): CURRENT world matrices (SceneGPU.inst_transform).
    Moves every split triangle by M_i = W_now @ W_load^-1 of its instance and
    refits the BVH boxes on device — the TLAS-rebuild-per-frame analogue
    (ref src/Scene.cpp:67-214; D3D12 BuildRaytracingAccelerationStructure)."""
    M = jnp.einsum("nij,njk->nik", inst_transform, rt.inst_inv0)
    Mi = M[rt.tri_inst[rt.split_to_orig]]                     # (Ts, 4, 4)
    v = jnp.einsum("tij,tvj->tvi", Mi[:, :3, :3], rt.split_world0) \
        + Mi[:, None, :3, 3]
    rt = rt._replace(bvh=bvhops.refit_bvh(rt.bvh, v))
    if rt.btable is not None:
        from hobbyrenderer_tpu.ops import beam as beamops
        rt = rt._replace(btable=beamops.beam_table(rt.bvh.table))
    if rt.bvh16 is not None:
        from hobbyrenderer_tpu.ops import bvh16 as b16ops
        rt = rt._replace(bvh16=b16ops.refit_bvh16(rt.bvh16, v))
    if rt.lights is not None:
        from hobbyrenderer_tpu.ops import lights as lightops
        M_tri = M[rt.tri_inst[jnp.maximum(rt.lights.em_orig, 0)]]
        rt = rt._replace(lights=lightops.refit_light_pool(rt.lights, M_tri))
    return rt


def camera_rays(vc, height: int, width: int, jitter_uv):
    """Primary rays through jittered pixel positions. jitter_uv: (H, W, 2) in
    [0,1) sub-pixel offsets (stratified by the accumulation RNG)."""
    px = jnp.stack(jnp.meshgrid(jnp.arange(width, dtype=jnp.float32),
                                jnp.arange(height, dtype=jnp.float32),
                                indexing="xy"), -1) + jitter_uv
    ndc_x = (px[..., 0] + 0.0) / width * 2.0 - 1.0
    ndc_y = 1.0 - (px[..., 1] + 0.0) / height * 2.0
    inv = vc["inv_view_proj"]
    p = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, 0.5)], -1)
    w = jnp.einsum("j,hwj->hw", inv[3, :3], p) + inv[3, 3]
    world = (jnp.einsum("ij,hwj->hwi", inv[:3, :3], p) + inv[:3, 3]) / w[..., None]
    o = jnp.broadcast_to(vc["camera_pos"], world.shape)
    d = hm.normalize(world - o, xp=jnp)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def _fetch_hit_attrs(gpu, rt: SceneRT, hit, o, d):
    """Interpolate attributes at hit points (ref quantized vertex fetch in
    RaytracingCommon.hlsli hit attribute path)."""
    stri = jnp.maximum(hit.tri, 0)
    # map split-triangle hit -> original triangle + original barycentrics
    tri = rt.split_to_orig[stri]
    sb = rt.split_bary[stri]                    # (R, 3, 2)
    uv_orig = (sb[:, 0] * (1.0 - hit.u - hit.v)[:, None]
               + sb[:, 1] * hit.u[:, None] + sb[:, 2] * hit.v[:, None])
    u, v = uv_orig[:, 0], uv_orig[:, 1]
    gv = rt.tri_gv[tri]                         # (R, 3)
    inst = rt.tri_inst[tri]
    mat = rt.tri_mat[tri]
    b = jnp.stack([1.0 - u - v, u, v], -1)      # (R, 3)

    n_obj, _s = hm.unpack_normal_oct(gpu.vnormals[gv], xp=jnp)   # (R, 3, 3)
    Nm = gpu.inst_normal_mat[inst]
    n_w = jnp.einsum("rij,rvj->rvi", Nm, n_obj)
    n = hm.normalize(jnp.einsum("rv,rvi->ri", b, n_w), xp=jnp)

    p_obj = gpu.positions[gv]
    W = gpu.inst_transform[inst]
    p_w = jnp.einsum("rij,rvj->rvi", W[:, :3, :3], p_obj) + W[:, None, :3, 3]
    gn = jnp.cross(p_w[:, 1] - p_w[:, 0], p_w[:, 2] - p_w[:, 0])
    gn = hm.normalize(gn, xp=jnp)

    pos = o + d * hit.t[..., None]
    uv = jnp.einsum("rv,rvi->ri", b, hm.unpack_uv_half2(gpu.vuvs[gv], xp=jnp))

    # two-sided shading: flip both normals toward the incoming ray
    flip = jnp.sum(gn * d, -1, keepdims=True) > 0
    gn = jnp.where(flip, -gn, gn)
    n = jnp.where(jnp.sum(n * gn, -1, keepdims=True) < 0, -n, n)
    return pos, n, gn, uv, mat, inst


def _fresnel_dielectric(cos_i, eta):
    """Exact unpolarized dielectric Fresnel (ref exact dielectric Fresnel in
    PathTracer.hlsl:19-255). cos_i >= 0, eta = n_transmitted / n_incident."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 / (eta * eta)) * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    rs = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-8)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-8)
    F = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, F)


def _refract(d, n, eta_rel):
    """Snell refraction of d about n (n opposes d). eta_rel = n_in / n_out.
    Falls back to mirror reflection on total internal reflection."""
    cos_i = -jnp.sum(d * n, -1, keepdims=True)
    sin2_t = eta_rel * eta_rel * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    refr = eta_rel * d + (eta_rel * cos_i - cos_t) * n
    refl = d + 2.0 * cos_i * n
    return jnp.where(tir, refl, refr), tir[..., 0]


def _sun_index(gpu):
    lt = gpu.light_type
    is_dir = (lt == LIGHT_DIRECTIONAL) & (jnp.arange(lt.shape[0]) < gpu.light_count)
    return jnp.argmax(is_dir), is_dir.any()


# per-bounce wavefront-compaction schedule (see trace_paths): bounces 0..2
# run full-width; from COMPACT_START the live paths compact into static
# capacities CAP_FRACS[b-COMPACT_START] * RS (floor COMPACT_MIN_CAP). The
# threshold keeps tiny test scenes on the exactly-deterministic scan path.
COMPACT_START = 3
CAP_FRACS = (0.625, 0.375, 0.25, 0.125, 0.125)
COMPACT_MIN_LANES = 32768
COMPACT_MIN_CAP = 4096


def trace_paths(gpu, rt: SceneRT, vc, settings, height: int, width: int,
                accum_index, max_bounces: int = 8, rr_start: int = 2,
                sample_textures=None, sky_fn=None,
                env_as_lights: bool = False, spp: int = 1,
                with_stats: bool = False):
    """spp samples per pixel in ONE wavefront; returns (H*W, 3) mean radiance.

    spp > 1 widens the lockstep wavefront to R*spp lanes: the per-step
    dispatch overheads and the compaction-phase tail amortize over more rays
    (measured: 540p wavefronts run ~2x slower per sample than 720p ones).
    Sample s of accumulation frame a draws the RNG stream of frame a*spp+s,
    so an spp=N frame is EXACTLY the mean of N consecutive spp=1 frames —
    deterministic accumulation is preserved (ref PathTracerRenderer.cpp:41-50
    accumulates one sample per rendered frame)."""
    R = height * width
    pix = (jnp.arange(R * spp, dtype=jnp.uint32) % jnp.uint32(R)
           if spp > 1 else jnp.arange(R, dtype=jnp.uint32))
    frame = jnp.asarray(accum_index).astype(jnp.uint32)
    if spp > 1:
        frame = frame * jnp.uint32(spp) + jnp.repeat(
            jnp.arange(spp, dtype=jnp.uint32), R)

    def rand3(dim):
        bits = pcg3d(jnp.stack([pix,
                                jnp.broadcast_to(frame, pix.shape),
                                jnp.full_like(pix, dim)], -1))
        return (uniform_from_bits(bits[..., 0]), uniform_from_bits(bits[..., 1]),
                uniform_from_bits(bits[..., 2]))

    def rand2(dim):
        a, b, _ = rand3(dim)
        return a, b

    ju, jv = rand2(0)
    if spp > 1:
        parts = [camera_rays(vc, height, width,
                             jnp.stack([ju[s * R:(s + 1) * R]
                                        .reshape(height, width),
                                        jv[s * R:(s + 1) * R]
                                        .reshape(height, width)], -1))
                 for s in range(spp)]
        o = jnp.concatenate([p[0] for p in parts])
        d = jnp.concatenate([p[1] for p in parts])
    else:
        o, d = camera_rays(vc, height, width,
                           jnp.stack([ju.reshape(height, width),
                                      jv.reshape(height, width)], -1))
    sun_idx, has_sun = _sun_index(gpu)

    from hobbyrenderer_tpu.ops import lights as lightops
    use_pool = rt.lights is not None and rt.em_index is not None

    def bounce_body(carry, bounce):
        (o, d, radiance, throughput, active, inside, sigma_t, prev_pdf,
         pix, frame) = carry
        dim = 1 + bounce * 8

        def rand3(dim):
            bits = pcg3d(jnp.stack([pix, frame,
                                    jnp.full_like(pix, dim)], -1))
            return (uniform_from_bits(bits[..., 0]),
                    uniform_from_bits(bits[..., 1]),
                    uniform_from_bits(bits[..., 2]))

        def rand2(dim):
            a, b, _ = rand3(dim)
            return a, b
        # bounced rays are incoherent: sorted-block beam kernel on TPU
        # (ops/trace.py), lockstep wavefront elsewhere
        from hobbyrenderer_tpu.ops import trace as traceops
        hit = traceops.closest_hit_auto(rt, o, d, active=active)
        miss = (hit.tri < 0) & active
        # Beer-Lambert attenuation through the current medium (ref interior
        # media, PathTracer.hlsl Beer-Lambert)
        seg_t = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
        throughput = throughput * jnp.where(
            inside[..., None], jnp.exp(-sigma_t * seg_t[..., None]), 1.0)
        # sky on miss (sun disk only on primary — NEE covers it after bounces)
        if sky_fn is not None:
            sky = sky_fn(d, bounce)
        elif gpu.env_map is not None:
            # authored environment map: the miss shader samples it directly
            # (ref IBL background; the envmap replaces the procedural sky).
            # With env-as-lights the env energy rides NEE's directional set,
            # so misses return 0 EXCEPT for NEE-unreachable transports
            # (primary rays, transmission, alpha pass-through — marked by
            # prev_pdf <= 0, same as the emissive-MIS convention): NEE's
            # eval_brdf covers only the reflection side, so zeroing the env
            # behind glass/cutouts would lose that energy entirely
            from hobbyrenderer_tpu.ops import envmap as envops
            sky = envops.sample_equirect(gpu.env_map, d)
            if env_as_lights:
                sky = jnp.where((prev_pdf <= 0.0)[..., None], sky, 0.0)
        else:
            sky_nd = skyops.sky_radiance(d, gpu.light_dir[sun_idx], settings,
                                         with_sun_disk=False)
            sky_wd = skyops.sky_radiance(d, gpu.light_dir[sun_idx], settings,
                                         with_sun_disk=True)
            sky = jnp.where(bounce == 0, sky_wd, sky_nd)
        radiance = radiance + jnp.where(miss[..., None], throughput * sky, 0.0)
        active = active & (hit.tri >= 0)

        pos, n, gn, uv, mat, inst = _fetch_hit_attrs(gpu, rt, hit, o, d)
        mf = gpu.mat_f[mat]
        albedo = mf[:, MAT_BASE_COLOR:MAT_BASE_COLOR + 3]
        metallic = mf[:, MAT_METALLIC]
        rough = jnp.clip(mf[:, MAT_ROUGHNESS], shadeops.MIN_ROUGHNESS, 1.0)
        emissive = mf[:, MAT_EMISSIVE:MAT_EMISSIVE + 3]
        trans = mf[:, MAT_TRANSMISSION]
        alpha_v = mf[:, MAT_BASE_COLOR + 3]

        # texture sampling (ref bindless sampling at PT hits; LOD via a
        # ray-cone footprint approximation — the reference uses LOD 0 geometry
        # with HW-sampled textures)
        streaming = getattr(gpu, "tex_stream", None) is not None
        if streaming or gpu.tex_table.shape[0] > gpu.mat_f.shape[0]:
            from hobbyrenderer_tpu.ops import texture as texops
            from hobbyrenderer_tpu.scene.gpu import (MAT_TEX_BASE_HI,
                                                     MAT_TEX_BASE_LO,
                                                     MAT_TEX_SIZE, MAT_UV_SCALE)
            tex_size = mf[:, MAT_TEX_SIZE]
            tex_base = (jnp.round(mf[:, MAT_TEX_BASE_HI]).astype(jnp.int32) * 4096
                        + jnp.round(mf[:, MAT_TEX_BASE_LO]).astype(jnp.int32))
            uv_s = uv * jnp.maximum(mf[:, MAT_UV_SCALE:MAT_UV_SCALE + 1], 1e-6)
            spread = 2.0 / (vc["proj11"] * height)    # pixel angular footprint
            foot = jnp.where(jnp.isfinite(hit.t), hit.t, 1.0) * spread
            lod = jnp.log2(jnp.maximum(tex_size * foot, 1e-6))
            bits = pcg3d(jnp.stack([pix, jnp.broadcast_to(frame, pix.shape),
                                    jnp.full_like(pix, dim + 5)], -1))
            if streaming:
                ts = texops.sample_material_streamed(gpu.tex_stream, mat,
                                                     uv_s, lod, bits)
            else:
                ts = texops.sample_material(gpu, tex_size, tex_base, uv_s,
                                            lod, bits)
            albedo = albedo * ts.albedo
            alpha_v = alpha_v * ts.alpha
            rough = jnp.clip(rough * ts.roughness, shadeops.MIN_ROUGHNESS, 1.0)
            metallic = metallic * ts.metallic
            emissive = emissive * ts.emissive

        # alpha test (MASK materials only carry a nonzero cutoff): a failed
        # hit becomes a straight pass-through (costs one bounce — a bounded
        # approximation of the reference's any-hit re-trace,
        # RaytracingCommon.hlsli:138-199)
        from hobbyrenderer_tpu.scene.gpu import MAT_ALPHA_CUTOFF
        alpha_fail = active & (alpha_v < mf[:, MAT_ALPHA_CUTOFF])
        # BLEND coverage (glTF baseColor.a on alpha-blend materials):
        # stochastic pass-through with probability (1 - coverage). Coverage
        # is max(alpha, transmission): KHR_materials_transmission wants
        # transmissive surfaces fully covered (the transmission lobe, not
        # alpha, makes them see-through), but assets commonly author glass as
        # alpha~0 + transmission=1 — the max() honors both conventions. The
        # deferred transparent pass composites the same expectation
        # analytically (ops/transparent.py).
        u_cov, _ = rand2(dim + 6)
        blend = gpu.inst_alpha_mode[inst] == 2
        cov = jnp.maximum(alpha_v, trans)
        alpha_fail = alpha_fail | (active & blend & (u_cov >= cov))
        shade_ok = active & ~alpha_fail

        v = -d
        # lobe probabilities are needed by BOTH the MIS weights below and the
        # bounce sampler, so they are computed once up front
        ior = jnp.maximum(mf[:, MAT_IOR], 1.01)
        atten_c = jnp.clip(mf[:, MAT_ATTEN_COLOR:MAT_ATTEN_COLOR + 3], 1e-4, 1.0)
        atten_d = jnp.maximum(mf[:, MAT_ATTEN_DIST], 1e-3)
        cos_i = jnp.maximum(jnp.sum(v * n, -1), 0.0)
        eta_tr = jnp.where(inside, 1.0 / ior, ior)       # n_transmitted/n_incident
        F_d = _fresnel_dielectric(cos_i, eta_tr)
        p_transmit = jnp.clip(trans * (1.0 - F_d), 0.0, 0.98)
        diffuse_c, f0, alpha = shadeops.brdf_params(albedo, metallic, rough)
        # transmissive materials route their non-Fresnel energy through the
        # transmission lobe; the reflection side keeps only (1-trans) diffuse
        diffuse_c = diffuse_c * (1.0 - trans)[..., None]
        w_spec = hm.luminance(f0, xp=jnp) + 1e-4
        w_diff = hm.luminance(diffuse_c, xp=jnp) + 1e-4
        p_spec = w_spec / (w_spec + w_diff)
        v_loc = smp.to_local(n, v)
        v_loc = v_loc.at[..., 2].set(jnp.maximum(v_loc[..., 2], 1e-4))

        # ---- emitted light at the hit ----
        # Emissive triangles that are ALSO in the NEE pool would be counted by
        # both estimators; MIS (power heuristic) splits the energy (ref
        # PathTracer.hlsl MIS). prev_pdf <= 0 marks transports NEE cannot
        # produce (primary ray, transmission, alpha pass-through) -> full
        # hit-side weight with the material's own (textured) emissive. Pooled
        # hits use the POOL radiance so both MIS halves integrate the same
        # light (the pool is untextured and power-conserving under
        # subsampling; ReSTIR lights the same quantity).
        if use_pool:
            pool = rt.lights
            A_n = pool.power_pdf.shape[0] - pool.em_v0.shape[0]
            orig_t = rt.split_to_orig[jnp.maximum(hit.tri, 0)]
            e_idx = rt.em_index[orig_t]
            in_pool = shade_ok & (e_idx >= 0) & (prev_pdf > 0.0)
            e_c = jnp.maximum(e_idx, 0)
            nx2 = jnp.cross(pool.em_e1[e_c], pool.em_e2[e_c])
            area_h = 0.5 * jnp.linalg.norm(nx2, axis=-1)
            n_eh = nx2 / jnp.maximum(2.0 * area_h, 1e-12)[..., None]
            cos_lh = jnp.abs(jnp.sum(n_eh * (-d), -1))
            d2h = jnp.maximum(hit.t * hit.t, 1e-8)
            pdf_light_h = (pool.power_pdf[A_n + e_c] * d2h
                           / jnp.maximum(area_h * cos_lh, 1e-8))
            w_hit = smp.power_heuristic(prev_pdf, pdf_light_h)
            em_out = jnp.where(in_pool[..., None],
                               pool.em_rad[e_c] * w_hit[..., None], emissive)
        else:
            em_out = emissive
        radiance = radiance + jnp.where(shade_ok[..., None],
                                        throughput * em_out, 0.0)

        # ---- NEE over the polymorphic pool (power-proportional selection;
        # ref PrepareLights' power CDF) with MIS against the BRDF sampler for
        # area (emissive-triangle) sources; analytic lights are delta ----
        u_l, u1, u2 = rand3(dim + 0)
        if use_pool:
            n_src = pool.power_pdf.shape[0]
            s = jnp.clip(jnp.searchsorted(pool.power_cdf, u_l), 0, n_src - 1)
            pdf_sel = jnp.maximum(pool.power_pdf[s], 1e-12)
            L, rad, dist, (is_em_s, area_s, cos_ls, d2s) = \
                lightops.pool_light_incident(gpu, pool, s,
                                             jnp.stack([u1, u2], -1), pos,
                                             return_aux=True)
            la = jnp.clip(s, 0, gpu.light_type.shape[0] - 1)
            is_sun = ~is_em_s & (gpu.light_type[la] == LIGHT_DIRECTIONAL)
            cos_max = jnp.cos(settings.sun_angular_radius)
            L = jnp.where(is_sun[..., None],
                          smp.sample_cone(L, cos_max, u1, u2), L)
            pdf_light_sol = pdf_sel * d2s / jnp.maximum(area_s * cos_ls, 1e-8)
            l_loc_nee = smp.to_local(n, L)
            pdf_b = (1.0 - p_transmit) * smp.brdf_mix_pdf(v_loc, l_loc_nee,
                                                          alpha, p_spec)
            w_nee = jnp.where(is_em_s,
                              smp.power_heuristic(pdf_light_sol, pdf_b), 1.0)
            inv_sel = w_nee / pdf_sel
        else:
            nl = jnp.maximum(gpu.light_count, 1)
            li = jnp.minimum((u_l * nl).astype(jnp.int32), nl - 1)
            L, rad, dist = shadeops.light_incident(
                gpu.light_type[li], gpu.light_pos[li], gpu.light_dir[li],
                gpu.light_color[li], gpu.light_range[li], gpu.light_cone[li],
                pos)
            is_sun = gpu.light_type[li] == LIGHT_DIRECTIONAL
            cos_max = jnp.cos(settings.sun_angular_radius)
            L = jnp.where(is_sun[..., None],
                          smp.sample_cone(L, cos_max, u1, u2), L)
            inv_sel = nl.astype(jnp.float32)
        # transmissive energy is carried by the transmission lobe, not NEE
        f = shadeops.eval_brdf(n, v, L, albedo * (1.0 - trans)[..., None],
                               metallic, rough)
        ndl_ok = (jnp.sum(L * gn, -1) > 0) & (jnp.sum(L * n, -1) > 0)
        nee_active = shade_ok & ndl_ok & (jnp.max(rad, -1) > 0)
        so = offset_ray_origin(pos, gn, L)
        from hobbyrenderer_tpu.ops.intersect import retarget_shadow_ray
        L_v, tmax_t = retarget_shadow_ray(pos, so, L, dist)
        occluded = traceops.any_hit_auto(
            rt, so, L_v,
            t_max=jnp.where(nee_active, tmax_t, 1e-4),
            active=nee_active)
        contrib = throughput * f * rad * inv_sel[..., None]
        radiance = radiance + jnp.where((nee_active & ~occluded)[..., None], contrib, 0.0)

        # ---- Russian roulette (ref PathTracer.hlsl:263-270) ----
        u_rr, _ = rand2(dim + 1)
        do_rr = bounce >= rr_start
        p_cont = jnp.where(do_rr, jnp.clip(jnp.max(throughput, -1), 0.05, 0.95), 1.0)
        active = active & (u_rr < p_cont)
        throughput = throughput / p_cont[..., None]

        # ---- transmission lobe (dielectric Fresnel + refraction) ----
        u_t, _ = rand2(dim + 4)
        do_transmit = shade_ok & (u_t < p_transmit)
        eta_rel = jnp.where(inside, ior, 1.0 / ior)[..., None]  # n_i/n_t
        d_refr, tir = _refract(d, n, eta_rel)
        # estimator: prob p_transmit, contribution trans*(1-F)*tint -> weight=tint
        tint = albedo
        new_inside = jnp.where(do_transmit & ~tir, ~inside, inside)
        sigma_new = -jnp.log(atten_c) / atten_d[..., None]
        sigma_t = jnp.where((do_transmit & new_inside & ~inside)[..., None],
                            sigma_new, sigma_t)
        inside = new_inside

        # ---- BRDF sampling: diffuse (cosine) or specular (GGX-VNDF) ----
        u_sel, us1 = rand2(dim + 2)
        ud1, ud2 = rand2(dim + 3)
        h_loc = smp.sample_ggx_vndf(v_loc, alpha, us1, ud2)
        l_spec_loc = hm.normalize(
            2.0 * jnp.sum(v_loc * h_loc, -1, keepdims=True) * h_loc - v_loc, xp=jnp)
        l_diff_loc = smp.cosine_sample_hemisphere(ud1, ud2)
        choose_spec = u_sel < p_spec
        l_loc = jnp.where(choose_spec[..., None], l_spec_loc, l_diff_loc)
        l_world = smp.to_world(n, l_loc)

        ndl = l_loc[..., 2]
        ndv = v_loc[..., 2]
        vdh = jnp.maximum(jnp.sum(v_loc * h_loc, -1), 0.0)
        F = shadeops.fresnel_schlick(vdh[..., None], f0)
        # VNDF estimator weight: F * G2/G1 ; cosine diffuse weight: diffuse color
        w_s = F * smp.smith_g2_over_g1(ndv, jnp.maximum(ndl, 1e-5), alpha)[..., None]
        w_d = diffuse_c
        weight = jnp.where(choose_spec[..., None],
                           w_s / jnp.maximum(p_spec, 1e-4)[..., None],
                           w_d / jnp.maximum(1 - p_spec, 1e-4)[..., None])
        # reflection lobes are selected with prob (1 - p_transmit)
        weight = weight / jnp.maximum(1.0 - p_transmit, 0.02)[..., None]
        ok = ndl > 1e-5
        # transmission / alpha pass-through override the reflection lobe
        ok = ok | do_transmit | alpha_fail
        active = active & ok
        weight = jnp.where(do_transmit[..., None], tint, weight)
        weight = jnp.where(alpha_fail[..., None], 1.0, weight)
        throughput = throughput * jnp.where(ok[..., None], weight, 0.0)
        throughput = jnp.minimum(throughput, 64.0)  # firefly clamp (ref clamps too)

        d_new = jnp.where(do_transmit[..., None], d_refr, l_world)
        d_new = jnp.where(alpha_fail[..., None], d, d_new)
        # alpha pass-through continues BEHIND the surface (offset along -gn)
        o = jnp.where(alpha_fail[..., None],
                      offset_ray_origin(pos, -gn, d_new),
                      offset_ray_origin(pos, gn, d_new))
        d = d_new
        # solid-angle pdf of the sampled bounce direction, consumed by the MIS
        # hit-emission weight next bounce; 0 marks NEE-unreachable transports
        l_loc_b = smp.to_local(n, d_new)
        pdf_bounce = (1.0 - p_transmit) * smp.brdf_mix_pdf(v_loc, l_loc_b,
                                                           alpha, p_spec)
        prev_pdf = jnp.where(do_transmit | alpha_fail | ~shade_ok,
                             0.0, pdf_bounce)
        return (o, d, radiance, throughput, active, inside, sigma_t,
                prev_pdf, pix, frame), None

    RS = R * spp
    frame_l = jnp.broadcast_to(frame, (RS,)).astype(jnp.uint32)
    carry = (o, d, jnp.zeros((RS, 3)), jnp.ones((RS, 3)),
             jnp.ones((RS,), bool), jnp.zeros((RS,), bool),
             jnp.zeros((RS, 3)), jnp.zeros((RS,)), pix, frame_l)

    # ---- per-bounce wavefront compaction (TPU-only lever; no reference
    # analogue needed — GPU SIMT retires dead threads for free, the TPU
    # lockstep wavefront pays full width for every masked lane). Bounces
    # 0..C-1 run full-width under ONE scanned body; from bounce C on, live
    # paths compact into a shrinking static-capacity wavefront: ~90% hit
    # rate and Russian roulette (active after b: ~0.9^b * 0.6^(b-2)) leave
    # the full-width tail mostly dead lanes. When live paths exceed a
    # capacity, an extra Russian-roulette pass (p = 0.8*cap/n_live,
    # throughput/p — unbiased) thins them first; residual overflow lanes are
    # dropped (probability ~exp(-cap/50) — negligible at these sizes).
    use_compact = RS >= COMPACT_MIN_LANES and max_bounces > COMPACT_START

    if not use_compact:
        carry, _ = jax.lax.scan(bounce_body, carry,
                                jnp.arange(max_bounces, dtype=jnp.int32))
        rad = carry[2]
        rad = rad.reshape(spp, R, 3).mean(0) if spp > 1 else rad
        return (rad, jnp.int32(0)) if with_stats else rad

    carry, _ = jax.lax.scan(bounce_body, carry,
                            jnp.arange(COMPACT_START, dtype=jnp.int32))
    (o, d, rad_full, throughput, active, inside, sigma_t, prev_pdf,
     pix_l, frame_l) = carry
    # per-PIXEL radiance accumulator (sum over that pixel's spp lanes)
    rad_pix = (rad_full.reshape(spp, R, 3).sum(0) if spp > 1 else rad_full)

    # capacity-RR overflow observability: still-live lanes past CAP are
    # dropped (the ~exp(-cap/50) tail documented above) — count them so a
    # scene that saturates the 0.8*cap headroom is visible in stats, like
    # the ReSTIR overflow counter.
    n_dropped = jnp.int32(0)
    for b in range(COMPACT_START, max_bounces):
        fi = min(b - COMPACT_START, len(CAP_FRACS) - 1)
        cap = min(max((int(RS * CAP_FRACS[fi]) // 1024) * 1024,
                      COMPACT_MIN_CAP),
                  int(active.shape[0]))
        cur = int(active.shape[0])
        if cap < cur:
            dim_c = 1 + (b - 1) * 8 + 7          # unused slot of bounce b-1
            cbits = pcg3d(jnp.stack([pix_l, frame_l,
                                     jnp.full_like(pix_l, dim_c)], -1))
            u_c = uniform_from_bits(cbits[..., 0])
            n_act = jnp.sum(active.astype(jnp.int32))
            p_keep = jnp.minimum(1.0, 0.8 * cap
                                 / jnp.maximum(n_act.astype(jnp.float32),
                                               1.0))
            keep = active & (u_c < p_keep)
            n_dropped = n_dropped + jnp.maximum(
                jnp.sum(keep.astype(jnp.int32)) - cap, 0)
            throughput = throughput / p_keep
            rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
            slot = jnp.where(keep & (rank < cap), rank, cap)
            sel = jnp.full((cap + 1,), cur, jnp.int32) \
                .at[slot].set(jnp.arange(cur, dtype=jnp.int32),
                              mode="drop")[:cap]
            pad = sel >= cur
            selc = jnp.minimum(sel, cur - 1)
            # ONE packed row gather (TPU gathers are row-rate bound: 17
            # separate scalar-array gathers would cost 17x this)
            packed = jnp.concatenate(
                [o, d, throughput, sigma_t, prev_pdf[:, None],
                 inside.astype(jnp.float32)[:, None],
                 pix_l.astype(jnp.float32)[:, None],     # exact < 2^24
                 frame_l.astype(jnp.float32)[:, None]], -1)
            pk = jnp.where(pad[:, None], 0.0, packed[selc])
            o, d = pk[:, 0:3], pk[:, 3:6]
            throughput, sigma_t = pk[:, 6:9], pk[:, 9:12]
            prev_pdf = pk[:, 12]
            inside = pk[:, 13] > 0.5
            pix_l = pk[:, 14].astype(jnp.uint32)
            frame_l = pk[:, 15].astype(jnp.uint32)
            active = keep[selc] & ~pad
        rad_local = jnp.zeros((int(active.shape[0]), 3), jnp.float32)
        (o, d, rad_local, throughput, active, inside, sigma_t, prev_pdf,
         pix_l, frame_l), _ = bounce_body(
            (o, d, rad_local, throughput, active, inside, sigma_t,
             prev_pdf, pix_l, frame_l), jnp.int32(b))
        rad_pix = rad_pix.at[pix_l].add(rad_local, mode="drop")

    rad_pix = rad_pix / spp if spp > 1 else rad_pix
    return (rad_pix, n_dropped) if with_stats else rad_pix


class PathTracerRenderer:
    """Progressive accumulation driver (ref src/PathTracerRenderer.cpp)."""

    def __init__(self, gpu, width: int, height: int, config=None, scene=None,
                 rt: Optional[SceneRT] = None, env_as_lights: bool = False):
        self.width, self.height = width, height
        self.config = config
        self.rt = rt
        self.env_as_lights = env_as_lights
        self.accum = jnp.zeros((height, width, 3), jnp.float32)
        self.num_accum = 0
        self.exposure = jnp.float32(1.0)
        self._prev_view = None
        self._jitted = None
        self.max_bounces = int(getattr(getattr(config, "settings", None),
                                       "max_bounces", 8) or 8)
        self.rr_start = int(getattr(getattr(config, "settings", None),
                                    "rr_start_bounce", 2) or 2)
        # samples per rendered frame, batched into ONE wavefront (wider
        # lockstep wavefronts amortize dispatch overheads; --pt-spp)
        self.spp = max(int(getattr(config, "pt_spp", 1) or 1), 1)
        if scene is not None and rt is None:
            self.rt = build_scene_rt(scene, gpu)

    def ensure_rt(self, scene, gpu):
        if self.rt is None:
            self.rt = build_scene_rt(scene, gpu)

    def _step(self, gpu, rt, vc, settings, accum, n_accum, exposure, dt):
        # n_accum counts SAMPLES; the RNG frame index is the spp-frame ordinal
        sample, dropped = trace_paths(
            gpu, rt, vc, settings, self.height, self.width,
            n_accum // self.spp, self.max_bounces,
            self.rr_start, env_as_lights=self.env_as_lights,
            spp=self.spp, with_stats=True)
        sample = sample.reshape(self.height, self.width, 3)
        w = self.spp / (n_accum.astype(jnp.float32) + self.spp)
        accum = accum * (1.0 - w) + sample * w
        hist = postops.luminance_histogram(accum)
        exposure = postops.exposure_adapt(hist, exposure, dt, settings)
        ldr = postops.tonemap_to_output(accum, exposure)
        return ldr, accum, exposure, dropped

    def render(self, gpu, vc, settings, dt: float = 1 / 60):
        assert self.rt is not None, "call ensure_rt(scene, gpu) first"
        # camera-move reset (ref view-matrix memcmp, PathTracerRenderer.cpp:41-50)
        vm = np.asarray(vc["view_proj_no_jitter"])
        if self._prev_view is None or not np.array_equal(vm, self._prev_view):
            self.num_accum = 0
            self.accum = jnp.zeros_like(self.accum)
            self._prev_view = vm
        if self._jitted is None:
            self._jitted = jax.jit(self._step, donate_argnums=(4,))
        ldr, self.accum, self.exposure, dropped = self._jitted(
            gpu, self.rt, vc, settings, self.accum,
            jnp.int32(self.num_accum), self.exposure, jnp.float32(dt))
        # capacity-RR overflow dashboard row (cf. ReSTIR's overflow counter)
        self.last_stats = {"pt_dropped_lanes": dropped}
        self.num_accum += self.spp
        return ldr, jnp.int32(0)
