"""SceneGPU: the device-resident scene as one pytree of HBM arrays.

Reference: SceneLoader::CreateAndUploadGpuBuffers (src/SceneLoader.cpp:2319-2433) +
Scene GPU buffer handles (src/Scene.h:284-313): global vertex/index/meshlet/instance/
material/light buffers addressed by offsets — the "bindless buffer" model.

TPU-first design decisions:
- Everything is a flat jnp array in one pytree; kernels receive the pytree (the
  "binding set"). No descriptor machinery — XLA sees every buffer.
- Static shapes everywhere: counts are fixed at scene load; per-frame variability is
  expressed with masks + prefix-sum compaction (SURVEY.md §7 "no indirect dispatch").
- The draw work-list is PRE-EXPANDED: a static (instance, meshlet, lod) pair table
  covering every LOD of every instance. Per-frame LOD selection + culling become a
  pure mask over this table (replaces the reference's GPU-written indirect args,
  src/BasePassRenderer.cpp:440-467).
- Indices in the global triangle/meshlet tables are GLOBAL vertex ids (vertex_offset
  folded in at build), so kernels never chase per-primitive offsets.
"""

from __future__ import annotations

from dataclasses import dataclass, replace as dataclasses_replace
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.scene.cooker import MAX_LODS
from hobbyrenderer_tpu.scene.scene import Scene
from hobbyrenderer_tpu.utils import math as hm


@jax.tree_util.register_pytree_node_class
@dataclass
class SceneGPU:
    """All device scene data. Registered as a pytree so it can cross jit boundaries."""

    # vertices (global pool)
    positions: Any          # (V, 3) f32
    vnormals: Any           # (V,) u32 packed oct normal + bitangent sign
    vuvs: Any               # (V,) u32 packed half2
    vtangents: Any          # (V,) u32 packed oct tangent

    # triangles: global concatenation over (prim, lod), GLOBAL vertex ids
    tri_indices: Any        # (T, 3) i32

    # meshlets (global concatenation over (prim, lod))
    ml_vertices: Any        # (MV,) i32 global vertex ids
    ml_tris: Any            # (MT, 3) i32 meshlet-local indices
    ml_vert_offset: Any     # (M,) i32 into ml_vertices
    ml_vert_count: Any      # (M,) i32
    ml_tri_offset: Any      # (M,) i32 into ml_tris (triangle units)
    ml_tri_count: Any       # (M,) i32
    ml_center: Any          # (M, 3) f32 object space
    ml_radius: Any          # (M,) f32
    ml_cone_axis: Any       # (M, 3) f32
    ml_cone_cutoff: Any     # (M,) f32

    # meshlet-major baked vertex/triangle data (TPU layout optimization: the
    # raster path fetches whole meshlets, so duplicate vertices into contiguous
    # per-meshlet rows -> ROW gathers instead of scattered element gathers)
    ml_pos: Any             # (M, 64, 3) f32 object-space positions (dup'd)
    ml_attr: Any            # (M, 64, 3) u32 packed normal/uv/tangent (dup'd)
    ml_gv: Any              # (M, 64) i32 global vertex id (for resolve)
    ml_ltris: Any           # (M, 96, 3) i32 meshlet-local indices (padded w/ 0)

    # per-primitive LOD tables
    prim_lod_count: Any     # (P,) i32
    prim_lod_error: Any     # (P, MAX_LODS) f32
    prim_tri_offset: Any    # (P, MAX_LODS) i32 into tri_indices
    prim_tri_count: Any     # (P, MAX_LODS) i32
    prim_center: Any        # (P, 3) f32 object-space bounding sphere
    prim_radius: Any        # (P,) f32

    # instances
    inst_transform: Any     # (N, 4, 4) f32 object->world
    inst_prev_transform: Any  # (N, 4, 4) f32 previous frame
    inst_normal_mat: Any    # (N, 3, 3) f32 inverse-transpose rotation/scale
    inst_prim: Any          # (N,) i32
    inst_material: Any      # (N,) i32
    inst_alpha_mode: Any    # (N,) i32
    inst_center: Any        # (N, 3) f32 world bounding sphere
    inst_radius: Any        # (N,) f32
    inst_scale_max: Any     # (N,) f32 max axis scale (LOD error projection)

    # static draw-pair worklist: every (instance, meshlet) at every LOD
    pair_inst: Any          # (D,) i32
    pair_meshlet: Any       # (D,) i32 global meshlet id
    pair_lod: Any           # (D,) i32

    # materials (SoA: floats + ints)
    mat_f: Any              # (Mat, 20) f32: base_color(4), metallic, roughness,
    #                         emissive(3)*strength, alpha_cutoff, transmission, ior,
    #                         attenuation_color(3), uv_scale, atten_distance, pad
    #                         (packed per MAT_* layout below)
    mat_i: Any              # (Mat, 8) i32: alpha_mode, double_sided, tex ids (4), pad

    # texture layer: packed per-material mip-chained texel table
    # (scene/textures.py; ref bindless tables src/Renderer.cpp:1460-1579)
    tex_table: Any          # (T, 4) u32 packed texels (1 row gather per sample)
    mat_tex_size: Any       # (Mat,) i32 top-mip resolution (1 = untextured)
    mat_mip_off: Any        # (Mat, MAX_MIPS) i32 absolute row offset per level

    # lights
    light_type: Any         # (L,) i32
    light_pos: Any          # (L, 3) f32
    light_dir: Any          # (L, 3) f32
    light_color: Any        # (L, 3) f32 color * intensity
    light_radius: Any       # (L,) f32
    light_range: Any        # (L,) f32
    light_cone: Any         # (L, 2) f32 cos(inner), cos(outer)
    light_count: Any        # () i32 actual number of lights

    # texture streaming (scene/streaming.py StreamTables; None = dense table)
    tex_stream: Any = None

    # environment map (ops/envmap.py; ref EnvironmentLight/IBL cubemaps)
    env_map: Any = None     # (He, We, 3) f32 linear equirect radiance
    env_sh: Any = None      # (9, 3) f32 SH projection (diffuse IBL term)
    brdf_lut: Any = None    # (N, N, 2) f32 split-sum env BRDF LUT
    #                         (ref CommonResources BRDF LUT; --brdflut.
    #                         None -> the validated analytic fit in ops/ibl)

    def tree_flatten(self):
        import dataclasses as dc
        fields = [f.name for f in dc.fields(self)]
        return tuple(getattr(self, f) for f in fields), tuple(fields)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(aux, children)))

    @property
    def num_instances(self) -> int:
        return int(self.inst_prim.shape[0])

    @property
    def num_pairs(self) -> int:
        return int(self.pair_inst.shape[0])

    @property
    def lod0_pair_capacity(self) -> int:
        """Upper bound on simultaneously-visible pairs: each instance draws exactly
        one LOD, and LOD0 has the most meshlets."""
        return int(np.sum(np.asarray(self.pair_lod) == 0))

    def bucket_pair_capacity(self, modes) -> int:
        """lod0_pair_capacity restricted to instances whose alpha mode is in
        ``modes`` — the raster capacity for a per-bucket pass (masked or
        transparent buckets are usually tiny; sizing their raster calls by the
        global capacity wasted ~6x setup bandwidth on the stress scene)."""
        lod0 = np.asarray(self.pair_lod) == 0
        am = np.asarray(self.inst_alpha_mode)[np.asarray(self.pair_inst)]
        sel = np.zeros_like(lod0)
        for m in modes:
            sel |= am == m
        return int(np.sum(lod0 & sel))

    def shadow_pair_capacity(self, biases) -> int:
        """Static bound on (cascade, pair) shadow-raster slots: per cascade c,
        every shadow-casting instance contributes at most its meshlet count at
        LOD min(biases[c], lod_count-1) (the finest LOD the cascade can pick
        under its shadow LOD bias; counts shrink with coarser LODs)."""
        pl = np.asarray(self.pair_lod)
        pi = np.asarray(self.pair_inst)
        n = self.num_instances
        counts = np.zeros((n, int(pl.max()) + 1), np.int64)
        np.add.at(counts, (pi, pl), 1)
        lc = np.asarray(self.prim_lod_count)[np.asarray(self.inst_prim)]
        casts = np.asarray(self.inst_alpha_mode) < 2
        total = 0
        for b in biases:
            lod = np.minimum(b, lc - 1)
            total += int(np.sum(counts[np.arange(n), lod] * casts))
        return max(total, 1)


# Material float-layout offsets
MAT_BASE_COLOR = 0      # 4
MAT_METALLIC = 4
MAT_ROUGHNESS = 5
MAT_EMISSIVE = 6        # 3
MAT_ALPHA_CUTOFF = 9
MAT_TRANSMISSION = 10
MAT_IOR = 11
MAT_ATTEN_COLOR = 12    # 3
MAT_UV_SCALE = 15
MAT_ATTEN_DIST = 16
# texture-table params carried as floats so the resolve's existing one-hot
# material matmul delivers them per pixel with no extra gathers. Table row
# offsets can exceed f32's exact-integer range, so base is split hi*4096+lo.
MAT_TEX_SIZE = 17       # top-mip resolution S (power of two; 1 = untextured)
MAT_TEX_BASE_HI = 18    # table base offset // 4096
MAT_TEX_BASE_LO = 19    # table base offset % 4096
# int layout
MATI_ALPHA_MODE = 0
MATI_DOUBLE_SIDED = 1
MATI_BASE_TEX = 2
MATI_NORMAL_TEX = 3
MATI_ORM_TEX = 4
MATI_EMISSIVE_TEX = 5


def _texture_arrays(scene: Scene) -> Dict[str, np.ndarray]:
    from hobbyrenderer_tpu.scene.textures import build_texture_table
    t = build_texture_table(scene)
    return dict(tex_table=t["tex_table"], mat_tex_size=t["mat_tex_size"],
                mat_mip_off=t["mat_mip_off"])


def build_scene_gpu(scene: Scene, max_lights: int = 64, device_put: bool = True,
                    streamer=None, env_map=None, env_sh=None,
                    brdf_lut=None) -> SceneGPU:
    """Flatten the host Scene into the SceneGPU pytree (upload happens via jnp).

    streamer: a scene.streaming.TextureStreamer — texture pixels then live in
    its budgeted paged pool instead of the fully-resident dense table.
    env_sh: optional PREBAKED (9, 3) irradiance SH (ref --irradiance cubemap;
    overrides the env_map projection). brdf_lut: optional (N, N, 2) split-sum
    LUT (ref --brdflut; None keeps the analytic fit)."""
    # --- vertex pool ---
    vtx_offsets = []
    pos_l, nrm_l, uv_l, tan_l = [], [], [], []
    off = 0
    for mesh in scene.meshes:
        vtx_offsets.append(off)
        pos_l.append(mesh.positions)
        nrm_l.append(mesh.normals_packed)
        uv_l.append(mesh.uvs_packed)
        tan_l.append(mesh.tangents_packed)
        off += mesh.num_vertices
    positions = np.concatenate(pos_l, 0) if pos_l else np.zeros((1, 3), np.float32)
    vnormals = np.concatenate(nrm_l, 0) if nrm_l else np.zeros(1, np.uint32)
    vuvs = np.concatenate(uv_l, 0) if uv_l else np.zeros(1, np.uint32)
    vtangents = np.concatenate(tan_l, 0) if tan_l else np.zeros(1, np.uint32)

    # --- triangles + meshlets, concatenated over (prim, lod) ---
    P = len(scene.meshes)
    prim_lod_count = np.zeros(P, np.int32)
    prim_lod_error = np.zeros((P, MAX_LODS), np.float32)
    prim_tri_offset = np.zeros((P, MAX_LODS), np.int32)
    prim_tri_count = np.zeros((P, MAX_LODS), np.int32)
    prim_ml_offset = np.zeros((P, MAX_LODS), np.int32)
    prim_ml_count = np.zeros((P, MAX_LODS), np.int32)
    prim_center = np.zeros((P, 3), np.float32)
    prim_radius = np.zeros(P, np.float32)

    tri_l, mlv_l, mlt_l = [], [], []
    mvo_l, mvc_l, mto_l, mtc_l, mc_l, mr_l, mca_l, mcc_l = [], [], [], [], [], [], [], []
    tri_off = 0
    mlv_off = 0
    mlt_off = 0
    ml_off = 0
    for p, mesh in enumerate(scene.meshes):
        vo = vtx_offsets[p]
        prim_center[p] = mesh.center
        prim_radius[p] = mesh.radius
        prim_lod_count[p] = len(mesh.lods)
        for li, lod in enumerate(mesh.lods):
            prim_lod_error[p, li] = lod.error
            prim_tri_offset[p, li] = tri_off
            prim_tri_count[p, li] = lod.indices.shape[0]
            tri_l.append(lod.indices.astype(np.int32) + vo)
            tri_off += lod.indices.shape[0]
            ms = lod.meshlets
            prim_ml_offset[p, li] = ml_off
            prim_ml_count[p, li] = ms.count
            mvo_l.append(ms.vert_offset + mlv_off)
            mvc_l.append(ms.vert_count)
            mto_l.append(ms.tri_offset + mlt_off)
            mtc_l.append(ms.tri_count)
            mc_l.append(ms.center)
            mr_l.append(ms.radius)
            mca_l.append(ms.cone_axis)
            mcc_l.append(ms.cone_cutoff)
            mlv_l.append(ms.vertices + vo)
            mlt_l.append(ms.tris)
            mlv_off += ms.vertices.shape[0]
            mlt_off += ms.tris.shape[0]
            ml_off += ms.count
        # fill unused lod slots with the last lod (never selected, harmless)
        for li in range(len(mesh.lods), MAX_LODS):
            prim_lod_error[p, li] = np.inf
            prim_tri_offset[p, li] = prim_tri_offset[p, len(mesh.lods) - 1]
            prim_tri_count[p, li] = prim_tri_count[p, len(mesh.lods) - 1]
            prim_ml_offset[p, li] = prim_ml_offset[p, len(mesh.lods) - 1]
            prim_ml_count[p, li] = prim_ml_count[p, len(mesh.lods) - 1]

    def cat(lst, dtype, cols=None):
        if not lst:
            return np.zeros((1,) if cols is None else (1, cols), dtype)
        out = np.concatenate(lst, 0).astype(dtype)
        return out

    tri_indices = cat(tri_l, np.int32, 3)
    ml_vertices = cat(mlv_l, np.int32)
    # meshlet-major baked arrays
    _mvo = cat(mvo_l, np.int32)
    _mvc = cat(mvc_l, np.int32)
    _mto = cat(mto_l, np.int32)
    _mtc = cat(mtc_l, np.int32)
    _mlv = ml_vertices
    _mlt = cat(mlt_l, np.int32, 3)
    M_total = _mvo.shape[0]
    from hobbyrenderer_tpu.scene.cooker import MESHLET_MAX_TRIS as _MT
    from hobbyrenderer_tpu.scene.cooker import MESHLET_MAX_VERTS as _MV
    vlanes = np.arange(_MV)[None, :]
    vmask = vlanes < _mvc[:, None]
    vidx = np.minimum(_mvo[:, None] + vlanes, max(_mlv.shape[0] - 1, 0))
    ml_gv = np.where(vmask, _mlv[vidx], 0).astype(np.int32)
    ml_pos = (positions[ml_gv] * vmask[..., None]).astype(np.float32)
    ml_attr = np.stack([vnormals[ml_gv], vuvs[ml_gv], vtangents[ml_gv]],
                       axis=-1).astype(np.uint32)
    tlanes = np.arange(_MT)[None, :]
    tmask = tlanes < _mtc[:, None]
    tidx = np.minimum(_mto[:, None] + tlanes, max(_mlt.shape[0] - 1, 0))
    ml_ltris = np.where(tmask[..., None], _mlt[tidx], 0).astype(np.int32)
    ml_tris = _mlt
    ml_vert_offset = _mvo
    ml_vert_count = _mvc
    ml_tri_offset = _mto
    ml_tri_count = _mtc
    ml_center = cat(mc_l, np.float32, 3)
    ml_radius = cat(mr_l, np.float32)
    ml_cone_axis = cat(mca_l, np.float32, 3)
    ml_cone_cutoff = cat(mcc_l, np.float32)

    # --- instances ---
    N = max(len(scene.instances), 1)
    inst_transform = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    inst_normal = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
    inst_prim = np.zeros(N, np.int32)
    inst_material = np.zeros(N, np.int32)
    inst_alpha = np.zeros(N, np.int32)
    inst_center = np.zeros((N, 3), np.float32)
    inst_radius = np.zeros(N, np.float32)
    inst_scale_max = np.ones(N, np.float32)
    for i, I in enumerate(scene.instances):
        w = scene.nodes[I.node].world
        inst_transform[i] = w
        inst_normal[i] = np.linalg.inv(w[:3, :3]).T
        inst_prim[i] = I.prim
        inst_material[i] = I.material
        inst_alpha[i] = I.alpha_mode
        mesh = scene.meshes[I.prim]
        inst_center[i] = hm.transform_points(w, mesh.center[None])[0]
        s = float(np.max(np.linalg.norm(w[:3, :3], axis=0)))
        inst_radius[i] = mesh.radius * s
        inst_scale_max[i] = s

    # --- static draw-pair list over every (instance, lod, meshlet) ---
    pi_l, pm_l, pl_l = [], [], []
    for i, I in enumerate(scene.instances):
        p = I.prim
        for li in range(int(prim_lod_count[p])):
            o, c = int(prim_ml_offset[p, li]), int(prim_ml_count[p, li])
            if c == 0:
                continue
            pm_l.append(np.arange(o, o + c, dtype=np.int32))
            pi_l.append(np.full(c, i, np.int32))
            pl_l.append(np.full(c, li, np.int32))
    pair_inst = cat(pi_l, np.int32)
    pair_meshlet = cat(pm_l, np.int32)
    # empty scenes: cat() pads one zero row, which would draw (instance 0,
    # meshlet 0, lod 0) as phantom geometry — lod -1 never matches a selected
    # lod, so culling rejects the padding pair
    pair_lod = cat(pl_l, np.int32) if pl_l else np.full((1,), -1, np.int32)

    # --- materials ---
    if streamer is not None:
        # streaming: no dense table; sizes come from the streamer's layout
        tex_arrays = dict(
            tex_table=np.zeros((1, 4), np.uint32),
            mat_tex_size=streamer.mat_size.copy(),
            mat_mip_off=np.zeros((len(scene.materials) or 1,
                                  streamer.tail_off.shape[1]), np.int32))
    else:
        tex_arrays = _texture_arrays(scene)
    Mt = max(len(scene.materials), 1)
    mat_f = np.zeros((Mt, 20), np.float32)
    mat_i = np.full((Mt, 8), -1, np.int32)
    for mi, m in enumerate(scene.materials):
        mat_f[mi, MAT_BASE_COLOR:MAT_BASE_COLOR + 4] = m.base_color
        mat_f[mi, MAT_METALLIC] = m.metallic
        mat_f[mi, MAT_ROUGHNESS] = m.roughness
        mat_f[mi, MAT_EMISSIVE:MAT_EMISSIVE + 3] = np.asarray(m.emissive) * m.emissive_strength
        # cutoff participates in the resolve's alpha-margin (alpha - cutoff);
        # only MASK-mode materials alpha-test, so others store 0
        from hobbyrenderer_tpu.scene.scene import ALPHA_MASKED as _AM
        mat_f[mi, MAT_ALPHA_CUTOFF] = m.alpha_cutoff if m.alpha_mode == _AM else 0.0
        mat_f[mi, MAT_TRANSMISSION] = m.transmission
        mat_f[mi, MAT_IOR] = m.ior
        mat_f[mi, MAT_ATTEN_COLOR:MAT_ATTEN_COLOR + 3] = m.attenuation_color
        mat_f[mi, MAT_UV_SCALE] = m.uv_scale
        mat_f[mi, MAT_ATTEN_DIST] = min(m.attenuation_distance, 1e6)
        mat_f[mi, MAT_TEX_SIZE] = tex_arrays["mat_tex_size"][mi]
        base = int(tex_arrays["mat_mip_off"][mi, 0])
        mat_f[mi, MAT_TEX_BASE_HI] = base // 4096
        mat_f[mi, MAT_TEX_BASE_LO] = base % 4096
        mat_i[mi, MATI_ALPHA_MODE] = m.alpha_mode
        mat_i[mi, MATI_DOUBLE_SIDED] = 1 if m.double_sided else 0
        mat_i[mi, MATI_BASE_TEX] = m.base_color_tex
        mat_i[mi, MATI_NORMAL_TEX] = m.normal_tex
        mat_i[mi, MATI_ORM_TEX] = m.orm_tex
        mat_i[mi, MATI_EMISSIVE_TEX] = m.emissive_tex

    # --- lights (padded to max_lights; ref CreateAndUploadLightBuffer) ---
    L = max_lights
    lt = np.zeros(L, np.int32)
    lp = np.zeros((L, 3), np.float32)
    ld = np.tile(np.array([[0, -1, 0]], np.float32), (L, 1))
    lc = np.zeros((L, 3), np.float32)
    lr = np.zeros(L, np.float32)
    lrange = np.full(L, 1e9, np.float32)
    lcone = np.zeros((L, 2), np.float32)
    nl = min(len(scene.lights), L)
    for i in range(nl):
        light = scene.lights[i]
        lt[i] = light.type
        lp[i] = light.position
        ld[i] = np.asarray(hm.normalize(np.asarray(light.direction, np.float32)), np.float32)
        lc[i] = np.asarray(light.color, np.float32) * light.intensity
        lr[i] = light.radius
        lrange[i] = light.range
        lcone[i] = [np.cos(light.inner_cone), np.cos(light.outer_cone)]

    arrays = dict(
        positions=positions, vnormals=vnormals, vuvs=vuvs, vtangents=vtangents,
        tri_indices=tri_indices,
        ml_vertices=ml_vertices, ml_tris=ml_tris,
        ml_vert_offset=ml_vert_offset, ml_vert_count=ml_vert_count,
        ml_tri_offset=ml_tri_offset, ml_tri_count=ml_tri_count,
        ml_center=ml_center, ml_radius=ml_radius,
        ml_cone_axis=ml_cone_axis, ml_cone_cutoff=ml_cone_cutoff,
        ml_pos=ml_pos, ml_attr=ml_attr, ml_gv=ml_gv, ml_ltris=ml_ltris,
        prim_lod_count=prim_lod_count, prim_lod_error=prim_lod_error,
        prim_tri_offset=prim_tri_offset, prim_tri_count=prim_tri_count,
        prim_center=prim_center, prim_radius=prim_radius,
        inst_transform=inst_transform, inst_prev_transform=inst_transform.copy(),
        inst_normal_mat=inst_normal,
        inst_prim=inst_prim, inst_material=inst_material, inst_alpha_mode=inst_alpha,
        inst_center=inst_center, inst_radius=inst_radius, inst_scale_max=inst_scale_max,
        pair_inst=pair_inst, pair_meshlet=pair_meshlet, pair_lod=pair_lod,
        mat_f=mat_f, mat_i=mat_i,
        **tex_arrays,
        light_type=lt, light_pos=lp, light_dir=ld, light_color=lc,
        light_radius=lr, light_range=lrange, light_cone=lcone,
        light_count=np.int32(nl),
    )
    # store LOD meshlet ranges on the pair list side only; prim_ml_* not needed on device
    if device_put:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    gpu = SceneGPU(**arrays)
    if env_map is not None:
        from hobbyrenderer_tpu.ops.envmap import project_sh9
        gpu = dataclasses_replace(
            gpu, env_map=jnp.asarray(env_map, jnp.float32),
            env_sh=jnp.asarray(project_sh9(np.asarray(env_map, np.float32))))
    if env_sh is not None:
        gpu = dataclasses_replace(gpu, env_sh=jnp.asarray(env_sh, jnp.float32))
    if brdf_lut is not None:
        gpu = dataclasses_replace(gpu,
                                  brdf_lut=jnp.asarray(brdf_lut, jnp.float32))
    if streamer is not None:
        gpu = dataclasses_replace(gpu, tex_stream=streamer.initial_tables())
    return gpu


def update_instance_transforms(gpu: SceneGPU, scene: Scene) -> SceneGPU:
    """Upload dirty instance transforms (ref UploadDirtyInstanceTransforms,
    src/Renderer.cpp:915-972). Rebuilds the transform arrays host-side for dirty
    ranges; cheap for small dirty sets.

    prev-transform discipline matches the reference (prev = current is copied
    EVERY frame): an instance that moves once and then goes static must produce
    zero motion vectors from the next frame on, or TAA/denoiser/ReSTIR
    reprojection stays permanently corrupted."""
    import dataclasses as dc
    prev = gpu.inst_transform  # aliased under jit; cheap
    if not scene.dirty_instances:
        if gpu.inst_prev_transform is gpu.inst_transform:
            return gpu
        return dc.replace(gpu, inst_prev_transform=prev)
    idx = np.asarray(sorted(scene.dirty_instances), np.int32)
    tr = np.stack([scene.nodes[scene.instances[i].node].world for i in idx])
    nm = np.stack([np.linalg.inv(t[:3, :3]).T for t in tr])
    centers, radii, scale_max = [], [], []
    for i in idx:
        I = scene.instances[i]
        mesh = scene.meshes[I.prim]
        w = scene.nodes[I.node].world
        centers.append(hm.transform_points(w, mesh.center[None])[0])
        smax = float(np.max(np.linalg.norm(w[:3, :3], axis=0)))
        radii.append(mesh.radius * smax)
        scale_max.append(smax)  # feeds meshlet cull radius + projected LOD error
    gpu = dc.replace(
        gpu,
        inst_prev_transform=prev,
        inst_transform=gpu.inst_transform.at[idx].set(jnp.asarray(tr.astype(np.float32))),
        inst_normal_mat=gpu.inst_normal_mat.at[idx].set(jnp.asarray(nm.astype(np.float32))),
        inst_center=gpu.inst_center.at[idx].set(jnp.asarray(np.stack(centers).astype(np.float32))),
        inst_radius=gpu.inst_radius.at[idx].set(jnp.asarray(np.asarray(radii, np.float32))),
        inst_scale_max=gpu.inst_scale_max.at[idx].set(jnp.asarray(np.asarray(scale_max, np.float32))),
    )
    scene.dirty_instances.clear()
    return gpu


def update_material_constants(gpu: SceneGPU, scene: Scene) -> SceneGPU:
    """Re-upload dirty material rows (ref UploadDirtyMaterialConstants,
    src/Renderer.cpp:974-1024). Animated field today: emissive * strength
    (the reference's emissiveIntensity JSON animation channel)."""
    import dataclasses as dc
    if not scene.dirty_materials:
        return gpu
    idx = np.asarray(sorted(i for i in scene.dirty_materials
                            if i < gpu.mat_f.shape[0]), np.int32)
    if idx.size == 0:
        scene.dirty_materials.clear()
        return gpu
    em = np.stack([np.asarray(scene.materials[i].emissive, np.float32)
                   * np.float32(scene.materials[i].emissive_strength)
                   for i in idx])
    rows = gpu.mat_f[idx]
    rows = rows.at[:, MAT_EMISSIVE:MAT_EMISSIVE + 3].set(jnp.asarray(em))
    gpu = dc.replace(gpu, mat_f=gpu.mat_f.at[idx].set(rows))
    scene.dirty_materials.clear()
    return gpu
