"""Mesh cooking: quantization, LOD chain, meshlet build.

Reference: SceneLoader::ProcessMeshes (src/SceneLoader.cpp:1740-2206) — per-primitive:
degenerate-triangle filter, tangent generation, vertex remap/optimize, quantization
(f32x3 pos + oct normal w/ bitangent sign + half2 uv + oct tangent,
src/SceneLoader.cpp:1946-1974), LOD chain up to 8 levels (0.6x index target per level,
error bound 0.1, stop when <1024 indices or <15% reduction, accumulated error x1.5,
src/SceneLoader.cpp:1995-2044), then meshlet build per LOD (64 verts / 96 tris,
cone weight 0.25, src/SceneLoader.cpp:2055-2108) via meshoptimizer.

TPU build: the cooker is HOST code — fully vectorized numpy (with an optional C++
fast path in hobbyrenderer_tpu/native for the greedy meshlet scan). Instead of
meshoptimizer's quadric simplifier, v1 uses vectorized grid vertex-clustering
simplification (quality-for-speed tradeoff; the per-level cell size doubles, and the
reported LOD error is the cell diagonal — consumed by the same projected-error LOD
selection as the reference, GPUCulling.hlsl:78-100).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from hobbyrenderer_tpu.utils import math as hm

MESHLET_MAX_VERTS = 64   # ref src/shaders/Common.sr:53-55
MESHLET_MAX_TRIS = 96
MAX_LODS = 8             # ref src/SceneLoader.cpp:1995
LOD_INDEX_TARGET = 0.6   # per-level index count target factor
LOD_MIN_INDICES = 1024   # stop threshold
LOD_MIN_REDUCTION = 0.85  # stop if simplified > 85% of previous
LOD_ERROR_SCALE = 1.5    # accumulated error multiplier per level
LOD_ERROR_BOUND = 0.1    # max collapse error as a fraction of mesh extent


@dataclass
class MeshletSet:
    """Flat meshlet arrays for one LOD of one primitive."""

    vert_offset: np.ndarray   # (M,) i32 offset into vertices
    vert_count: np.ndarray    # (M,) i32
    tri_offset: np.ndarray    # (M,) i32 offset into tris (triangle units)
    tri_count: np.ndarray     # (M,) i32
    vertices: np.ndarray      # (MV,) i32 LOCAL vertex indices (into the primitive)
    tris: np.ndarray          # (MT, 3) i32 meshlet-local indices (0..63)
    center: np.ndarray        # (M, 3) f32 bounding sphere center
    radius: np.ndarray        # (M,) f32
    cone_axis: np.ndarray     # (M, 3) f32 backface cone axis
    cone_cutoff: np.ndarray   # (M,) f32 cone cutoff (cos angle); 1 = never cull

    @property
    def count(self) -> int:
        return int(self.vert_offset.shape[0])


@dataclass
class CookedLOD:
    indices: np.ndarray       # (I, 3) i32 local triangle indices
    meshlets: MeshletSet
    error: float              # accumulated object-space error (LOD select metric)


@dataclass
class CookedMesh:
    """One cooked primitive: quantized vertices + LOD chain + meshlets.

    Mirrors the reference cooked-cache payload (src/SceneCache.h:7-33)."""

    positions: np.ndarray     # (V, 3) f32
    normals_packed: np.ndarray   # (V,) u32  oct10:10 + bitangent sign
    uvs_packed: np.ndarray       # (V,) u32  half2
    tangents_packed: np.ndarray  # (V,) u32  oct8:8
    lods: List[CookedLOD] = field(default_factory=list)
    center: np.ndarray = None    # (3,) f32 bounding sphere
    radius: float = 0.0

    @property
    def num_vertices(self) -> int:
        return int(self.positions.shape[0])


# ---------------------------------------------------------------------------
# Pipeline stages
# ---------------------------------------------------------------------------


def remove_degenerate_triangles(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Drop zero-area/repeated-index triangles (ref SceneLoader.cpp degenerate filter)."""
    tri = indices.reshape(-1, 3)
    a, b, c = positions[tri[:, 0]], positions[tri[:, 1]], positions[tri[:, 2]]
    cross = np.cross(b - a, c - a)
    area2 = np.einsum("ij,ij->i", cross, cross)
    distinct = (tri[:, 0] != tri[:, 1]) & (tri[:, 1] != tri[:, 2]) & (tri[:, 0] != tri[:, 2])
    keep = distinct & (area2 > 1e-24)
    return tri[keep]


def generate_smooth_normals(positions: np.ndarray, tri: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (used when the source supplies none)."""
    a, b, c = positions[tri[:, 0]], positions[tri[:, 1]], positions[tri[:, 2]]
    fn = np.cross(b - a, c - a)  # area-weighted
    n = np.zeros_like(positions)
    for k in range(3):
        np.add.at(n, tri[:, k], fn)
    return np.asarray(hm.normalize(n), np.float32)


def generate_tangents(positions, normals, uvs, tri):
    """Per-vertex tangents from UV derivatives (ref mikktspace-style generation at
    src/SceneLoader.cpp:1883-1931; simplified: average of per-face tangents,
    Gram-Schmidt orthogonalized, bitangent sign from the UV winding)."""
    a, b, c = positions[tri[:, 0]], positions[tri[:, 1]], positions[tri[:, 2]]
    ua, ub, uc = uvs[tri[:, 0]], uvs[tri[:, 1]], uvs[tri[:, 2]]
    e1, e2 = b - a, c - a
    d1, d2 = ub - ua, uc - ua
    det = d1[:, 0] * d2[:, 1] - d2[:, 0] * d1[:, 1]
    inv = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(det == 0, 1.0, det))
    t = (e1 * d2[:, 1:2] - e2 * d1[:, 1:2]) * inv[:, None]
    bt = (e2 * d1[:, 0:1] - e1 * d2[:, 0:1]) * inv[:, None]
    tan = np.zeros_like(positions)
    btan = np.zeros_like(positions)
    for k in range(3):
        np.add.at(tan, tri[:, k], t)
        np.add.at(btan, tri[:, k], bt)
    # Gram-Schmidt vs normal
    tan = tan - normals * np.einsum("ij,ij->i", normals, tan)[:, None]
    bad = np.einsum("ij,ij->i", tan, tan) < 1e-16
    # fallback: any vector orthogonal to n
    alt = np.cross(normals, np.where(np.abs(normals[:, 0:1]) < 0.9,
                                     np.array([[1.0, 0, 0]], np.float32),
                                     np.array([[0, 1.0, 0]], np.float32)))
    tan = np.where(bad[:, None], alt, tan)
    tan = np.asarray(hm.normalize(tan), np.float32)
    sign = np.where(np.einsum("ij,ij->i", np.cross(normals, tan), btan) >= 0.0, 1.0, -1.0)
    return tan, sign.astype(np.float32)


def simplify_grid(positions: np.ndarray, tri: np.ndarray, cell_size: float):
    """Vertex-clustering simplification: snap to grid of ``cell_size``, collapse.

    Returns (new_tri, representative_vertex_map kept as original indices).
    Fully vectorized; replaces meshopt_simplifyWithAttributes for v1."""
    if tri.shape[0] == 0:
        return tri
    q = np.floor(positions / cell_size).astype(np.int64)
    # hash grid cell -> cluster id
    key = (q[:, 0] * 73856093) ^ (q[:, 1] * 19349663) ^ (q[:, 2] * 83492791)
    _, cluster = np.unique(key, return_inverse=True)
    ctri = cluster[tri]
    keep = (ctri[:, 0] != ctri[:, 1]) & (ctri[:, 1] != ctri[:, 2]) & (ctri[:, 0] != ctri[:, 2])
    ctri = ctri[keep]
    new_tri = tri[keep].copy()
    if ctri.shape[0] == 0:
        return new_tri
    # representative original vertex per cluster: first occurrence
    order = np.argsort(cluster, kind="stable")
    first_idx = np.zeros(cluster.max() + 1, np.int64)
    seen = np.unique(cluster[order], return_index=True)
    first_idx[seen[0]] = order[seen[1]]
    new_tri = first_idx[ctri]
    # dedupe identical triangles (ignoring rotation) to avoid z-fighting copies
    srt = np.sort(new_tri, axis=1)
    _, uniq = np.unique(srt, axis=0, return_index=True)
    return new_tri[np.sort(uniq)].astype(np.int32)


def build_meshlets(positions: np.ndarray, tri: np.ndarray,
                   max_verts: int = MESHLET_MAX_VERTS,
                   max_tris: int = MESHLET_MAX_TRIS) -> MeshletSet:
    """Greedy meshlet scan over Morton-ordered triangles.

    meshopt_buildMeshlets-style (ref SceneLoader.cpp:2055-2108): sort triangles by
    centroid Morton code for spatial locality, then greedily pack into meshlets under
    the vertex/triangle budgets. Emits bounding spheres + backface cones."""
    ntri = tri.shape[0]
    if ntri == 0:
        z = np.zeros(0, np.int32)
        return MeshletSet(z, z, z, z, z, np.zeros((0, 3), np.int32),
                          np.zeros((0, 3), np.float32), np.zeros(0, np.float32),
                          np.zeros((0, 3), np.float32), np.zeros(0, np.float32))
    cent = positions[tri].mean(axis=1)
    lo, hi = cent.min(0), cent.max(0)
    ext = np.maximum(hi - lo, 1e-12)
    g = np.clip(((cent - lo) / ext * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x

    morton = spread(g[:, 0]) | (spread(g[:, 1]) << np.uint64(1)) | (spread(g[:, 2]) << np.uint64(2))
    order = np.argsort(morton, kind="stable")
    tri_sorted = tri[order]

    # greedy scan: native C++ (hobbyrenderer_tpu/native/meshcook.cpp) with a
    # pure-python fallback — the one cook stage that can't be vectorized
    native = None
    try:
        from hobbyrenderer_tpu.native.build import build_meshlets_native
        native = build_meshlets_native(tri_sorted.astype(np.int32),
                                       int(positions.shape[0]),
                                       max_verts, max_tris)
    except Exception:
        native = None
    if native is not None:
        vert_offset, vert_count, tri_offset, tri_count, vertices, tris = native
        M = vert_offset.shape[0]
    else:
        (vert_offset, vert_count, tri_offset, tri_count,
         vertices, tris) = _greedy_scan_py(tri_sorted, max_verts, max_tris)
        M = vert_offset.shape[0]

    # bounds + cones per meshlet (host python loop over meshlets — the
    # remaining scalar cook hot spot; the native C++ path covers dense-mesh
    # cooks, and the cooked cache amortizes repeats)
    center = np.zeros((M, 3), np.float32)
    radius = np.zeros(M, np.float32)
    cone_axis = np.zeros((M, 3), np.float32)
    cone_cutoff = np.ones(M, np.float32)
    for m in range(M):
        vs = vertices[vert_offset[m]:vert_offset[m] + vert_count[m]]
        p = positions[vs]
        c = 0.5 * (p.min(0) + p.max(0))
        center[m] = c
        radius[m] = np.sqrt(np.max(np.sum((p - c) ** 2, axis=-1)))
        lt = tris[tri_offset[m]:tri_offset[m] + tri_count[m]]
        ga, gb, gc = p[lt[:, 0]], p[lt[:, 1]], p[lt[:, 2]]
        fn = np.cross(gb - ga, gc - ga)
        ln = np.linalg.norm(fn, axis=-1, keepdims=True)
        fn = fn / np.maximum(ln, 1e-20)
        axis = fn.mean(0)
        alen = np.linalg.norm(axis)
        if alen < 1e-6:
            cone_cutoff[m] = 1.0  # degenerate spread: never cone-cull
            continue
        axis = axis / alen
        cone_axis[m] = axis
        mindot = float(np.min(fn @ axis))
        # cutoff per meshopt convention: cull if dot(view, axis) >= cutoff impossible
        if mindot <= 0.1:
            cone_cutoff[m] = 1.0
        else:
            cone_cutoff[m] = float(np.sqrt(max(0.0, 1.0 - mindot * mindot)))
    return MeshletSet(vert_offset, vert_count, tri_offset, tri_count, vertices, tris,
                      center, radius, cone_axis, cone_cutoff)


def _greedy_scan_py(tri_sorted: np.ndarray, max_verts: int, max_tris: int):
    """Reference implementation of the greedy meshlet scan (python)."""
    ml_vo, ml_vc, ml_to, ml_tc = [], [], [], []
    ml_vertices: List[int] = []
    ml_tris: List[np.ndarray] = []
    cur_map = {}
    cur_verts: List[int] = []
    cur_tris: List[np.ndarray] = []

    def flush():
        if not cur_tris:
            return
        ml_vo.append(len(ml_vertices))
        ml_vc.append(len(cur_verts))
        ml_to.append(len(ml_tris))
        ml_tc.append(len(cur_tris))
        ml_vertices.extend(cur_verts)
        ml_tris.extend(cur_tris)

    for t in tri_sorted:
        t0, t1, t2 = int(t[0]), int(t[1]), int(t[2])
        new = sum(1 for v in (t0, t1, t2) if v not in cur_map)
        if len(cur_verts) + new > max_verts or len(cur_tris) + 1 > max_tris:
            flush()
            cur_map, cur_verts, cur_tris = {}, [], []
        loc = []
        for v in (t0, t1, t2):
            if v not in cur_map:
                cur_map[v] = len(cur_verts)
                cur_verts.append(v)
            loc.append(cur_map[v])
        cur_tris.append(np.asarray(loc, np.int32))
    flush()

    return (np.asarray(ml_vo, np.int32), np.asarray(ml_vc, np.int32),
            np.asarray(ml_to, np.int32), np.asarray(ml_tc, np.int32),
            np.asarray(ml_vertices, np.int32),
            np.stack(ml_tris).astype(np.int32) if ml_tris else np.zeros((0, 3), np.int32))


def cook_mesh(positions: np.ndarray,
              indices: np.ndarray,
              normals: Optional[np.ndarray] = None,
              uvs: Optional[np.ndarray] = None,
              tangents: Optional[np.ndarray] = None,
              max_lods: int = MAX_LODS) -> CookedMesh:
    """Full cook of one primitive (ref ProcessMeshes, src/SceneLoader.cpp:1740-2206)."""
    positions = np.ascontiguousarray(positions, np.float32)
    tri = remove_degenerate_triangles(positions, np.asarray(indices, np.int64))
    if normals is None:
        normals = generate_smooth_normals(positions, tri)
    else:
        normals = np.asarray(hm.normalize(np.asarray(normals, np.float32)), np.float32)
    if uvs is None:
        uvs = np.zeros((positions.shape[0], 2), np.float32)
    else:
        uvs = np.asarray(uvs, np.float32)
    if tangents is None or np.asarray(tangents).shape[-1] != 4:
        tan, sign = generate_tangents(positions, normals, uvs, tri)
    else:
        tangents = np.asarray(tangents, np.float32)
        tan, sign = tangents[:, :3], tangents[:, 3]

    npacked = np.asarray(hm.pack_normal_oct(normals, sign), np.uint32)
    uvpacked = np.asarray(hm.pack_uv_half2(uvs), np.uint32)
    tpacked = np.asarray(hm.pack_tangent_oct(tan), np.uint32)

    c = 0.5 * (positions.min(0) + positions.max(0)) if positions.size else np.zeros(3, np.float32)
    r = float(np.sqrt(np.max(np.sum((positions - c) ** 2, -1)))) if positions.size else 0.0

    mesh = CookedMesh(positions=positions, normals_packed=npacked, uvs_packed=uvpacked,
                      tangents_packed=tpacked, center=c.astype(np.float32), radius=r)

    # LOD chain (ref SceneLoader.cpp:1995-2044): level 0 = full; each next level
    # simplifies toward 0.6x indices via quadric edge collapse (C++,
    # native/meshcook.cpp simplify_qem — the meshopt_simplifyWithAttributes
    # role: border/seam-preserving, flip-rejecting, endpoint placement so
    # vertex attributes survive) with grid clustering as the portable
    # fallback; stop at <1024 indices or <15% reduction.
    try:
        from hobbyrenderer_tpu.native.build import simplify_qem_native
    except Exception:
        simplify_qem_native = lambda *a: None
    cur = tri.astype(np.int32)
    err = 0.0
    extent = float(np.linalg.norm(positions.max(0) - positions.min(0))) if positions.size else 1.0
    cell = extent / 128.0 if extent > 0 else 1.0
    for lod in range(max_lods):
        mesh.lods.append(CookedLOD(indices=cur, meshlets=build_meshlets(positions, cur), error=err))
        if cur.shape[0] * 3 < LOD_MIN_INDICES:
            break
        if lod + 1 >= max_lods:
            break
        target = int(cur.shape[0] * LOD_INDEX_TARGET)
        res = simplify_qem_native(positions, cur, max(target, 1),
                                  LOD_ERROR_BOUND * extent)
        if res is not None:
            nxt, lvl_err = res
            if nxt.shape[0] >= cur.shape[0] * LOD_MIN_REDUCTION or nxt.shape[0] == 0:
                break
            err = max(err * LOD_ERROR_SCALE, lvl_err)
            cur = nxt
            continue
        nxt, trial_cell = cur, cell
        for _ in range(6):  # grow cell until target reduction achieved
            nxt = simplify_grid(positions, cur, trial_cell)
            if nxt.shape[0] <= max(target, 1):
                break
            trial_cell *= 2.0
        if nxt.shape[0] >= cur.shape[0] * LOD_MIN_REDUCTION or nxt.shape[0] == 0:
            break
        err = max(err * LOD_ERROR_SCALE, trial_cell * np.sqrt(3.0))
        cell = trial_cell * 2.0
        cur = nxt
    return mesh
