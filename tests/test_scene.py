"""Scene/cooker tests: meshlet invariants, LOD chain, scene finalize, GPU upload
(SURVEY.md §4: LOD error metric + BVH/meshlet build invariants as unit tests)."""

import numpy as np

from hobbyrenderer_tpu.scene import (cook_mesh, make_default_cube_scene, make_stress_scene,
                                     MESHLET_MAX_TRIS, MESHLET_MAX_VERTS)
from hobbyrenderer_tpu.scene.procedural import sphere_geometry, cube_geometry
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.utils import math as hm


def _check_meshlets(mesh):
    for lod in mesh.lods:
        ms = lod.meshlets
        total_tris = int(ms.tri_count.sum())
        assert total_tris == lod.indices.shape[0], "meshlets must cover every triangle"
        assert (ms.vert_count <= MESHLET_MAX_VERTS).all()
        assert (ms.tri_count <= MESHLET_MAX_TRIS).all()
        # reconstruct global triangles from meshlets and compare as sets
        recon = []
        for m in range(ms.count):
            vs = ms.vertices[ms.vert_offset[m]:ms.vert_offset[m] + ms.vert_count[m]]
            lt = ms.tris[ms.tri_offset[m]:ms.tri_offset[m] + ms.tri_count[m]]
            assert (lt < ms.vert_count[m]).all(), "local index out of meshlet range"
            recon.append(vs[lt])
        recon = np.concatenate(recon, 0) if recon else np.zeros((0, 3), np.int64)
        a = set(map(tuple, np.sort(recon, 1).tolist()))
        b = set(map(tuple, np.sort(lod.indices, 1).tolist()))
        assert a == b, "meshlet reconstruction must equal the index buffer"
        # bounding spheres contain all meshlet vertices
        for m in range(ms.count):
            vs = ms.vertices[ms.vert_offset[m]:ms.vert_offset[m] + ms.vert_count[m]]
            d = np.linalg.norm(mesh.positions[vs] - ms.center[m], axis=-1)
            assert (d <= ms.radius[m] + 1e-4).all()


def test_cube_cook():
    pos, nrm, uv, idx = cube_geometry()
    mesh = cook_mesh(pos, idx, normals=nrm, uvs=uv)
    assert mesh.num_vertices == 24
    assert mesh.lods[0].indices.shape[0] == 12
    assert len(mesh.lods) == 1  # tiny mesh: no LOD chain (<1024 indices)
    _check_meshlets(mesh)
    # quantized normals decode to face normals
    n, sign = hm.unpack_normal_oct(mesh.normals_packed)
    np.testing.assert_allclose(np.abs(np.asarray(n)).max(-1), 1.0, atol=2e-3)


def test_sphere_lod_chain():
    pos, nrm, uv, idx = sphere_geometry(0.5, 32, 48)
    mesh = cook_mesh(pos, idx, normals=nrm, uvs=uv)
    assert len(mesh.lods) >= 3, "dense sphere must produce a LOD chain"
    counts = [l.indices.shape[0] for l in mesh.lods]
    assert all(c1 < c0 for c0, c1 in zip(counts, counts[1:])), "LODs must shrink"
    errors = [l.error for l in mesh.lods]
    assert errors[0] == 0.0
    assert all(e1 > e0 for e0, e1 in zip(errors, errors[1:])), "errors must grow"
    _check_meshlets(mesh)
    # simplified vertices are reused from the original pool (no new vertices)
    for l in mesh.lods:
        assert l.indices.max() < mesh.num_vertices


def test_degenerate_filter():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0.5, 0.5, 0]], np.float32)
    idx = np.array([0, 1, 2, 0, 0, 1, 1, 1, 1], np.int32)  # 1 valid + 2 degenerate
    mesh = cook_mesh(pos, idx)
    assert mesh.lods[0].indices.shape[0] == 1


def test_default_cube_scene():
    sc = make_default_cube_scene()
    assert len(sc.instances) == 1
    assert any(l.name == "default_sun" for l in sc.lights)
    assert sc.radius > 0.4
    gpu = build_scene_gpu(sc, device_put=False)
    assert gpu.num_instances == 1
    assert gpu.num_pairs == 1  # cube = 12 tris = 1 meshlet, 1 lod
    assert gpu.tri_indices.shape[0] == 12


def test_stress_scene_buckets():
    sc = make_stress_scene(grid=3, lod_rich=False)
    modes = [i.alpha_mode for i in sc.instances]
    assert modes == sorted(modes), "instances must be bucketed opaque->masked->blend"
    gpu = build_scene_gpu(sc, device_put=False)
    assert gpu.num_instances == len(sc.instances)
    # pair list covers all lods of all instances
    assert gpu.num_pairs >= gpu.num_instances
    assert gpu.lod0_pair_capacity <= gpu.num_pairs
    # every pair's meshlet id is in range
    assert gpu.pair_meshlet.max() < gpu.ml_vert_offset.shape[0]
    assert int(gpu.light_count) == len(sc.lights)


def test_animation_update():
    from hobbyrenderer_tpu.scene.scene import Animation, AnimationChannel
    sc = make_default_cube_scene()
    ch = AnimationChannel(target_node=0, path="translation",
                          times=np.array([0.0, 1.0], np.float32),
                          values=np.array([[0, 0, 0], [2, 0, 0]], np.float32))
    sc.animations.append(Animation(channels=[ch], duration=1.0))
    sc.dirty_instances.clear()
    sc.update(0.5)
    assert 0 in sc.dirty_instances
    np.testing.assert_allclose(sc.nodes[0].world[:3, 3], [1, 0, 0], atol=1e-6)
