"""glTF loader + cooked-cache tests (SURVEY.md §4: LoadGLTFSceneFromMemory-style
in-memory scenes as the harness entry point)."""

import base64
import json
import os
import struct

import numpy as np
import pytest

from hobbyrenderer_tpu.scene.loader import load_gltf_from_memory, load_gltf_scene
from hobbyrenderer_tpu.scene.scene import ALPHA_MASKED, LIGHT_POINT


def _b64(arr: np.ndarray) -> str:
    return "data:application/octet-stream;base64," + base64.b64encode(
        arr.tobytes()).decode()


def _tri_gltf(with_anim=True):
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    nrm = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    uv = np.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    idx = np.asarray([0, 1, 2, 2, 1, 3], np.uint16)
    anim_t = np.asarray([0.0, 2.0], np.float32)
    anim_v = np.asarray([[0, 0, 0], [0, 3, 0]], np.float32)
    buf = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes() \
        + anim_t.tobytes() + anim_v.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"name": "quad", "mesh": 0, "translation": [0, 0, 0]},
            {"name": "lightnode", "translation": [0, 2, 0],
             "extensions": {"KHR_lights_punctual": {"light": 0}}},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{
            "name": "checker",
            "pbrMetallicRoughness": {"baseColorFactor": [0.8, 0.2, 0.1, 1.0],
                                     "metallicFactor": 0.25,
                                     "roughnessFactor": 0.6},
            "emissiveFactor": [0.1, 0.2, 0.3],
            "alphaMode": "MASK", "alphaCutoff": 0.4, "doubleSided": True,
            "extensions": {
                "KHR_materials_emissive_strength": {"emissiveStrength": 5.0},
                "KHR_materials_transmission": {"transmissionFactor": 0.5},
                "KHR_materials_ior": {"ior": 1.33}},
        }],
        "extensions": {"KHR_lights_punctual": {"lights": [{
            "type": "point", "color": [1.0, 0.5, 0.25], "intensity": 7.0,
            "range": 12.0, "name": "pt"}]}},
        "buffers": [{"uri": _b64(np.frombuffer(buf, np.uint8)), "byteLength": len(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
            {"buffer": 0, "byteOffset": 140, "byteLength": 8},
            {"buffer": 0, "byteOffset": 148, "byteLength": 24},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "VEC3"},
        ],
    }
    if with_anim:
        doc["animations"] = [{
            "name": "rise",
            "samplers": [{"input": 4, "output": 5, "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0, "target": {"node": 0, "path": "translation"}}],
        }]
    return doc


def test_load_from_memory():
    sc = load_gltf_from_memory(_tri_gltf())
    assert len(sc.meshes) == 1
    assert sc.meshes[0].lods[0].indices.shape[0] == 2
    m = sc.materials[1]
    np.testing.assert_allclose(m.base_color, [0.8, 0.2, 0.1, 1.0])
    assert m.alpha_mode == ALPHA_MASKED and m.alpha_cutoff == pytest.approx(0.4)
    assert m.double_sided and m.emissive_strength == 5.0
    assert m.transmission == 0.5 and m.ior == pytest.approx(1.33)
    # light on a node, plus the default sun appended at finalize
    pts = [l for l in sc.lights if l.type == LIGHT_POINT]
    assert len(pts) == 1
    np.testing.assert_allclose(pts[0].position, [0, 2, 0], atol=1e-6)
    assert pts[0].intensity == 7.0 and pts[0].range == 12.0
    # instances bucketed; material is masked
    assert sc.instances[0].material == 1
    # animation drives node 0
    sc.update(1.0)
    np.testing.assert_allclose(sc.nodes[0].world[:3, 3], [0, 1.5, 0], atol=1e-5)


def test_load_from_glb_bytes():
    doc = _tri_gltf(with_anim=False)
    # convert the data-uri buffer into a GLB BIN chunk
    uri = doc["buffers"][0]["uri"]
    blob = base64.b64decode(uri.split(",", 1)[1])
    doc["buffers"] = [{"byteLength": len(blob)}]
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    binpad = blob + b"\x00" * (-len(blob) % 4)
    glb = (struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(binpad))
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(binpad), 0x004E4942) + binpad)
    sc = load_gltf_from_memory(glb)
    assert len(sc.meshes) == 1
    assert sc.meshes[0].num_vertices == 4


def test_file_load_and_cache(tmp_path):
    doc = _tri_gltf()
    path = tmp_path / "quad.gltf"
    path.write_text(json.dumps(doc))
    cache_dir = str(tmp_path / "cache")
    sc1 = load_gltf_scene(str(path), cache_dir=cache_dir)
    cache_files = os.listdir(cache_dir)
    assert len(cache_files) == 1, "cook must produce one cache file"
    # second load: cache hit produces identical geometry
    sc2 = load_gltf_scene(str(path), cache_dir=cache_dir)
    np.testing.assert_array_equal(sc1.meshes[0].positions, sc2.meshes[0].positions)
    np.testing.assert_array_equal(sc1.meshes[0].lods[0].indices,
                                  sc2.meshes[0].lods[0].indices)
    np.testing.assert_array_equal(sc1.meshes[0].normals_packed,
                                  sc2.meshes[0].normals_packed)
    # touching the source invalidates the cache (mtime check)
    os.utime(path, (os.path.getmtime(path) + 10, os.path.getmtime(path) + 10))
    sc3 = load_gltf_scene(str(path), cache_dir=cache_dir)
    assert len(sc3.meshes) == 1


def test_loaded_scene_renders():
    import jax
    from hobbyrenderer_tpu.config import RenderSettings
    from hobbyrenderer_tpu.models.deferred import DeferredRenderer
    from hobbyrenderer_tpu.scene import Camera
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import camera_looking_at

    sc = load_gltf_from_memory(_tri_gltf(with_anim=False))
    # the fixture's strong blue emissive would dominate; isolate the albedo
    sc.materials[1].emissive = np.zeros(3, np.float32)
    sc.cameras.append(camera_looking_at(np.array([0.5, 0.5, 3.0], np.float32),
                                        np.array([0.5, 0.5, 0.0], np.float32)))
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[-1], 64, 48)
    ldr, overflow = DeferredRenderer(gpu, 64, 48).render(
        gpu, cam.view_constants(0), __import__(
            "hobbyrenderer_tpu.config", fromlist=["RenderSettings"]
        ).RenderSettings().as_pytree())
    ldr = np.asarray(ldr)
    center = ldr[24, 32].astype(np.int32)
    assert center[0] > center[2], f"red quad expected at center: {center}"


def test_scene_json_instances_same_model_twice(tmp_path):
    """Two graph nodes referencing the same model index must BOTH attach
    (regression: the first-reference-only guard dropped repeats)."""
    from hobbyrenderer_tpu.scene.loader import load_scene_json
    gltf = _tri_gltf(with_anim=False)
    (tmp_path / "quad.gltf").write_text(json.dumps(gltf))
    scene_doc = {
        "models": ["quad.gltf"],
        "graph": [
            {"name": "a", "model": 0, "translation": [0, 0, 0]},
            {"name": "b", "model": 0, "translation": [5, 0, 0]},
        ],
    }
    p = tmp_path / "two.scene.json"
    p.write_text(json.dumps(scene_doc))
    sc = load_scene_json(str(p), cache_dir=str(tmp_path / "cache"))
    quads = [i for i in sc.instances]
    assert len(quads) == 2, f"expected 2 instances, got {len(quads)}"
    ws = sorted(float(sc.nodes[I.node].world[0, 3]) for I in sc.instances)
    assert abs(ws[0] - 0.0) < 1e-4 and abs(ws[1] - 5.0) < 1e-4, ws


def test_animated_emissive_refreshes_light_pool():
    """emissiveIntensity animation must drive the CAST light: the pool's
    em_rad/power refresh from the updated material table (regression: the
    pool stayed frozen at load-time strength)."""
    import jax.numpy as jnp
    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    from hobbyrenderer_tpu.ops.lights import refresh_pool_emissive
    from hobbyrenderer_tpu.scene.cooker import cook_mesh
    from hobbyrenderer_tpu.scene.gpu import (build_scene_gpu,
                                             update_material_constants)
    from hobbyrenderer_tpu.scene.procedural import (camera_looking_at,
                                                    plane_geometry)
    from hobbyrenderer_tpu.scene.scene import Material, Node, Scene
    sc = Scene()
    em = sc.add_material(Material(name="lamp",
                                  emissive=np.array([1.0, 0.5, 0.25],
                                                    np.float32),
                                  emissive_strength=2.0))
    pos, nrm, uv, idx = plane_geometry(1.0)
    prim = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=em)
    sc.add_node(Node(name="lamp", mesh_primitives=[prim]))
    sc.cameras.append(camera_looking_at(np.array([0, 2, 2], np.float32),
                                        np.zeros(3)))
    sc.finalize()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    rad0 = np.asarray(rt.lights.em_rad)
    live = np.asarray(rt.lights.em_orig) >= 0
    assert np.allclose(rad0[live][:, 0], 2.0, atol=1e-5)

    sc.materials[em].emissive_strength = 6.0
    sc.dirty_materials.add(em)
    gpu = update_material_constants(gpu, sc)
    pool = refresh_pool_emissive(rt.lights, gpu, rt.tri_mat)
    rad1 = np.asarray(pool.em_rad)
    assert np.allclose(rad1[live][:, 0], 6.0, atol=1e-4), rad1[live]
    # power CDF follows (3x total power; pdf distribution unchanged here)
    assert np.asarray(pool.packed)[np.asarray(rt.lights.n_analytic), 10] > \
        np.asarray(rt.lights.packed)[np.asarray(rt.lights.n_analytic), 10]


def test_animated_emissive_relights_scene_e2e():
    """Full render loop: an emissiveIntensity animation must change the light
    the emitter CASTS on nearby geometry, not only its own surface (the pool
    refresh wiring in Renderer.render_frame)."""
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer
    from hobbyrenderer_tpu.scene.cooker import cook_mesh
    from hobbyrenderer_tpu.scene.procedural import (camera_looking_at,
                                                    plane_geometry)
    from hobbyrenderer_tpu.scene.scene import (Animation, AnimationChannel,
                                               Light, LIGHT_DIRECTIONAL,
                                               Material, Node, Scene)

    sc = Scene()
    floor = sc.add_material(Material(
        name="floor", base_color=np.array([0.6, 0.6, 0.6, 1], np.float32),
        roughness=0.9, double_sided=True))
    lamp = sc.add_material(Material(
        name="lamp", emissive=np.array([4.0, 4.0, 4.0], np.float32),
        emissive_strength=1.0, double_sided=True))
    pos, nrm, uv, idx = plane_geometry(3.0)
    fp = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=floor)
    sc.add_node(Node(name="floor", mesh_primitives=[fp]))
    qpos, qnrm, quv, qidx = plane_geometry(1.0)
    lp = sc.add_mesh(cook_mesh(qpos, qidx, normals=-qnrm, uvs=quv),
                     material=lamp)
    sc.add_node(Node(name="lamp", mesh_primitives=[lp],
                     translation=np.array([0, 2.0, 0], np.float32)))
    # zero-power sun suppresses the default light; the lamp dominates
    sc.add_light(Light(type=LIGHT_DIRECTIONAL,
                       direction=np.array([0, -1, 0], np.float32),
                       intensity=0.0))
    sc.cameras.append(camera_looking_at(np.array([0, 1.0, 3.0], np.float32),
                                        np.zeros(3)))
    # ramp the lamp 1 -> 30x over 2 seconds
    sc.animations.append(Animation(
        name="pulse", duration=2.0,
        channels=[AnimationChannel(
            target_material=lamp, path="emissiveIntensity",
            times=np.asarray([0.0, 2.0], np.float32),
            values=np.asarray([[1.0], [30.0]], np.float32))]))
    sc.finalize()

    # compare LINEAR HDR radiance (keep_hdr): auto-exposure re-normalizes
    # the LDR output and would hide the brightening
    # unique scene key: the camera-state cache would otherwise restore a
    # stale camera saved by other cube-scene tests
    cfg = Config(scene="__emissive_e2e__", width=64, height=48,
                 mode=RenderingMode.NORMAL, direct_mode="restir",
                 keep_hdr=True)
    r = Renderer(cfg, scene=sc)
    r.render_frame(dt=0.05)
    early = np.asarray(r._model.last_stats["hdr_frame"]).astype(np.float64)
    for _ in range(30):                         # advance to t ~ 1.5 s
        r.render_frame(dt=0.05)
    late = np.asarray(r._model.last_stats["hdr_frame"]).astype(np.float64)
    # linear radiance must rise strongly as the lamp ramps 1 -> ~23x
    assert late.mean() > early.mean() * 2.0, \
        f"cast light never brightened: {early.mean():.3f} -> {late.mean():.3f}"
