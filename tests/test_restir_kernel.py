"""Pallas candidate kernel == XLA candidate loop (interpret mode).

The fused kernel (ops/restir_pallas.py) draws the same tiles, slots, and
counter RNG as the XLA loop in ops/restir.py, so the post-candidate reservoir
chain must agree up to float-associativity noise in p-hat."""

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import restir as restirops
from hobbyrenderer_tpu.scene import Camera
from hobbyrenderer_tpu.scene.cooker import cook_mesh
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.scene.procedural import camera_looking_at, plane_geometry
from hobbyrenderer_tpu.scene.scene import (Light, LIGHT_POINT, Material, Node,
                                           Scene)

W, H = 48, 32


def _scene():
    sc = Scene()
    grey = sc.add_material(Material(
        name="grey", base_color=np.array([0.7, 0.7, 0.7, 1], np.float32),
        roughness=0.5))
    glow = sc.add_material(Material(
        name="glow", base_color=np.array([1, 1, 1, 1], np.float32),
        emissive=np.array([4.0, 2.0, 1.0], np.float32), double_sided=True))
    pos, nrm, uv, idx = plane_geometry(4.0)
    ground = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=grey)
    sc.add_node(Node(name="ground", mesh_primitives=[ground]))
    quad = sc.add_mesh(cook_mesh(pos * 0.25, idx, normals=nrm, uvs=uv),
                       material=glow)
    sc.add_node(Node(name="glow", mesh_primitives=[quad],
                     translation=np.array([0.5, 1.2, 0], np.float32)))
    sc.add_light(Light(type=LIGHT_POINT,
                       position=np.array([-1.0, 2.0, 1.0], np.float32),
                       color=np.array([1.0, 0.8, 0.6], np.float32),
                       intensity=20.0, range=25.0, name="pt"))
    sc.cameras.append(camera_looking_at(np.array([0, 3, 4], np.float32),
                                        np.zeros(3)))
    sc.finalize()
    return sc


def test_candidate_kernel_matches_xla():
    sc = _scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    cap = max(int(gpu.lod0_pair_capacity), 1)
    cu = cullops.cull_pairs(gpu, vc, alpha_mask=jnp.asarray([True, True, False]))
    slots, _ = cullops.compact_mask(cu["mask"], cap)
    ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
    gb = rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)

    prev = restirops.reservoir_init(H, W)
    out_x, res_x = restirops.restir_di(gpu, rt, gb, vc, settings, prev,
                                       jnp.int32(5), visibility=False)
    out_k, res_k = restirops.restir_di(gpu, rt, gb, vc, settings, prev,
                                       jnp.int32(5), visibility=False,
                                       force_kernel=True)
    y_x = np.asarray(res_x.y)
    y_k = np.asarray(res_k.y)
    agree = (y_x == y_k).mean()
    assert agree > 0.98, f"winner ids agree only {agree:.3f}"
    ox, ok = np.asarray(out_x), np.asarray(out_k)
    denom = np.abs(ox).sum() + 1e-6
    assert np.abs(ox - ok).sum() / denom < 0.02, "radiance mismatch"


def test_visibility_split_matches_plain_any_hit():
    """The TPU winner-visibility path (two tile-modal beam passes + compacted
    straggler wavefront, ops/restir.py) against the plain bvh_any_hit CPU
    path — same RNG chain, so any divergence is an occlusion-split bug.
    Runs the beams in Pallas interpret mode (ADVICE r3: the split had no
    CPU coverage)."""
    sc = _scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    cap = max(int(gpu.lod0_pair_capacity), 1)
    cu = cullops.cull_pairs(gpu, vc, alpha_mask=jnp.asarray([True, True, False]))
    slots, _ = cullops.compact_mask(cu["mask"], cap)
    ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
    gb = rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)

    prev = restirops.reservoir_init(H, W)
    out_plain, _ = restirops.restir_di(gpu, rt, gb, vc, settings, prev,
                                       jnp.int32(5), visibility=True)
    out_split, _ = restirops.restir_di(gpu, rt, gb, vc, settings, prev,
                                       jnp.int32(5), visibility=True,
                                       force_kernel=True)
    op, os_ = np.asarray(out_plain), np.asarray(out_split)
    denom = np.abs(op).sum() + 1e-6
    rel = np.abs(op - os_).sum() / denom
    assert rel < 0.03, f"visibility split diverges from plain any-hit: {rel}"
