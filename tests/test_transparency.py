"""Forward transparency: a glass quad in front of a red wall must blend."""

import numpy as np

from hobbyrenderer_tpu.config import Config, RenderingMode, RenderSettings
from hobbyrenderer_tpu.models.deferred import DeferredRenderer
from hobbyrenderer_tpu.scene import Camera
from hobbyrenderer_tpu.scene.cooker import cook_mesh
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.scene.procedural import camera_looking_at, plane_geometry
from hobbyrenderer_tpu.scene.scene import (ALPHA_BLEND, Light, LIGHT_DIRECTIONAL,
                                           Material, Node, Scene)

W, H = 96, 64


def test_transparent_blend():
    sc = Scene()
    red = sc.add_material(Material(name="red",
                                   base_color=np.array([1, 0, 0, 1], np.float32),
                                   roughness=1.0))
    glass = sc.add_material(Material(
        name="glass", base_color=np.array([0.2, 0.4, 1.0, 0.4], np.float32),
        roughness=0.1, alpha_mode=ALPHA_BLEND, transmission=0.5,
        attenuation_color=np.array([0.7, 0.8, 1.0], np.float32)))
    pos, nrm, uv, idx = plane_geometry(1.5)
    pos_v = pos[:, [0, 2, 1]].astype(np.float32)
    nrm_v = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    idx_v = idx.reshape(-1, 3)[:, ::-1].reshape(-1)
    wall = sc.add_mesh(cook_mesh(pos_v * 2, idx_v, normals=nrm_v, uvs=uv), material=red)
    pane = sc.add_mesh(cook_mesh(pos_v, idx_v, normals=nrm_v, uvs=uv), material=glass)
    sc.add_node(Node(name="wall", mesh_primitives=[wall],
                     translation=np.array([0, 0, -1], np.float32)))
    sc.add_node(Node(name="pane", mesh_primitives=[pane],
                     translation=np.array([0, 0, 1], np.float32)))
    sc.add_light(Light(type=LIGHT_DIRECTIONAL,
                       direction=np.array([0, -0.3, -1], np.float32), intensity=4.0))
    sc.cameras.append(camera_looking_at(np.array([0, 0, 5], np.float32), np.zeros(3)))
    sc.finalize()

    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    s = RenderSettings()
    r = DeferredRenderer(gpu, W, H, mode=RenderingMode.NORMAL_BASIC, with_taa=False)
    ldr, _ = r.render(gpu, cam.view_constants(0), s.as_pytree())
    ldr = np.asarray(ldr).astype(np.int32)
    center = ldr[H // 2, W // 2]
    # red wall visible THROUGH the pane, tinted: red stays dominant but blue
    # rises vs the bare wall
    edge = ldr[2, 2]  # bare wall corner (wall is bigger than the pane)
    assert center[0] > 30, f"wall must show through the glass: {center}"
    # the pane changes the pixel (transmission tint + specular reflection);
    # compare the blue FRACTION so the check holds under any sky model
    frac_c = center[2] / max(int(center.sum()), 1)
    frac_e = edge[2] / max(int(edge.sum()), 1)
    assert abs(int(center.sum()) - int(edge.sum())) > 20 or frac_c > frac_e, \
        f"pane must visibly alter the pixel: {center} vs {edge}"
