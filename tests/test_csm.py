"""CSM correctness: a box floating over a plane must shadow the region below
it (straight-down sun), and lit areas must stay unshadowed."""

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.ops import csm as csmops
from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.scene import Camera
from hobbyrenderer_tpu.scene.cooker import cook_mesh
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.scene.procedural import (camera_looking_at, cube_geometry,
                                                plane_geometry)
from hobbyrenderer_tpu.scene.scene import Light, LIGHT_DIRECTIONAL, Material, Node, Scene

W, H = 96, 64


def test_csm_box_shadows_plane():
    sc = Scene()
    m = sc.add_material(Material(name="w", base_color=np.array([1, 1, 1, 1], np.float32),
                                 roughness=1.0))
    pos, nrm, uv, idx = plane_geometry(5.0)
    plane = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=m)
    sc.add_node(Node(name="plane", mesh_primitives=[plane]))
    cpos, cnrm, cuv, cidx = cube_geometry()
    cube = sc.add_mesh(cook_mesh(cpos, cidx, normals=cnrm, uvs=cuv), material=m)
    sc.add_node(Node(name="cube", mesh_primitives=[cube],
                     translation=np.array([0, 1.5, 0], np.float32)))
    sun = np.array([0, -1, 0], np.float32)  # straight down
    sc.add_light(Light(type=LIGHT_DIRECTIONAL, direction=sun, intensity=5.0))
    sc.cameras.append(camera_looking_at(np.array([0, 4, 5], np.float32), np.zeros(3)))
    sc.finalize()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    cap = max(int(gpu.lod0_pair_capacity), 1)

    @jax.jit
    def run(gpu, vc):
        cu = cullops.cull_pairs(gpu, vc, alpha_mask=jnp.asarray([True, True, False]))
        slots, _ = cullops.compact_mask(cu["mask"], cap)
        ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
        gb = rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)
        # capacity spans the flattened (cascade, pair) slot table
        data = csmops.render_cascades(gpu, vc, jnp.asarray(sun),
                                      cap * csmops.NUM_CASCADES,
                                      max_distance=30.0)
        mask = csmops.csm_shadow_mask(data, vc, gb.world_pos, gb.geo_normal,
                                      gb.valid, jnp.asarray(sun))
        return gb, mask

    gb, mask = run(gpu, vc)
    mask = np.asarray(mask)
    wp = np.asarray(gb.world_pos)
    valid = np.asarray(gb.valid)
    on_plane = valid & (np.abs(wp[..., 1]) < 0.05)
    under_box = on_plane & (np.abs(wp[..., 0]) < 0.4) & (np.abs(wp[..., 2]) < 0.4)
    far_lit = on_plane & (np.maximum(np.abs(wp[..., 0]), np.abs(wp[..., 2])) > 1.5) \
        & (np.maximum(np.abs(wp[..., 0]), np.abs(wp[..., 2])) < 4.0)
    assert under_box.sum() > 10 and far_lit.sum() > 50
    assert mask[under_box].mean() < 0.2, f"under box should be shadowed: {mask[under_box].mean()}"
    assert mask[far_lit].mean() > 0.85, f"open plane should be lit: {mask[far_lit].mean()}"


def test_csm_debug_overlay():
    """--csm-debug view: cascade tint applied to lit pixels + thumbnails
    inset (ref src/CSMDebugRenderer.cpp)."""
    import numpy as np
    import jax.numpy as jnp
    from hobbyrenderer_tpu.config import Config, RenderingMode, RenderSettings
    from hobbyrenderer_tpu.models.deferred import DeferredRenderer
    from hobbyrenderer_tpu.scene import make_stress_scene
    from hobbyrenderer_tpu.scene.camera import Camera
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu

    sc = make_stress_scene(grid=3)
    gpu = build_scene_gpu(sc)
    W, H = 96, 64
    cam = Camera(None, W, H)
    cam.position = (sc.center + np.asarray([0.6, 0.45, 1.1], np.float32)
                    * sc.radius * 1.6)
    cam.look_at(sc.center)
    cam.jitter_enabled = False
    s = RenderSettings().as_pytree()

    cfg_dbg = Config(width=W, height=H, mode=RenderingMode.NORMAL_BASIC,
                     csm_debug=True)
    r_dbg = DeferredRenderer(gpu, W, H, config=cfg_dbg,
                             mode=RenderingMode.NORMAL_BASIC, with_taa=False)
    r_plain = DeferredRenderer(gpu, W, H, mode=RenderingMode.NORMAL_BASIC,
                               with_taa=False)
    vc = cam.view_constants(0)
    ldr_dbg, _ = r_dbg.render(gpu, vc, s)
    ldr_plain, _ = r_plain.render(gpu, vc, s)
    a = np.asarray(ldr_dbg).astype(np.int32)
    b = np.asarray(ldr_plain).astype(np.int32)
    assert a.shape == b.shape
    diff = np.abs(a - b).max(-1) > 4
    # cascade tint on geometry pixels (upper region, away from thumbnails)
    assert diff[: H // 2].mean() > 0.02, "no cascade tint applied"
    # thumbnail strip along the bottom edge
    assert diff[H - 20:].mean() > 0.1, "no shadow-map thumbnails drawn"


def test_csm_scales_to_large_scene():
    """Scene-adaptive shadow range: the SAME box-over-plane layout scaled x30
    sits far outside v1's fixed 60-unit cascade range; the adaptive
    max_distance (2 x scene bounding radius) must still shadow under the box,
    and the DeferredRenderer must wire that adaptive value through."""
    from hobbyrenderer_tpu.config import RenderingMode
    from hobbyrenderer_tpu.models import deferred as defmod
    from hobbyrenderer_tpu.models.deferred import DeferredRenderer

    S = 30.0
    sc = Scene()
    m = sc.add_material(Material(name="w",
                                 base_color=np.array([1, 1, 1, 1], np.float32),
                                 roughness=1.0))
    pos, nrm, uv, idx = plane_geometry(5.0 * S)
    plane = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=m)
    sc.add_node(Node(name="plane", mesh_primitives=[plane]))
    cpos, cnrm, cuv, cidx = cube_geometry()
    cube = sc.add_mesh(cook_mesh(cpos * S, cidx, normals=cnrm, uvs=cuv),
                       material=m)
    sc.add_node(Node(name="cube", mesh_primitives=[cube],
                     translation=np.array([0, 1.5 * S, 0], np.float32)))
    sun = np.array([0, -1, 0], np.float32)
    sc.add_light(Light(type=LIGHT_DIRECTIONAL, direction=sun, intensity=5.0))
    sc.cameras.append(camera_looking_at(np.array([0, 4 * S, 5 * S], np.float32),
                                        np.zeros(3)))
    sc.finalize()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    cap = max(int(gpu.lod0_pair_capacity), 1)
    scene_radius = float((np.linalg.norm(np.asarray(gpu.inst_center), axis=1)
                          + np.asarray(gpu.inst_radius)).max())
    adaptive = min(max(2.0 * scene_radius, 20.0), 400.0)
    assert adaptive > 60.0, "test scene must exceed the old fixed range"

    @jax.jit
    def run(gpu, vc, max_d):
        cu = cullops.cull_pairs(gpu, vc,
                                alpha_mask=jnp.asarray([True, True, False]))
        slots, _ = cullops.compact_mask(cu["mask"], cap)
        ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
        gb = rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)
        data = csmops.render_cascades(gpu, vc, jnp.asarray(sun),
                                      cap * csmops.NUM_CASCADES,
                                      max_distance=max_d)
        mask = csmops.csm_shadow_mask(data, vc, gb.world_pos, gb.geo_normal,
                                      gb.valid, jnp.asarray(sun))
        return gb, mask

    gb, mask = run(gpu, vc, adaptive)
    mask = np.asarray(mask)
    wp = np.asarray(gb.world_pos)
    valid = np.asarray(gb.valid)
    on_plane = valid & (np.abs(wp[..., 1]) < 0.05 * S)
    under_box = on_plane & (np.abs(wp[..., 0]) < 0.4 * S) \
        & (np.abs(wp[..., 2]) < 0.4 * S)
    far_lit = on_plane \
        & (np.maximum(np.abs(wp[..., 0]), np.abs(wp[..., 2])) > 1.5 * S) \
        & (np.maximum(np.abs(wp[..., 0]), np.abs(wp[..., 2])) < 4.0 * S)
    assert under_box.sum() > 10 and far_lit.sum() > 50
    assert mask[under_box].mean() < 0.2, \
        f"under box should be shadowed at scale: {mask[under_box].mean()}"
    assert mask[far_lit].mean() > 0.85, \
        f"open plane should be lit: {mask[far_lit].mean()}"

    # and the model wires the adaptive value through to render_cascades
    seen = {}
    orig = csmops.render_cascades

    def spy(*a, **kw):
        seen["max_distance"] = kw.get("max_distance", 60.0)
        return orig(*a, **kw)

    csmops.render_cascades = spy
    try:
        r = DeferredRenderer(gpu, W, H, mode=RenderingMode.NORMAL_BASIC,
                             with_taa=False)
        r.render(gpu, vc, RenderSettings().as_pytree())
    finally:
        csmops.render_cascades = orig
    assert abs(seen["max_distance"] - adaptive) < 1e-3, seen
