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


# ---------------------------------------------------------------------------
# Refraction through the opaque mip chain (ref BasePass.hlsl:266-483)

def test_refract_dir_snell():
    import jax.numpy as jnp
    from hobbyrenderer_tpu.ops.refraction import refract_dir
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    # normal incidence: passes straight through
    v = jnp.asarray([[0.0, 0.0, -1.0]])
    d, ok = refract_dir(v, n, jnp.asarray([[1.0 / 1.5]]))
    assert bool(ok[0]) and np.allclose(np.asarray(d[0]), [0, 0, -1], atol=1e-6)
    # 45 deg incidence, eta = 1/1.5: sin_t = sin(45)/1.5
    s = np.sin(np.deg2rad(45.0))
    v = jnp.asarray([[s, 0.0, -s]])
    d, ok = refract_dir(v, n, jnp.asarray([[1.0 / 1.5]]))
    sin_t = s / 1.5
    assert bool(ok[0])
    assert np.allclose(float(d[0, 0]), sin_t, atol=1e-5), d
    # total internal reflection going the dense->thin way at grazing angle
    s80 = np.sin(np.deg2rad(80.0))
    v = jnp.asarray([[s80, 0.0, -np.sqrt(1 - s80 * s80)]])
    d, ok = refract_dir(v, n, jnp.asarray([[1.5]]))
    assert not bool(ok[0])


def test_level_stack_sampling():
    import jax.numpy as jnp
    from hobbyrenderer_tpu.ops.refraction import (build_level_stack,
                                                  sample_level_stack)
    rng = np.random.default_rng(0)
    H, W = 32, 64
    img = jnp.asarray(rng.random((H, W, 3), np.float32))
    stack = build_level_stack(img, levels=4)
    xs = (np.arange(W, dtype=np.float32) + 0.5) / W
    ys = (np.arange(H, dtype=np.float32) + 0.5) / H
    uv = jnp.asarray(np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1),
                     jnp.float32)
    # lod 0 at texel centers recovers the image exactly
    out0 = np.asarray(sample_level_stack(stack, uv, jnp.zeros((H, W))))
    assert np.allclose(out0, np.asarray(img), atol=1e-5)
    # higher lod is blurrier: per-pixel deviation from the mean shrinks
    out3 = np.asarray(sample_level_stack(stack, uv, jnp.full((H, W), 3.0)))
    assert out3.std() < out0.std() * 0.6
    # energy preserved by the box chain
    assert abs(out3.mean() - out0.mean()) < 0.02


def _glass_over_stripes(rough, ior=1.5):
    """Glass pane over a high-frequency striped wall; returns the LDR frame
    and the pixel box covered by the pane."""
    from hobbyrenderer_tpu.config import RenderSettings
    from hobbyrenderer_tpu.models.deferred import DeferredRenderer
    from hobbyrenderer_tpu.scene import Camera
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu

    sc = Scene()
    img = np.zeros((64, 64, 4), np.uint8)
    stripe = (np.arange(64) // 8) % 2    # 8-texel vertical stripes
    img[:, stripe == 0] = [255, 255, 255, 255]
    img[:, stripe == 1] = [10, 10, 10, 255]
    sc.images = [img]
    wallm = sc.add_material(Material(name="stripes", roughness=1.0,
                                     base_color_tex=0))
    glass = sc.add_material(Material(
        name="glass", base_color=np.array([1, 1, 1, 0.0], np.float32),
        roughness=rough, alpha_mode=ALPHA_BLEND, transmission=1.0, ior=ior,
        attenuation_color=np.array([1, 1, 1], np.float32)))
    pos, nrm, uv, idx = plane_geometry(1.5, uv_tiles=1.0)
    pos_v = pos[:, [0, 2, 1]].astype(np.float32)
    nrm_v = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    idx_v = idx.reshape(-1, 3)[:, ::-1].reshape(-1)
    wall = sc.add_mesh(cook_mesh(pos_v * 2, idx_v, normals=nrm_v, uvs=uv),
                       material=wallm)
    pane = sc.add_mesh(cook_mesh(pos_v, idx_v, normals=nrm_v, uvs=uv),
                       material=glass)
    sc.add_node(Node(name="wall", mesh_primitives=[wall],
                     translation=np.array([0, 0, -1], np.float32)))
    sc.add_node(Node(name="pane", mesh_primitives=[pane],
                     translation=np.array([0, 0, 1], np.float32)))
    sc.add_light(Light(type=LIGHT_DIRECTIONAL,
                       direction=np.array([0, -0.3, -1], np.float32),
                       intensity=4.0))
    sc.cameras.append(camera_looking_at(np.array([0, 0, 5], np.float32),
                                        np.zeros(3)))
    sc.finalize()

    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    s = RenderSettings()
    r = DeferredRenderer(gpu, W, H, mode=RenderingMode.NORMAL_BASIC,
                         with_taa=False)
    ldr, _ = r.render(gpu, cam.view_constants(0), s.as_pytree())
    return np.asarray(ldr).astype(np.float32)


def test_rough_transmission_blurs_background():
    smooth = _glass_over_stripes(0.05)
    rough = _glass_over_stripes(0.9)
    # center rows behind the pane: stripe contrast must collapse under the
    # roughness-driven mip LOD
    def stripe_contrast(im):
        band = im[H // 2 - 4:H // 2 + 4, W // 2 - 8:W // 2 + 8, 0]
        return band.std(axis=1).mean()
    cs, cr = stripe_contrast(smooth), stripe_contrast(rough)
    assert cr < cs * 0.55, f"rough glass not blurrier: {cs:.2f} -> {cr:.2f}"


def test_two_layer_back_to_front_compositing():
    """Two stacked glass panes must BOTH tint the wall behind them (back-to-
    front bin compositing); v1's single nearest layer showed only one."""
    from hobbyrenderer_tpu.config import RenderingMode
    from hobbyrenderer_tpu.models.deferred import DeferredRenderer
    from hobbyrenderer_tpu.scene import Camera
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu

    def build(n_panes):
        sc = Scene()
        white = sc.add_material(Material(
            name="w", base_color=np.array([1, 1, 1, 1], np.float32),
            roughness=1.0))
        # strongly absorbing glass: each layer multiplies the background down
        glass = sc.add_material(Material(
            name="glass", base_color=np.array([1, 1, 1, 0.0], np.float32),
            roughness=0.05, alpha_mode=ALPHA_BLEND, transmission=1.0,
            attenuation_color=np.array([0.3, 0.3, 0.9], np.float32),
            attenuation_distance=2.0))
        pos, nrm, uv, idx = plane_geometry(1.5)
        pos_v = pos[:, [0, 2, 1]].astype(np.float32)
        nrm_v = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
        idx_v = idx.reshape(-1, 3)[:, ::-1].reshape(-1)
        wall = sc.add_mesh(cook_mesh(pos_v * 2, idx_v, normals=nrm_v, uvs=uv),
                           material=white)
        sc.add_node(Node(name="wall", mesh_primitives=[wall],
                         translation=np.array([0, 0, -1], np.float32)))
        for k in range(n_panes):
            pane = sc.add_mesh(cook_mesh(pos_v, idx_v, normals=nrm_v, uvs=uv),
                               material=glass)
            sc.add_node(Node(name=f"pane{k}", mesh_primitives=[pane],
                             translation=np.array([0, 0, 0.5 + k], np.float32)))
        sc.add_light(Light(type=LIGHT_DIRECTIONAL,
                           direction=np.array([0, -0.3, -1], np.float32),
                           intensity=4.0))
        sc.cameras.append(camera_looking_at(np.array([0, 0, 5], np.float32),
                                            np.zeros(3)))
        sc.finalize()
        gpu = build_scene_gpu(sc)
        cam = Camera(sc.cameras[0], W, H)
        cam.jitter_enabled = False
        r = DeferredRenderer(gpu, W, H, mode=RenderingMode.NORMAL_BASIC,
                             with_taa=False)
        ldr, _ = r.render(gpu, cam.view_constants(0),
                          RenderSettings().as_pytree())
        return np.asarray(ldr).astype(np.float32)

    one = build(1)[H // 2, W // 2]
    two = build(2)[H // 2, W // 2]
    # the second pane absorbs more red/green: center darkens noticeably
    assert two[:2].sum() < one[:2].sum() * 0.82, \
        f"second layer must attenuate further: one={one} two={two}"
