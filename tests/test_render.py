"""End-to-end render tests: deferred slice + path tracer oracles (SURVEY.md §4:
in-memory scenes through single frames; deterministic accumulation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbyrenderer_tpu.config import Config, RenderSettings, RenderingMode
from hobbyrenderer_tpu.graph.rendergraph import AccessError, FrameContext, RenderGraph, render_pass
from hobbyrenderer_tpu.models.deferred import DeferredRenderer
from hobbyrenderer_tpu.models.pathtracer import PathTracerRenderer, build_scene_rt, trace_paths
from hobbyrenderer_tpu.scene import Camera, make_default_cube_scene
from hobbyrenderer_tpu.scene.cooker import cook_mesh
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.scene.procedural import (camera_looking_at, plane_geometry,
                                                sphere_geometry, cube_geometry)
from hobbyrenderer_tpu.scene.scene import Light, LIGHT_DIRECTIONAL, Material, Node, Scene

W, H = 96, 64


def _cube_setup():
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    return sc, gpu, cam


def test_deferred_cube_end_to_end():
    sc, gpu, cam = _cube_setup()
    settings = RenderSettings().as_pytree()
    r = DeferredRenderer(gpu, W, H)
    ldr, overflow = r.render(gpu, cam.view_constants(0), settings)
    ldr = np.asarray(ldr)
    assert ldr.shape == (H, W, 3) and ldr.dtype == np.uint8
    assert int(overflow) == 0
    # cube occupies the middle: significantly brighter than sky-only corners
    mid = ldr[H // 2 - 8:H // 2 + 8, W // 2 - 8:W // 2 + 8].mean()
    assert mid > 0
    # determinism
    r2 = DeferredRenderer(gpu, W, H)
    ldr2, _ = r2.render(gpu, cam.view_constants(0), settings)
    np.testing.assert_array_equal(ldr, np.asarray(ldr2))


def test_deferred_depth_occlusion():
    """Two quads, nearer one must win the depth test."""
    sc = Scene()
    red = sc.add_material(Material(name="red", base_color=np.array([1, 0, 0, 1], np.float32),
                                   roughness=1.0))
    blue = sc.add_material(Material(name="blue", base_color=np.array([0, 0, 1, 1], np.float32),
                                    roughness=1.0))
    pos, nrm, uv, idx = plane_geometry(1.0)
    # vertical quads facing +z (rotate plane: swap y/z)
    pos_v = pos[:, [0, 2, 1]].astype(np.float32)
    nrm_v = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    # plane_geometry winding faces +y; after swap it faces -z, so flip winding
    idx_v = idx.reshape(-1, 3)[:, ::-1].reshape(-1)
    near = sc.add_mesh(cook_mesh(pos_v, idx_v, normals=nrm_v, uvs=uv), material=red)
    far = sc.add_mesh(cook_mesh(pos_v * 3.0, idx_v, normals=nrm_v, uvs=uv), material=blue)
    sc.add_node(Node(name="near", mesh_primitives=[near],
                     translation=np.array([0, 0, 1.0], np.float32)))
    sc.add_node(Node(name="far", mesh_primitives=[far],
                     translation=np.array([0, 0, -1.0], np.float32)))
    sc.cameras.append(camera_looking_at(np.array([0, 0, 5], np.float32), np.zeros(3)))
    sc.finalize()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    s = RenderSettings()
    s.ambient_scale = 10.0  # make colors obvious
    r = DeferredRenderer(gpu, W, H)
    ldr, _ = r.render(gpu, cam.view_constants(0), s.as_pytree())
    ldr = np.asarray(ldr).astype(np.int32)
    center = ldr[H // 2, W // 2]
    assert center[0] > center[2] + 10, f"near red quad must occlude far blue: {center}"
    corner_px = ldr[2, 2]
    assert corner_px[2] > corner_px[0], f"far blue visible around the near quad: {corner_px}"


def test_rendergraph_validation():
    g = RenderGraph()

    @g.add
    @render_pass("A", writes=("x",))
    def _a(ctx, res):
        res["x"] = jnp.zeros(4)

    @g.add
    @render_pass("B", reads=("x",), writes=("y",))
    def _b(ctx, res):
        res["y"] = res["x"] + 1
        with pytest.raises(AccessError):
            res["z"]          # undeclared read
        with pytest.raises(AccessError):
            res["x"] = res["y"]  # undeclared write

    ctx = FrameContext(gpu=None, vc={}, settings=None, config=None)
    out = g.execute(ctx, {}, outputs=("y",))
    np.testing.assert_array_equal(np.asarray(out["outputs"]["y"]), np.ones(4))
    with pytest.raises(AccessError):
        g.execute(ctx, {}, outputs=("nope",))


def _furnace_scene(albedo=1.0):
    sc = Scene()
    white = sc.add_material(Material(name="white",
                                     base_color=np.array([albedo] * 3 + [1], np.float32),
                                     metallic=0.0, roughness=1.0))
    pos, nrm, uv, idx = sphere_geometry(0.5, 12, 16)
    prim = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=white)
    sc.add_node(Node(name="s", mesh_primitives=[prim]))
    sc.cameras.append(camera_looking_at(np.array([0, 0, 2.2], np.float32), np.zeros(3)))
    # a zero-intensity sun so NEE samples contribute nothing
    sc.add_light(Light(type=LIGHT_DIRECTIONAL, intensity=0.0))
    sc.finalize()
    return sc


def test_spp_batched_equals_consecutive_frames():
    """An spp=N wavefront must average EXACTLY the N consecutive spp=1
    frames it batches (sample s of frame a draws stream a*N+s) — the
    deterministic-accumulation contract of the widened-wavefront path."""
    sc = _furnace_scene(0.6)
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], 48, 32)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    sky_fn = lambda d, bounce: jnp.full((d.shape[0], 3), 0.5)
    import jax
    one = jax.jit(lambda i: trace_paths(gpu, rt, vc, settings, 32, 48, i,
                                        max_bounces=4, sky_fn=sky_fn))
    batched = jax.jit(lambda i: trace_paths(gpu, rt, vc, settings, 32, 48, i,
                                            max_bounces=4, sky_fn=sky_fn,
                                            spp=3))
    want = (np.asarray(one(jnp.int32(0))) + np.asarray(one(jnp.int32(1)))
            + np.asarray(one(jnp.int32(2)))) / 3.0
    got = np.asarray(batched(jnp.int32(0)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_furnace_white_sphere():
    """Convex albedo-1 Lambertian sphere under constant env = invisible (energy
    conservation oracle for BVH + attrs + cosine sampling + RR)."""
    sc = _furnace_scene(1.0)
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], 48, 32)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    Lsky = 0.5
    sky_fn = lambda d, bounce: jnp.full((d.shape[0], 3), Lsky)
    import jax
    step = jax.jit(lambda i: trace_paths(gpu, rt, vc, settings, 32, 48, i,
                                         max_bounces=12, rr_start=3,
                                         sky_fn=sky_fn))
    acc = 0.0
    n_s = 6
    for i in range(n_s):
        acc = acc + np.asarray(step(jnp.int32(i))).reshape(32, 48, 3)
    img = acc / n_s
    err = np.abs(img - Lsky) / Lsky
    assert err.mean() < 0.05, f"furnace mean err {err.mean():.3f}"
    assert np.median(err) < 0.04


def test_pt_direct_lighting_analytic():
    """White plane + straight-down sun, black sky: pixel = albedo/pi * intensity."""
    sc = Scene()
    a = 0.6
    m = sc.add_material(Material(name="w", base_color=np.array([a, a, a, 1], np.float32),
                                 metallic=0.0, roughness=1.0))
    pos, nrm, uv, idx = plane_geometry(50.0)
    prim = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=m)
    sc.add_node(Node(name="p", mesh_primitives=[prim]))
    I = 3.0
    sc.add_light(Light(type=LIGHT_DIRECTIONAL, direction=np.array([0, -1, 0], np.float32),
                       intensity=I))
    sc.cameras.append(camera_looking_at(np.array([0, 3, 0.1], np.float32), np.zeros(3)))
    sc.finalize()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], 32, 24)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    st = RenderSettings()
    st.sun_angular_radius = 1e-4  # near-delta sun
    settings = st.as_pytree()
    sky_fn = lambda d, bounce: jnp.zeros((d.shape[0], 3))
    import jax
    step = jax.jit(lambda i: trace_paths(gpu, rt, vc, settings, 24, 32, i,
                                         max_bounces=2, sky_fn=sky_fn))
    img = np.asarray(step(jnp.int32(0))).reshape(24, 32, 3)
    # expected diffuse radiance (specular adds a little at grazing; center is fine)
    expected = a / np.pi * I
    center = img[12, 16]
    # GGX at roughness 1 still adds some specular energy; allow 15%
    assert abs(center.mean() - expected) / expected < 0.18, (center, expected)


def test_pt_deterministic():
    sc = _furnace_scene(0.5)
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], 24, 16)
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    import jax
    step = jax.jit(lambda i: trace_paths(gpu, rt, vc, settings, 16, 24, i,
                                         max_bounces=3))
    a = np.asarray(step(jnp.int32(3)))
    b = np.asarray(step(jnp.int32(3)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(step(jnp.int32(4)))
    assert not np.array_equal(a, c), "different accumulation index -> different sample"


def test_furnace_glass_sphere():
    """Transmissive albedo-1 sphere (clear glass, atten=1) under constant env:
    energy conservation must hold through refraction + Fresnel reflection."""
    import jax
    sc = _furnace_scene(1.0)
    sc.materials[1].transmission = 1.0
    sc.materials[1].ior = 1.5
    sc.materials[1].attenuation_color = np.ones(3, np.float32)
    sc.materials[1].attenuation_distance = 1e6
    sc.materials[1].roughness = 0.05
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu as _b
    gpu = _b(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], 48, 32)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    Lsky = 0.5
    sky_fn = lambda d, bounce: jnp.full((d.shape[0], 3), Lsky)
    step = jax.jit(lambda i: trace_paths(gpu, rt, vc, settings, 32, 48, i,
                                         max_bounces=16, rr_start=6,
                                         sky_fn=sky_fn))
    acc = 0.0
    n_s = 8
    for i in range(n_s):
        acc = acc + np.asarray(step(jnp.int32(i))).reshape(32, 48, 3)
    img = acc / n_s
    err = np.abs(img - Lsky) / Lsky
    # refraction paths are longer; allow a looser tolerance than the diffuse furnace
    assert err.mean() < 0.12, f"glass furnace mean err {err.mean():.3f}"


def test_two_phase_occlusion_no_popping():
    """Two-phase HZB culling must produce the SAME image as no culling once
    the pyramid is warm (phase 2 re-tests last frame's occludees against the
    fresh HZB — ref GPUCulling.hlsl:9-21, BasePassRenderer.cpp:816-845)."""
    from hobbyrenderer_tpu.scene.procedural import (camera_looking_at,
                                                    make_stress_scene,
                                                    plane_geometry)
    from hobbyrenderer_tpu.scene.cooker import cook_mesh
    from hobbyrenderer_tpu.scene.scene import Material, Node
    sc = make_stress_scene(grid=4)
    # a wall between the camera and the grid: real occlusion work
    import numpy as _np
    wallm = sc.add_material(Material(name="wall", roughness=0.9, double_sided=True))
    pos, nrm, uv, idx = plane_geometry(8.0)
    s45 = _np.float32(_np.sin(_np.pi / 4))
    prim = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=wallm)
    sc.add_node(Node(name="wall", mesh_primitives=[prim],
                     translation=_np.array([0, 4.0, 5.0], _np.float32),
                     rotation=_np.array([-s45, 0, 0, s45], _np.float32)))
    sc.cameras.append(camera_looking_at(_np.array([0, 3, 9], _np.float32),
                                        _np.array([0, 2, 0], _np.float32)))
    sc.finalize()
    gpu = build_scene_gpu(sc)
    W2, H2 = 96, 64
    cam = Camera(sc.cameras[-1], W2, H2)
    cam.jitter_enabled = False
    s = RenderSettings().as_pytree()

    r_off = DeferredRenderer(gpu, W2, H2, mode=RenderingMode.NORMAL_BASIC,
                             occlusion_culling=False, with_taa=False)
    r_on = DeferredRenderer(gpu, W2, H2, mode=RenderingMode.NORMAL_BASIC,
                            occlusion_culling=True, with_taa=False)
    for i in range(2):   # frame 2 uses frame 1's HZB in phase 1
        vc = cam.view_constants(0)
        ldr_off, _ = r_off.render(gpu, vc, s)
        ldr_on, _ = r_on.render(gpu, vc, s)
    a = np.asarray(ldr_off).astype(np.int32)
    b = np.asarray(ldr_on).astype(np.int32)
    assert np.abs(a - b).max() <= 1, \
        f"occlusion culling changed the image (max diff {np.abs(a-b).max()})"
    # and it actually culls something on this scene
    stats = r_on.last_stats
    assert int(np.asarray(stats["occluded_pairs"])) > 0


def test_env_brdf_fit_matches_lut():
    """The gather-free analytic split-sum fit must track the GGX-integrated
    BRDF LUT (CommonResources analogue) across (NdotV, roughness)."""
    import jax.numpy as jnp
    from hobbyrenderer_tpu.ops import ibl as iblops
    lut = iblops.build_brdf_lut(res=32, samples=256)      # (32, 32, 2)
    ndv = (np.arange(32, dtype=np.float32) + 0.5) / 32
    rough = (np.arange(32, dtype=np.float32) + 0.5) / 32
    NV, RG = np.meshgrid(ndv, rough, indexing="ij")
    A, B = iblops.env_brdf(jnp.asarray(NV), jnp.asarray(RG))
    errA = np.abs(np.asarray(A) - lut[..., 0])
    errB = np.abs(np.asarray(B) - lut[..., 1])
    assert errA.mean() < 0.02 and errB.mean() < 0.02, \
        f"fit drift: A {errA.mean():.4f} B {errB.mean():.4f}"
    assert errA.max() < 0.08 and errB.max() < 0.08, \
        f"fit outlier: A {errA.max():.4f} B {errB.max():.4f}"
    # physical sanity: energy term in [0, 1.1], bias small for smooth surfaces
    assert lut[..., 0].max() <= 1.1 and lut[..., 0].min() >= 0.0


def test_pt_emissive_nee_matches_quadrature():
    """Emissive-triangle NEE + BRDF-hit MIS must converge to the analytic
    direct-lighting integral: a diffuse plane under an emissive quad, no sky.
    The expected value is a numpy quadrature of the SAME BRDF integrand over
    the quad's area, so any double count or missing MIS half fails loudly."""
    import jax
    import jax.numpy as jnp
    from hobbyrenderer_tpu.config import RenderSettings
    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt, trace_paths
    from hobbyrenderer_tpu.ops import shading as shadeops
    from hobbyrenderer_tpu.scene import Camera
    from hobbyrenderer_tpu.scene.cooker import cook_mesh
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import (camera_looking_at,
                                                    plane_geometry)
    from hobbyrenderer_tpu.scene.scene import Material, Node, Scene

    from hobbyrenderer_tpu.scene.scene import Light, LIGHT_DIRECTIONAL
    W, H = 16, 12
    sc = Scene()
    # low albedo bounds the 2nd-bounce indirect (not in the quadrature) to ~2%
    floor_alb = np.array([0.25, 0.2, 0.15], np.float32)
    floor_m = sc.add_material(Material(
        name="floor", base_color=np.concatenate([floor_alb, [1.0]]).astype(
            np.float32),
        roughness=0.9, double_sided=True))
    em_m = sc.add_material(Material(
        name="lamp", base_color=np.array([0, 0, 0, 1], np.float32),
        emissive=np.array([4.0, 3.0, 2.0], np.float32), double_sided=True))
    pos, nrm, uv, idx = plane_geometry(4.0)
    floor = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv),
                        material=floor_m)
    sc.add_node(Node(name="floor", mesh_primitives=[floor]))
    qpos, qnrm, quv, qidx = plane_geometry(1.0)
    lamp = sc.add_mesh(cook_mesh(qpos, qidx, normals=-qnrm, uvs=quv),
                       material=em_m)
    sc.add_node(Node(name="lamp", mesh_primitives=[lamp],
                     translation=np.array([0, 2.0, 0], np.float32)))
    sc.cameras.append(camera_looking_at(np.array([0, 1.2, 2.5], np.float32),
                                        np.zeros(3)))
    # zero-intensity sun suppresses the implicit default light
    sc.add_light(Light(type=LIGHT_DIRECTIONAL,
                       direction=np.array([0, -1, 0], np.float32),
                       intensity=0.0))
    sc.finalize()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    zero_sky = lambda d, b: jnp.zeros(d.shape[:-1] + (3,))

    # TWO bounces: bounce 0 contributes the NEE half, bounce 1 the MIS
    # complement (BRDF rays that land on the lamp) — dropping either half
    # fails the quadrature check well outside tolerance
    step = jax.jit(lambda k: trace_paths(
        gpu, rt, vc, settings, H, W, k, max_bounces=2, rr_start=8,
        sky_fn=zero_sky))
    N = 600
    acc = np.zeros((H * W, 3), np.float64)
    for k in range(N):
        acc += np.asarray(step(jnp.int32(k)), np.float64)
    img = (acc / N).reshape(H, W, 3)

    # expected at the plane point under the center pixel: quadrature of
    # f(x, L) * Le * cos_l / d^2 over the quad's area
    px, py = W // 2, H // 2 + 2          # a floor pixel below the lamp
    inv_vp = np.asarray(vc["inv_view_proj"], np.float64)
    ndc = np.array([(px + 0.5) / W * 2 - 1, 1 - 2 * (py + 0.5) / H])
    pn = inv_vp @ np.array([ndc[0], ndc[1], 0.5, 1.0])
    pf = inv_vp @ np.array([ndc[0], ndc[1], 1e-6, 1.0])
    a_, b_ = pn[:3] / pn[3], pf[:3] / pf[3]
    dirv = (b_ - a_) / np.linalg.norm(b_ - a_)
    campos = np.asarray(vc["camera_pos"], np.float64)
    t_hit = -campos[1] / dirv[1]
    x = campos + dirv * t_hit            # floor point (y = 0)
    assert abs(x[1]) < 1e-5 and abs(x[0]) < 1.9 and abs(x[2]) < 1.9

    M = 64
    g = (np.arange(M) + 0.5) / M
    # plane_geometry(half) spans [-half, half]: the lamp quad is 2x2
    qx, qz = np.meshgrid(g * 2.0 - 1.0, g * 2.0 - 1.0)
    qp = np.stack([qx.ravel(), np.full(M * M, 2.0), qz.ravel()], -1)
    to_l = qp - x
    d2 = (to_l ** 2).sum(-1)
    Lw = to_l / np.sqrt(d2)[:, None]
    cos_l = np.abs(Lw[:, 1])            # quad normal = +-y
    v = -dirv
    nrm_f = np.array([0.0, 1.0, 0.0])
    f = np.asarray(shadeops.eval_brdf(
        jnp.asarray(np.tile(nrm_f, (M * M, 1)), jnp.float32),
        jnp.asarray(np.tile(v, (M * M, 1)), jnp.float32),
        jnp.asarray(Lw, jnp.float32),
        jnp.asarray(np.tile(floor_alb, (M * M, 1)), jnp.float32),
        jnp.zeros(M * M), jnp.full(M * M, 0.9)), np.float64)
    Le = np.array([4.0, 3.0, 2.0])
    dA = (2.0 * 2.0) / (M * M)
    expect = (f * Le[None, :] * (cos_l / d2)[:, None]).sum(0) * dA
    got = img[py, px].astype(np.float64)
    rel = (got - expect) / np.maximum(expect, 1e-6)
    # small positive drift allowed: the 2nd-bounce indirect isn't in the
    # quadrature; anything beyond ~10% means a broken MIS half
    assert -0.06 < rel.min() and rel.max() < 0.12, \
        f"PT {got} vs quadrature {expect} (rel {rel})"


def test_taau_upscale_converges_to_native():
    """TAA UPSCALING (FSR3 upscaler capability): a static scene rendered at
    0.5x with --render-scale must converge toward the native render as jitter
    sweeps sub-pixel positions — far closer than a single upscaled frame."""
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer

    W, H = 128, 96
    cfg_u = Config(scene="cube", width=W, height=H, render_scale=0.5,
                   mode=RenderingMode.NORMAL_BASIC)
    r_u = Renderer(cfg_u)
    first = np.asarray(r_u.render_frame()).astype(np.float64)
    assert first.shape == (H, W, 3), first.shape
    for _ in range(40):
        up = np.asarray(r_u.render_frame()).astype(np.float64)

    cfg_n = Config(scene="cube", width=W, height=H,
                   mode=RenderingMode.NORMAL_BASIC)
    r_n = Renderer(cfg_n)
    for _ in range(41):
        native = np.asarray(r_n.render_frame()).astype(np.float64)

    rmse_conv = np.sqrt(((up - native) ** 2).mean())
    rmse_first = np.sqrt(((first - native) ** 2).mean())
    assert rmse_conv < rmse_first * 0.65, \
        f"TAAU never converged: first {rmse_first:.2f} -> {rmse_conv:.2f}"
    assert rmse_conv < 14.0, f"converged TAAU too far from native: {rmse_conv}"


def test_high_res_tile_boundaries():
    """Production-scale raster sanity (VERDICT-r2 weak #9: estimator tests at
    32-96 px never cross the 1080p-class tile/padding boundaries): one
    NormalBasic frame at 1024x512 on the dense stress scene — capacities,
    phase-2 re-raster, HZB mip chain and worklist padding must all hold up
    with NO overflow and no dead bands at tile seams."""
    import numpy as np
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer

    W, H = 1024, 512
    cfg = Config(scene="stress:6", width=W, height=H,
                 mode=RenderingMode.NORMAL_BASIC, cache_dir=".hr_cache_test")
    r = Renderer(cfg)
    r.camera.jitter_enabled = False
    for _ in range(2):   # frame 2 exercises phase-2 occlusion re-raster
        ldr = r.render_frame(dt=0.0)
    img = np.asarray(ldr)
    assert img.shape == (H, W, 3)
    assert np.isfinite(img.astype(np.float32)).all()
    s = r.stats()
    assert s.get("raster_overflow", 0) == 0, s
    # geometry covers a healthy fraction of the frame (a tile-boundary bug
    # shows up as black 32px bands: check every 32-row stripe has content)
    lit = (img.astype(np.int32).sum(-1) > 8)
    stripe = lit.reshape(H // 32, 32, W).mean((1, 2))
    assert (stripe > 0.5).all(), f"dead tile stripes: {stripe.round(2)}"
    r.shutdown()
