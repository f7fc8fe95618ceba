"""ReSTIR DI estimator correctness: with visibility off, the time-averaged
ReSTIR direct lighting must converge to the brute-force sum over all lights
(unbiasedness of streaming RIS + temporal/spatial reuse)."""

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.models.deferred import DeferredRenderer, initial_frame_state
from hobbyrenderer_tpu.ops import restir as restirops
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.scene import Camera
from hobbyrenderer_tpu.scene.cooker import cook_mesh
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.scene.procedural import camera_looking_at, plane_geometry
from hobbyrenderer_tpu.scene.scene import Light, LIGHT_POINT, Material, Node, Scene

W, H = 48, 32


def _many_light_scene(n_lights=12):
    sc = Scene()
    m = sc.add_material(Material(name="grey",
                                 base_color=np.array([0.7, 0.7, 0.7, 1], np.float32),
                                 roughness=0.7))
    pos, nrm, uv, idx = plane_geometry(6.0)
    prim = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=m)
    sc.add_node(Node(name="p", mesh_primitives=[prim]))
    rng = np.random.default_rng(5)
    for k in range(n_lights):
        sc.add_light(Light(type=LIGHT_POINT,
                           position=np.array([rng.uniform(-4, 4), rng.uniform(1, 3),
                                              rng.uniform(-4, 4)], np.float32),
                           color=rng.uniform(0.2, 1.0, 3).astype(np.float32),
                           intensity=float(rng.uniform(5, 30)),
                           range=50.0))
    sc.cameras.append(camera_looking_at(np.array([0, 4, 6], np.float32), np.zeros(3)))
    sc.finalize()
    return sc


def _gbuffer_fn(cap):
    def f(gpu, vc):
        cu = cullops.cull_pairs(gpu, vc, alpha_mask=jnp.asarray([True, True, False]))
        slots, _ = cullops.compact_mask(cu["mask"], cap)
        ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
        return rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)
    return f


def test_restir_converges_to_bruteforce():
    sc = _many_light_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    gb = jax.jit(_gbuffer_fn(max(int(gpu.lod0_pair_capacity), 1)))(gpu, vc)

    # brute force: sum over all lights, no shadows
    from hobbyrenderer_tpu.ops import sky as skyops
    vdir = skyops.view_dirs_from_pixels(vc, H, W)
    ref = shadeops.shade_all_lights(gpu, gb.world_pos, gb.normal, -vdir,
                                    gb.albedo, gb.orm[..., 2], gb.orm[..., 1])
    ref = np.asarray(jnp.where(gb.valid[..., None], ref, 0.0))

    step = jax.jit(lambda res, i: restirops.restir_di(
        gpu, None, gb, vc, settings, res, i, visibility=False))
    res = restirops.reservoir_init(H, W)
    acc = np.zeros((H, W, 3), np.float32)
    n_frames = 48
    for i in range(n_frames):
        direct, res = step(res, jnp.int32(i))
        acc += np.asarray(direct)
    avg = acc / n_frames

    valid = np.asarray(gb.valid)
    # relative error on the mean over lit pixels
    lit = valid & (ref.sum(-1) > 1e-3)
    rel = np.abs(avg[lit] - ref[lit]).sum() / (ref[lit].sum() + 1e-9)
    assert rel < 0.15, f"ReSTIR mean deviates {rel:.3f} from brute force"
    # per-pixel agreement within noise for most pixels
    per_px = np.abs(avg - ref).sum(-1) / np.maximum(ref.sum(-1), 1e-3)
    assert np.median(per_px[lit]) < 0.2


def test_restir_deferred_renders():
    """End-to-end: deferred graph with direct_mode=restir produces a frame."""
    sc = _many_light_scene(6)
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    settings = RenderSettings().as_pytree()
    r = DeferredRenderer(gpu, W, H, direct_mode="restir")
    for i in range(3):
        ldr, _ = r.render(gpu, cam.view_constants(i), settings)
    ldr = np.asarray(ldr)
    assert ldr.shape == (H, W, 3)
    assert (ldr.sum(-1) > 0).mean() > 0.5
    assert "restir_reservoir" in r.state


def test_boiling_filter_kills_outliers_only():
    """Ref RTXDI BoilingFilter: a reservoir whose w_sum dwarfs the local mean
    is reset; a uniform field passes through untouched."""
    import jax.numpy as jnp
    from hobbyrenderer_tpu.ops.restir import boiling_filter_mask
    H, W = 64, 96
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (H, W)).astype(np.float32))
    live = jnp.ones((H, W), bool)
    kill = np.asarray(boiling_filter_mask(w, live, mult=20.0))
    assert not kill.any(), "uniform field must not boil"
    w_hot = w.at[30, 40].set(500.0)
    kill = np.asarray(boiling_filter_mask(w_hot, live, mult=20.0))
    assert kill[30, 40], "outlier must be killed"
    assert kill.sum() == 1, f"only the outlier: {kill.sum()}"
    # dead reservoirs don't pollute the mean and are never killed
    live2 = live.at[30, 40].set(False)
    kill = np.asarray(boiling_filter_mask(w_hot, live2, mult=20.0))
    assert not kill.any()


def test_regir_grid_converges_to_bruteforce():
    """ReGIR-fed initial candidates (world-space cell reservoirs, ref RTXDI
    ReGIR) must stay unbiased: the time-averaged ReSTIR DI signal converges to
    the brute-force all-lights sum just like the power-tile path."""
    from hobbyrenderer_tpu.ops import regir as regirops
    sc = _many_light_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    gb = jax.jit(_gbuffer_fn(max(int(gpu.lod0_pair_capacity), 1)))(gpu, vc)

    from hobbyrenderer_tpu.ops import sky as skyops
    vdir = skyops.view_dirs_from_pixels(vc, H, W)
    ref = shadeops.shade_all_lights(gpu, gb.world_pos, gb.normal, -vdir,
                                    gb.albedo, gb.orm[..., 2], gb.orm[..., 1])
    ref = np.asarray(jnp.where(gb.valid[..., None], ref, 0.0))

    pool = restirops._fallback_pool(gpu)
    lo = jnp.asarray([-6.0, -1.0, -6.0])
    hi = jnp.asarray([6.0, 4.0, 6.0])

    def step_fn(res, i):
        grid = regirops.build_regir_grid(pool, lo, hi, i, dims=(6, 3, 6))
        return restirops.restir_di(gpu, None, gb, vc, settings, res, i,
                                   visibility=False, pool=pool,
                                   regir_grid=grid)

    step = jax.jit(step_fn)
    res = restirops.reservoir_init(H, W)
    acc = np.zeros((H, W, 3), np.float32)
    n_frames = 48
    for i in range(n_frames):
        direct, res = step(res, jnp.int32(i))
        acc += np.asarray(direct)
    avg = acc / n_frames

    valid = np.asarray(gb.valid)
    lit = valid & (ref.sum(-1) > 1e-3)
    rel = np.abs(avg[lit] - ref[lit]).sum() / (ref[lit].sum() + 1e-9)
    assert rel < 0.15, f"ReGIR ReSTIR mean deviates {rel:.3f} from brute force"
    per_px = np.abs(avg - ref).sum(-1) / np.maximum(ref.sum(-1), 1e-3)
    assert np.median(per_px[lit]) < 0.25


def test_regir_cell_lookup():
    from hobbyrenderer_tpu.ops import regir as regirops
    g = regirops.RegirGrid(rows=jnp.zeros((24, 128, 18)),
                           lo=jnp.asarray([0.0, 0.0, 0.0]),
                           inv_cell=jnp.asarray([1.0, 1.0, 1.0]),
                           dims=(4, 3, 2))
    p = jnp.asarray([[0.5, 0.5, 0.5],    # cell (0,0,0) -> 0
                     [3.5, 2.5, 1.5],    # cell (3,2,1) -> 3+4*(2+3*1) = 23
                     [9.0, 9.0, 9.0]])   # clamps to the last cell
    ok = jnp.asarray([True, True, True])
    got = np.asarray(regirops.cells_of_positions(g, p, ok))
    assert got.tolist() == [0, 23, 23], got
    got2 = np.asarray(regirops.cells_of_positions(g, p, jnp.asarray(
        [True, False, True])))
    assert got2[1] == 0


def test_regir_e2e_frame():
    """Full Normal-mode frame with --regir: compiles and lights the scene."""
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer
    cfg = Config(scene="stress:3", width=96, height=64,
                 mode=RenderingMode.NORMAL, direct_mode="restir", regir=True)
    r = Renderer(cfg)
    ldr = None
    for _ in range(2):
        ldr = r.render_frame()
    im = np.asarray(ldr)
    assert np.isfinite(im.astype(np.float64)).all()
    assert (im.sum(-1) > 0).mean() > 0.5


def test_reblur_profile_shrinks_kernel_with_history():
    """REBLUR-class profile: once history accumulates on a static scene, the
    kernel collapses toward the temporally-accumulated signal, preserving
    detail a fixed RELAX footprint blurs away."""
    import jax
    from hobbyrenderer_tpu.ops import denoise as dnops
    H_, W_ = 48, 64
    rng = np.random.default_rng(0)

    class GB:
        normal = jnp.asarray(np.tile([0, 0, 1.0], (H_, W_, 1)), jnp.float32)
        depth = jnp.ones((H_, W_), jnp.float32)
        motion = jnp.zeros((H_, W_, 2), jnp.float32)
        valid = jnp.ones((H_, W_), bool)

    gb = GB()
    # LOW-CONTRAST detail (amplitude ~ noise): luminance edge-stopping cannot
    # separate it from noise, so only the kernel footprint decides its fate
    yy, xx = np.mgrid[0:H_, 0:W_]
    checker = (((xx // 4) ^ (yy // 4)) & 1).astype(np.float32)
    base = np.tile((0.5 + 0.2 * checker)[..., None], (1, 1, 3))

    def run(profile, frames=24):
        st = dnops.denoise_init(H_, W_)
        for k in range(frames):
            noise = rng.normal(0, 0.25, (H_, W_, 3)).astype(np.float32)
            sig = jnp.asarray(np.maximum(base + noise, 0.0))
            out, st = dnops.denoise(sig, gb, st, profile=profile)
        return np.asarray(out)

    out_rb = run("reblur")
    rng = np.random.default_rng(0)
    out_rx = run("relax")
    # surviving checker contrast: white-cell mean minus black-cell mean
    def contrast(im):
        return float(im[..., 0][checker > 0.5].mean()
                     - im[..., 0][checker < 0.5].mean())
    c_rb, c_rx = contrast(out_rb), contrast(out_rx)
    assert c_rb > c_rx * 1.15, \
        f"reblur kernel never shrank: reblur {c_rb:.3f} vs relax {c_rx:.3f}"
    assert c_rb > 0.12, f"reblur lost the detail too: {c_rb:.3f}"


def test_emissive_visibility_not_self_shadowed():
    """Regression: the winner-visibility ray's t_max must account for the
    shadow-bias origin advance — it used to re-hit the target emissive
    surface and silently kill most area-light energy."""
    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    from hobbyrenderer_tpu.scene.cooker import cook_mesh
    from hobbyrenderer_tpu.scene.procedural import plane_geometry
    from hobbyrenderer_tpu.scene.scene import (Light, LIGHT_DIRECTIONAL,
                                               Material, Node)
    Wl, Hl = 48, 32
    sc = Scene()
    floor = sc.add_material(Material(
        name="floor", base_color=np.array([0.6, 0.6, 0.6, 1], np.float32),
        roughness=0.9, double_sided=True))
    lampm = sc.add_material(Material(
        name="lamp", emissive=np.array([4.0, 4.0, 4.0], np.float32),
        emissive_strength=10.0, double_sided=True))
    pos, nrm, uv, idx = plane_geometry(3.0)
    sc.add_node(Node(name="floor", mesh_primitives=[
        sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv),
                    material=floor)]))
    qpos, qnrm, quv, qidx = plane_geometry(1.0)
    sc.add_node(Node(name="lamp", mesh_primitives=[
        sc.add_mesh(cook_mesh(qpos, qidx, normals=-qnrm, uvs=quv),
                    material=lampm)],
        translation=np.array([0, 2.0, 0], np.float32)))
    sc.add_light(Light(type=LIGHT_DIRECTIONAL,
                       direction=np.array([0, -1, 0], np.float32),
                       intensity=0.0))
    sc.cameras.append(camera_looking_at(np.array([0, 1.0, 3.0], np.float32),
                                        np.zeros(3)))
    sc.finalize()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], Wl, Hl)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    cap = max(int(gpu.lod0_pair_capacity), 1)

    @jax.jit
    def gb_fn(g, v):
        cu = cullops.cull_pairs(g, v,
                                alpha_mask=jnp.asarray([True, True, False]))
        slots, _ = cullops.compact_mask(cu["mask"], cap)
        ro, aux = rasterops.rasterize(g, v, slots, Wl, Hl)
        return rasterops.resolve_gbuffer(g, v, ro, slots, aux=aux)

    gb = gb_fn(gpu, vc)

    def run(vis):
        res = restirops.reservoir_init(Hl, Wl)
        f = jax.jit(lambda rr, i: restirops.restir_di(
            gpu, rt, gb, vc, settings, rr, i, visibility=vis))
        acc = np.zeros((Hl, Wl, 3))
        for i in range(24):
            d, res = f(res, jnp.int32(i))
            acc += np.asarray(d)
        return acc / 24

    with_vis = run(True)
    no_vis = run(False)
    lit = np.asarray(gb.valid) & (no_vis.sum(-1) > 0.05)
    assert lit.sum() > 50
    ratio = with_vis[lit].sum() / no_vis[lit].sum()
    # nothing occludes the floor-to-lamp paths: visibility must keep nearly
    # all the energy (it kept < 30% before the fix)
    assert ratio > 0.8, f"visibility self-shadowing: kept {ratio:.2f}"


def test_restir_checkerboard_converges():
    """Checkerboard mode (ref rtxdi::CheckerboardMode): fresh candidates on a
    frame-alternating half grid, off-parity pixels carried by temporal reuse
    — the time-average must STILL converge to brute force (the estimator
    stays unbiased, only the per-frame sample budget halves)."""
    sc = _many_light_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    gb = jax.jit(_gbuffer_fn(max(int(gpu.lod0_pair_capacity), 1)))(gpu, vc)

    from hobbyrenderer_tpu.ops import sky as skyops
    vdir = skyops.view_dirs_from_pixels(vc, H, W)
    ref = shadeops.shade_all_lights(gpu, gb.world_pos, gb.normal, -vdir,
                                    gb.albedo, gb.orm[..., 2], gb.orm[..., 1])
    ref = np.asarray(jnp.where(gb.valid[..., None], ref, 0.0))

    step = jax.jit(lambda res, i: restirops.restir_di(
        gpu, None, gb, vc, settings, res, i, visibility=False,
        checkerboard=True))
    res = restirops.reservoir_init(H, W)
    acc = np.zeros((H, W, 3), np.float32)
    n_frames = 48
    for i in range(n_frames):
        direct, res = step(res, jnp.int32(i))
        acc += np.asarray(direct)
    avg = acc / n_frames

    valid = np.asarray(gb.valid)
    lit = valid & (ref.sum(-1) > 1e-3)
    rel = np.abs(avg[lit] - ref[lit]).sum() / (ref[lit].sum() + 1e-9)
    assert rel < 0.15, f"checkerboard ReSTIR deviates {rel:.3f}"
    # after the first two frames every lit pixel must carry a reservoir
    assert (np.asarray(res.M)[lit.reshape(H, W)] > 0).mean() > 0.99


def test_restir_quality_presets_render():
    """The three RTXDI-style presets (ref RTXDIRenderer.cpp:96-247) all
    produce finite frames through the deferred graph and agree with each
    other in the mean (same estimator, different budgets)."""
    sc = _many_light_scene(6)
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    settings = RenderSettings().as_pytree()

    class _Cfg:
        pass

    means = {}
    for q in ("highperf", "balanced", "highquality"):
        cfg = _Cfg()
        cfg.restir_quality = q
        r = DeferredRenderer(gpu, W, H, direct_mode="restir", config=cfg)
        acc = None
        for i in range(14):
            # advance the frame index: the checkerboard parity alternates on
            # vc["frame_index"] (a frozen index would leave half the pixels
            # forever un-traced)
            ldr, _ = r.render(gpu, cam.view_constants(i), settings)
            if i < 6:     # warm-up: checkerboard starts half-empty, TAA fills
                continue
            a = np.asarray(ldr).astype(np.float32)
            acc = a if acc is None else acc + a
        means[q] = (acc / 8).mean()
        assert np.isfinite(acc).all()
    base = means["balanced"]
    for q, m in means.items():
        assert abs(m - base) / max(base, 1e-3) < 0.1, \
            f"preset {q} mean {m:.2f} vs balanced {base:.2f}"


def test_regir_onion_lookup_roundtrip():
    """Onion cells (ref rtxdi::ReGIRMode::Onion): every cell's own
    representative point must map back to that cell id, and radial lookups
    land in the right layer band (detail linear, coverage geometric)."""
    import jax.numpy as jnp
    from hobbyrenderer_tpu.ops import regir as regirops
    cam = jnp.asarray([1.0, 2.0, -3.0])
    dims = (5, 10, 12, 6)
    r_detail = jnp.asarray(3.0)
    r_max = jnp.asarray(20.0)
    centers = regirops._onion_centers(cam, r_detail, r_max, dims)
    C = centers.shape[0]
    g = regirops.RegirGrid(rows=jnp.zeros((C, 128, 18)), lo=cam,
                           inv_cell=jnp.ones(3), dims=(0, 0, 0),
                           mode="onion", cam=cam, onion_dims=dims,
                           r_detail=r_detail, r_max=r_max)
    cid = regirops.cells_of_positions(g, centers, jnp.ones((C,), bool))
    np.testing.assert_array_equal(np.asarray(cid), np.arange(C))


def test_regir_onion_restir_converges():
    """ReSTIR with the ONION ReGIR grid stays unbiased (mirrors the uniform
    grid convergence test; the cell layout must not skew the estimator)."""
    from hobbyrenderer_tpu.ops import regir as regirops
    sc = _many_light_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    gb = jax.jit(_gbuffer_fn(max(int(gpu.lod0_pair_capacity), 1)))(gpu, vc)

    from hobbyrenderer_tpu.ops import sky as skyops
    vdir = skyops.view_dirs_from_pixels(vc, H, W)
    ref = shadeops.shade_all_lights(gpu, gb.world_pos, gb.normal, -vdir,
                                    gb.albedo, gb.orm[..., 2], gb.orm[..., 1])
    ref = np.asarray(jnp.where(gb.valid[..., None], ref, 0.0))

    pool = restirops._fallback_pool(gpu)

    def step_fn(res, i):
        grid = regirops.build_regir_onion(pool, vc["camera_pos"], 10.0, i,
                                          onion_dims=(3, 5, 8, 4))
        return restirops.restir_di(gpu, None, gb, vc, settings, res, i,
                                   visibility=False, pool=pool,
                                   regir_grid=grid)

    step = jax.jit(step_fn)
    res = restirops.reservoir_init(H, W)
    acc = np.zeros((H, W, 3), np.float32)
    n_frames = 48
    for i in range(n_frames):
        direct, res = step(res, jnp.int32(i))
        acc += np.asarray(direct)
    avg = acc / n_frames

    valid = np.asarray(gb.valid)
    lit = valid & (ref.sum(-1) > 1e-3)
    rel = np.abs(avg[lit] - ref[lit]).sum() / (ref[lit].sum() + 1e-9)
    assert rel < 0.15, f"onion ReGIR deviates {rel:.3f} from brute force"


def test_reduced_rate_visibility_matches_full_rate(monkeypatch):
    """vis_scale=2 (preset di_vis_scale): the traced subgrid + same-winner
    reuse + exact mismatch re-trace must stay CLOSE to full-rate visibility
    (the reuse offset is <= 2 px; only shadow-edge pixels may differ). The
    path is resolution-gated in production; the test patches the gate."""
    import hobbyrenderer_tpu.ops.restir as restirmod

    from tests.test_restir_kernel import _scene as _ksc
    sc = _ksc()
    from hobbyrenderer_tpu.config import RenderSettings
    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    from hobbyrenderer_tpu.ops import culling as cullops
    from hobbyrenderer_tpu.ops import raster as rasterops
    from hobbyrenderer_tpu.scene import Camera
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu

    W2, H2 = 48, 32
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W2, H2)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    cap = max(int(gpu.lod0_pair_capacity), 1)
    cu = cullops.cull_pairs(gpu, vc,
                            alpha_mask=jnp.asarray([True, True, False]))
    slots, _ = cullops.compact_mask(cu["mask"], cap)
    ro, aux = rasterops.rasterize(gpu, vc, slots, W2, H2)
    gb = rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)
    prev = restirmod.reservoir_init(H2, W2)

    full, _ = restirmod.restir_di(gpu, rt, gb, vc, settings, prev,
                                  jnp.int32(5), visibility=True)
    monkeypatch.setattr(restirmod, "VIS_SCALE_MIN_DIM", 8)
    half, _ = restirmod.restir_di(gpu, rt, gb, vc, settings, prev,
                                  jnp.int32(5), visibility=True, vis_scale=2)
    a, b = np.asarray(full), np.asarray(half)
    # identical RNG chain => reservoirs equal; only occlusion bits at
    # shadow-edge reuse pixels may flip. Require close agreement.
    denom = np.abs(a).sum() + 1e-6
    rel = np.abs(a - b).sum() / denom
    assert rel < 0.12, f"reduced-rate visibility diverges: {rel:.4f}"
    frac_diff = (np.abs(a - b).max(-1) > 1e-4).mean()
    assert frac_diff < 0.25, f"too many pixels differ: {frac_diff:.3f}"
