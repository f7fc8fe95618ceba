"""Traced specular indirect (ops/specular.py): mirrors show emitters, the
estimator agrees with brute-force VNDF integration on glossy surfaces, and
the split-sum handoff weight behaves (ref BrdfRayTracing +
ShadeSecondarySurfaces, src/RTXDIRenderer.cpp:2218-2235)."""

import numpy as np
import jax.numpy as jnp

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import specular as specops
from hobbyrenderer_tpu.scene.cooker import cook_mesh
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.scene.procedural import (camera_looking_at,
                                                plane_geometry)
from hobbyrenderer_tpu.scene.scene import Material, Node, Scene

W, H = 48, 32


def _mirror_scene(roughness: float = 0.0):
    """Reflective ground + a RED emissive panel hanging above, tilted to face
    the floor; nothing lights the floor directly except the panel."""
    sc = Scene()
    mirror = sc.add_material(Material(
        name="mirror", base_color=np.array([1, 1, 1, 1], np.float32),
        metallic=1.0, roughness=roughness))
    red = sc.add_material(Material(
        name="panel", base_color=np.array([0, 0, 0, 1], np.float32),
        emissive=np.array([4.0, 0.2, 0.2], np.float32), double_sided=True))
    pos, nrm, uv, idx = plane_geometry(6.0)
    ground = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv),
                         material=mirror)
    sc.add_node(Node(name="ground", mesh_primitives=[ground]))
    panel = sc.add_mesh(cook_mesh(pos * 0.4, idx, normals=nrm, uvs=uv),
                        material=red)
    # flipped to face down (rotate pi about x)
    sc.add_node(Node(name="panel", mesh_primitives=[panel],
                     translation=np.array([0, 2.5, 0], np.float32),
                     rotation=np.array([1, 0, 0, 0], np.float32)))
    sc.cameras.append(camera_looking_at(np.array([0, 3.0, 4.5], np.float32),
                                        np.zeros(3)))
    sc.finalize()
    return sc


def _gbuffer(gpu, vc, cap):
    cu = cullops.cull_pairs(gpu, vc,
                            alpha_mask=jnp.asarray([True, True, False]))
    slots, _ = cullops.compact_mask(cu["mask"], cap)
    ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
    return rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)


def _run_frames(sc, n_frames: int, roughness: float):
    from hobbyrenderer_tpu.scene import Camera
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    settings = RenderSettings().as_pytree()
    cap = int(gpu.lod0_pair_capacity)
    st = specops.spec_state_init(H, W)
    acc = None
    for f in range(n_frames):
        vc = cam.view_constants(f)
        gb = _gbuffer(gpu, vc, cap)
        # include_env_miss=False: these scenes probe reflected GEOMETRY; the
        # sky term is covered by test_envmap / the deferred e2e tests
        spec, wgt, st = specops.specular_indirect(
            gpu, rt, gb, vc, settings, st, f,
            sun_dir=jnp.asarray([0.0, 1.0, 0.0]), include_env_miss=False)
        acc = spec if acc is None else acc + spec
    return np.asarray(acc) / n_frames, np.asarray(wgt), gb


def test_mirror_shows_emissive_panel():
    """A delta mirror floor must reflect the red panel hanging above it —
    red dominant, nonzero, and confined to floor pixels."""
    sc = _mirror_scene(roughness=0.0)
    spec, wgt, gb = _run_frames(sc, 4, 0.0)
    valid = np.asarray(gb.valid)
    # panel pixels (the emitter itself) have no reflection; look at the floor
    floor = valid & (np.asarray(gb.orm[..., 2]) > 0.5)
    assert floor.sum() > 50
    r = spec[..., 0][floor]
    g = spec[..., 1][floor]
    assert r.max() > 0.2, "mirror floor lost the emissive panel"
    bright = r > 0.5 * r.max()
    assert (r[bright] > 2.0 * np.maximum(g[bright], 1e-6)).mean() > 0.9, \
        "reflection should be red-dominant"
    # blend weight: mirror pixels fully replace split-sum
    assert wgt[floor].min() > 0.99


def test_glossy_estimator_matches_bruteforce():
    """Time-averaged traced specular on a rough-0.35 metal floor vs a
    256-sample VNDF MC estimate at a probe pixel."""
    import jax
    from hobbyrenderer_tpu.ops import sampling as smp
    from hobbyrenderer_tpu.ops import trace as traceops
    from hobbyrenderer_tpu.ops.shading import brdf_params, fresnel_schlick
    from hobbyrenderer_tpu.scene import Camera
    from hobbyrenderer_tpu.utils import math as hm

    rough = 0.35
    sc = _mirror_scene(roughness=rough)
    spec, wgt, gb = _run_frames(sc, 48, rough)

    # probe region: center floor pixels
    valid = np.asarray(gb.valid)
    metal = np.asarray(gb.orm[..., 2]) > 0.5
    ys, xs = np.nonzero(valid & metal)
    sel = (np.abs(ys - H // 2) < 4) & (np.abs(xs - W // 2) < 6)
    ys, xs = ys[sel], xs[sel]
    assert len(ys) > 20
    got = spec[ys, xs, 0].mean() / np.maximum(wgt[ys, xs].mean(), 1e-6)

    # brute force at the same pixels: N VNDF samples through the real BVH
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    vc = cam.view_constants(0)
    pos = np.asarray(gb.world_pos)[ys, xs]
    n = np.asarray(gb.normal)[ys, xs]
    alb = np.asarray(gb.albedo)[ys, xs]
    v = np.asarray(vc["camera_pos"])[None] - pos
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    _, f0, alpha = brdf_params(jnp.asarray(alb), jnp.asarray(
        np.ones(len(ys), np.float32)), jnp.asarray(
        np.full(len(ys), rough, np.float32)))
    rng = np.random.default_rng(7)
    tot = np.zeros(len(ys))
    N = 256
    from hobbyrenderer_tpu.ops.intersect import offset_ray_origin
    from hobbyrenderer_tpu.scene.gpu import MAT_EMISSIVE
    for _ in range(N):
        u1 = jnp.asarray(rng.random(len(ys), np.float32))
        u2 = jnp.asarray(rng.random(len(ys), np.float32))
        v_loc = smp.to_local(jnp.asarray(n), jnp.asarray(v))
        h = smp.to_world(jnp.asarray(n),
                         smp.sample_ggx_vndf(v_loc, alpha, u1, u2))
        d = hm.normalize(hm.reflect(jnp.asarray(-v), h, xp=jnp), xp=jnp)
        hov = jnp.maximum(jnp.sum(h * jnp.asarray(v), -1), 0.0)
        ndv = jnp.maximum(jnp.sum(jnp.asarray(n) * jnp.asarray(v), -1), 1e-4)
        ndl = jnp.sum(jnp.asarray(n) * d, -1)
        F = fresnel_schlick(hov[..., None], f0)
        g2g1 = smp.smith_g2_over_g1(ndv, jnp.maximum(ndl, 1e-4), alpha)
        wt = F * g2g1[..., None]
        o = offset_ray_origin(jnp.asarray(pos), jnp.asarray(n), d)
        hit = traceops.closest_hit_auto(rt, o, d, active=ndl > 0)
        # emissive radiance at the hit (panel Le); reuse _hit_radiance
        from hobbyrenderer_tpu.ops.restir_gi import _hit_radiance
        pixid = jnp.arange(len(ys), dtype=jnp.uint32)
        _, _, hrad = _hit_radiance(gpu, rt, rt.lights, hit, o, d, pixid,
                                   jnp.uint32(0))
        lum = hm.luminance(hrad, xp=jnp)
        hrad = hrad * (jnp.minimum(lum, specops.MAX_RADIANCE)
                       / jnp.maximum(lum, 1e-6))[..., None]
        contrib = jnp.where(((hit.tri >= 0) & (ndl > 0))[..., None],
                            wt * hrad, 0.0)
        tot += np.asarray(contrib[..., 0])
    want = (tot / N).mean()
    assert want > 1e-3
    assert abs(got - want) < 0.35 * want, (got, want)


def test_blend_weight_bands():
    w = np.asarray(specops.spec_blend_weight(
        jnp.asarray([0.0, 0.2, specops.ROUGH_MAX - specops.FADE_BAND,
                     specops.ROUGH_MAX, 0.9], np.float32)))
    assert w[0] == 1.0 and w[1] == 1.0 and w[2] == 1.0
    assert w[3] == 0.0 and w[4] == 0.0


def test_half_rate_matches_full_rate_converged():
    """Checkerboard half-rate tracing (the perf-preset lever): on a static
    delta-mirror scene every traced sample is identical, so once both
    parities have traced, the converged half-rate output must match the
    full-rate output closely (small residual from history-count-driven
    filter radii)."""
    from hobbyrenderer_tpu.scene import Camera
    sc = _mirror_scene(roughness=0.0)
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    settings = RenderSettings().as_pytree()
    cap = int(gpu.lod0_pair_capacity)
    outs = {}
    for hr in (False, True):
        st = specops.spec_state_init(H, W)
        for f in range(6):
            vc = cam.view_constants(f)
            gb = _gbuffer(gpu, vc, cap)
            spec, wgt, st = specops.specular_indirect(
                gpu, rt, gb, vc, settings, st, f,
                sun_dir=jnp.asarray([0.0, 1.0, 0.0]),
                include_env_miss=False, half_rate=hr)
        outs[hr] = np.asarray(spec)
    floor = np.asarray(gb.valid) & (np.asarray(gb.orm[..., 2]) > 0.5)
    full_m = outs[False][..., 0][floor].mean()
    half_m = outs[True][..., 0][floor].mean()
    assert full_m > 0.0
    assert abs(half_m - full_m) < 0.15 * full_m, (half_m, full_m)
    # off-parity lanes carry history: no checkerboard holes — the set of lit
    # lanes (the panel's reflection footprint) matches the full-rate one
    lit_full = (outs[False][..., 0][floor] > 0.05 * full_m)
    lit_half = (outs[True][..., 0][floor] > 0.05 * full_m)
    assert lit_full.sum() > 20
    agree = (lit_full == lit_half).mean()
    assert agree > 0.95, agree
    # and per-pixel agreement on the lit region (identical static samples)
    d = np.abs(outs[True][..., 0] - outs[False][..., 0])[floor][lit_full]
    ref = outs[False][..., 0][floor][lit_full]
    assert (d / np.maximum(ref, 1e-6)).mean() < 0.25
