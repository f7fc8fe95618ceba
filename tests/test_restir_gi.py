"""ReSTIR GI estimator correctness: the time-averaged reservoir-reused
indirect must converge to brute-force one-bounce MC with the same sample
radiance estimator (unbiasedness of the GI reservoir chain incl. Jacobian
reuse; ref RTXDI GI passes src/RTXDIRenderer.cpp:2256-2293)."""

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import restir_gi as giops
from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.ops.intersect import offset_ray_origin
from hobbyrenderer_tpu.scene import Camera
from hobbyrenderer_tpu.scene.cooker import cook_mesh
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.scene.procedural import camera_looking_at, plane_geometry
from hobbyrenderer_tpu.scene.scene import Material, Node, Scene

W, H = 48, 32
SCALE = 2


def _wall_scene():
    """Grey ground + a red wall; the sun lights the wall, the wall bounces
    red onto the ground — a pure one-bounce GI scenario."""
    sc = Scene()
    grey = sc.add_material(Material(
        name="grey", base_color=np.array([0.7, 0.7, 0.7, 1], np.float32),
        roughness=0.9))
    red = sc.add_material(Material(
        name="red", base_color=np.array([0.8, 0.1, 0.05, 1], np.float32),
        roughness=0.9, double_sided=True))
    pos, nrm, uv, idx = plane_geometry(5.0)
    ground = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=grey)
    sc.add_node(Node(name="ground", mesh_primitives=[ground]))
    wallm = sc.add_mesh(cook_mesh(pos * 0.5, idx, normals=nrm, uvs=uv),
                        material=red)
    s45 = np.float32(np.sin(np.pi / 4))
    sc.add_node(Node(name="wall", mesh_primitives=[wallm],
                     translation=np.array([0, 1.5, -2.5], np.float32),
                     rotation=np.array([s45, 0, 0, s45], np.float32)))
    sc.cameras.append(camera_looking_at(np.array([0, 4, 5], np.float32),
                                        np.zeros(3)))
    sc.finalize()
    return sc


def _gbuffer(gpu, vc, cap):
    cu = cullops.cull_pairs(gpu, vc, alpha_mask=jnp.asarray([True, True, False]))
    slots, _ = cullops.compact_mask(cu["mask"], cap)
    ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
    return rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)


def test_restir_gi_converges_to_bruteforce():
    sc = _wall_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    gb = jax.jit(lambda g, v: _gbuffer(g, v, max(int(gpu.lod0_pair_capacity), 1))
                 )(gpu, vc)

    Hg, Wg = H // SCALE, W // SCALE
    R = Hg * Wg
    sub = lambda img: img[::SCALE, ::SCALE][:Hg, :Wg]
    pos = sub(gb.world_pos).reshape(R, 3)
    n = sub(gb.normal).reshape(R, 3)
    gn = sub(gb.geo_normal).reshape(R, 3)
    valid = np.asarray(sub(gb.valid).reshape(R))
    alb = sub(gb.albedo).reshape(R, 3)

    # brute-force: cosine-hemisphere MC with the SAME per-sample radiance
    # estimator the GI initial pass uses (isolates the reservoir machinery)
    def mc(seed):
        key = jax.random.PRNGKey(seed)
        u1 = jax.random.uniform(key, (R,))
        u2 = jax.random.uniform(jax.random.fold_in(key, 1), (R,))
        d = smp.to_world(n, smp.cosine_sample_hemisphere(u1, u2))
        o = offset_ray_origin(pos, gn, d)
        hit = bvhops.bvh_closest_hit(rt.bvh, o, d)
        pix = jnp.arange(R, dtype=jnp.uint32)
        _sp, _sn, rad = giops._hit_radiance(
            gpu, rt, rt.lights, hit, o, d, pix,
            jnp.uint32(seed + 7000))
        # cosine pdf cancels the cosine: E[albedo/pi * rad * cos / (cos/pi)]
        return alb * rad
    mcj = jax.jit(mc)
    ref = np.zeros((R, 3), np.float32)
    NREF = 96
    for s in range(NREF):
        ref += np.asarray(mcj(s))
    ref /= NREF

    step = jax.jit(lambda res, i: giops.restir_gi(
        gpu, rt, gb, vc, settings, res, i, scale=SCALE))
    res = giops.gi_reservoir_init(Hg, Wg)
    acc = np.zeros((H, W, 3), np.float32)
    n_frames = 96
    for i in range(n_frames):
        ind, res = step(res, jnp.int32(i))
        acc += np.asarray(ind)
    avg_full = acc / n_frames
    avg = avg_full[::SCALE, ::SCALE][:Hg, :Wg].reshape(R, 3)

    lit = valid & (ref.sum(-1) > 2e-3)
    assert lit.sum() > 20, "scene setup broken: no GI-lit pixels"
    # convergence = BIAS, not per-cell variance: 48 frames of a reservoir
    # chain keep sizeable per-cell noise (the denoiser's job in the frame),
    # so compare lit-masked 4x4-block means. (The old per-cell compare only
    # passed because the resolve's center-aligned bilinear resize blurred
    # neighboring cells together; the guided upsample resolves exactly.)
    B = 4
    Hb, Wb = Hg // B, Wg // B
    m = lit.reshape(Hg, Wg)[:Hb * B, :Wb * B]
    blk = lambda x: np.where(m[..., None], x.reshape(Hg, Wg, 3), 0.0)[
        :Hb * B, :Wb * B].reshape(Hb, B, Wb, B, 3).sum((1, 3))
    cnt = m.reshape(Hb, B, Wb, B).sum((1, 3))
    ok = cnt > 1
    ba = blk(avg)[ok] / cnt[ok, None]
    br = blk(ref)[ok] / cnt[ok, None]
    rel = np.abs(ba - br).sum() / (np.abs(br).sum() + 1e-9)
    # GI reuse carries Jacobian clamps + visibility kills: looser than DI.
    # Measured trajectory (scripts/diag_gi_bias.py): block L1 0.53/0.33/0.20/
    # 0.12 and energy ratio 1.10/1.04/0.96/0.94 at 24/48/96/192 frames —
    # noise-dominated, converging.
    assert rel < 0.3, f"ReSTIR GI block-mean bias {rel:.3f} vs brute force"
    energy = avg[lit].sum() / (ref[lit].sum() + 1e-9)
    assert 0.85 < energy < 1.15, f"GI energy ratio {energy:.3f} off"


def test_restir_gi_in_deferred_graph():
    """End-to-end: indirect_mode=restir produces a frame with GI state."""
    from hobbyrenderer_tpu.models.deferred import DeferredRenderer
    sc = _wall_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    settings = RenderSettings().as_pytree()
    r = DeferredRenderer(gpu, W, H, rt=rt, direct_mode="restir",
                         indirect_mode="restir")
    for i in range(2):
        ldr, _ = r.render(gpu, cam.view_constants(i), settings)
    ldr = np.asarray(ldr)
    assert ldr.shape == (H, W, 3)
    assert np.isfinite(ldr).all()
    assert "restir_gi_reservoir" in r.state


def test_restir_gi_half_rate_converges():
    """The frame-interlaced (half_rate) GI chain stays unbiased: un-traced
    rows contribute M=0 candidates and lean on temporal reuse, so the
    time-average still converges to brute force."""
    sc = _wall_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    gb = jax.jit(lambda g, v: _gbuffer(g, v, max(int(gpu.lod0_pair_capacity), 1))
                 )(gpu, vc)

    Hg, Wg = H // SCALE, W // SCALE
    R = Hg * Wg
    sub = lambda img: img[::SCALE, ::SCALE][:Hg, :Wg]
    pos = sub(gb.world_pos).reshape(R, 3)
    n = sub(gb.normal).reshape(R, 3)
    gn = sub(gb.geo_normal).reshape(R, 3)
    valid = np.asarray(sub(gb.valid).reshape(R))
    alb = sub(gb.albedo).reshape(R, 3)

    def mc(seed):
        key = jax.random.PRNGKey(seed)
        u1 = jax.random.uniform(key, (R,))
        u2 = jax.random.uniform(jax.random.fold_in(key, 1), (R,))
        d = smp.to_world(n, smp.cosine_sample_hemisphere(u1, u2))
        o = offset_ray_origin(pos, gn, d)
        hit = bvhops.bvh_closest_hit(rt.bvh, o, d)
        pix = jnp.arange(R, dtype=jnp.uint32)
        _sp, _sn, rad = giops._hit_radiance(
            gpu, rt, rt.lights, hit, o, d, pix, jnp.uint32(seed + 7000))
        return alb * rad
    mcj = jax.jit(mc)
    ref = np.zeros((R, 3), np.float32)
    NREF = 96
    for s in range(NREF):
        ref += np.asarray(mcj(s))
    ref /= NREF

    step = jax.jit(lambda res, i: giops.restir_gi(
        gpu, rt, gb, vc, settings, res, i, scale=SCALE, half_rate=True))
    res = giops.gi_reservoir_init(Hg, Wg)
    acc = np.zeros((H, W, 3), np.float32)
    n_frames = 64
    for i in range(n_frames):
        ind, res = step(res, jnp.int32(i))
        acc += np.asarray(ind)
    avg = (acc / n_frames)[::SCALE, ::SCALE][:Hg, :Wg].reshape(R, 3)

    lit = valid & (ref.sum(-1) > 2e-3)
    assert lit.sum() > 20
    # half the candidate rate -> ~2x the noise of the full-rate chain, so the
    # tight MAD bound is not meaningful here; assert ENERGY (the bias the
    # interlaced variant failed at 0.88x) plus a loose MAD sanity bound
    ratio = avg[lit].sum() / (ref[lit].sum() + 1e-9)
    assert 0.85 < ratio < 1.15, f"half-rate GI energy off: {ratio:.3f}"
    rel = np.abs(avg[lit] - ref[lit]).sum() / (ref[lit].sum() + 1e-9)
    # 0.7: the exact guided upsample preserves per-cell reservoir noise the
    # old center-shifted bilinear resize incidentally averaged away (same
    # reasoning as the block-mean main convergence test); energy above is
    # the real gate
    assert rel < 0.7, f"half-rate ReSTIR GI deviates {rel:.3f}"
