"""Polymorphic light pool + presampling + emissive-triangle ReSTIR estimators
(ref PrepareLights/presampling src/RTXDIRenderer.cpp:1969,2039-2105; the
estimator contract is unbiasedness vs brute-force integration)."""

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import lights as lightops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import restir as restirops
from hobbyrenderer_tpu.ops import shading as shadeops
from hobbyrenderer_tpu.scene import Camera
from hobbyrenderer_tpu.scene.cooker import cook_mesh
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.scene.procedural import camera_looking_at, plane_geometry
from hobbyrenderer_tpu.scene.scene import Material, Node, Scene
from hobbyrenderer_tpu.utils import math as hm

W, H = 48, 32


def _emissive_quad_scene(emission=(6.0, 4.0, 2.0)):
    """Grey ground plane + a 2x2 emissive quad hovering above it."""
    sc = Scene()
    grey = sc.add_material(Material(
        name="grey", base_color=np.array([0.7, 0.7, 0.7, 1], np.float32),
        roughness=0.9))
    emit = sc.add_material(Material(
        name="emit", base_color=np.array([0, 0, 0, 1], np.float32),
        emissive=np.asarray(emission, np.float32)))
    pos, nrm, uv, idx = plane_geometry(6.0)
    ground = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=grey)
    sc.add_node(Node(name="ground", mesh_primitives=[ground]))

    qp, qn, quv, qi = plane_geometry(1.0)
    quad = sc.add_mesh(cook_mesh(qp, qi, normals=qn, uvs=quv), material=emit)
    sc.add_node(Node(name="quad", mesh_primitives=[quad],
                     translation=np.array([0.5, 2.0, 0.0], np.float32)))
    sc.cameras.append(camera_looking_at(np.array([0, 4, 6], np.float32),
                                        np.zeros(3)))
    sc.finalize()
    return sc


def _gbuffer(gpu, vc, cap):
    cu = cullops.cull_pairs(gpu, vc, alpha_mask=jnp.asarray([True, True, False]))
    slots, _ = cullops.compact_mask(cu["mask"], cap)
    ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
    return rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)


def test_pool_collects_emissive_tris():
    sc = _emissive_quad_scene()
    gpu = build_scene_gpu(sc)
    pool = lightops.build_light_pool(sc, gpu)
    ne = int(pool.n_total) - int(pool.n_analytic)
    assert ne == 2                       # the quad's two triangles
    # power proportional to area x luminance; both tris equal
    pdf = np.asarray(pool.power_pdf)
    em = pdf[int(gpu.light_type.shape[0]):][:2]
    assert em[0] > 0 and abs(em[0] - em[1]) < 1e-6


def test_presample_distribution_matches_power():
    """Presampled tile ids are drawn proportional to light power."""
    sc = _emissive_quad_scene()
    gpu = build_scene_gpu(sc)
    pool = lightops.build_light_pool(sc, gpu)
    counts = np.zeros(np.asarray(pool.power_pdf).shape[0])
    n_frames = 8
    for f in range(n_frames):
        ids, inv = lightops.presample_lights(pool, jnp.uint32(f),
                                             n_tiles=32, tile_size=256)
        idv = np.asarray(ids).ravel()
        np.add.at(counts, idv[idv >= 0], 1.0)
    freq = counts / counts.sum()
    pdf = np.asarray(pool.power_pdf)
    np.testing.assert_allclose(freq[pdf > 0], pdf[pdf > 0], atol=0.02)
    # inv_pdf really is 1/pdf for the drawn ids
    iv = np.asarray(inv).ravel()
    np.testing.assert_allclose(iv, 1.0 / pdf[idv], rtol=1e-5)


def test_restir_emissive_converges_to_area_integral():
    """ReSTIR DI over an emissive-quad pool (no analytic lights, visibility
    off) converges to the brute-force area-light integral."""
    sc = _emissive_quad_scene()
    gpu = build_scene_gpu(sc)
    pool = lightops.build_light_pool(sc, gpu)
    # isolate the emissive quad: zero the default sun's selection power so
    # ReSTIR integrates exactly what the brute-force area integral does
    A = gpu.light_type.shape[0]
    pdf = np.asarray(pool.power_pdf).copy()
    pdf[:A] = 0.0
    pdf /= pdf.sum()
    pool = pool._replace(power_pdf=jnp.asarray(pdf),
                         power_cdf=jnp.asarray(np.cumsum(pdf)))
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    gb = jax.jit(lambda g, v: _gbuffer(g, v, max(int(gpu.lod0_pair_capacity), 1))
                 )(gpu, vc)

    # brute force: stratified MC over the quad area at every pixel
    R = H * W
    pos = gb.world_pos.reshape(R, 3)
    n = gb.normal.reshape(R, 3)
    v = hm.normalize(np.asarray(vc["camera_pos"])[None] - pos, xp=jnp)
    alb = gb.albedo.reshape(R, 3)
    rough = gb.orm.reshape(R, 3)[:, 1]
    metal = gb.orm.reshape(R, 3)[:, 2]

    def mc_batch(seed):
        key = jax.random.PRNGKey(seed)
        E = np.asarray(pool.em_v0).shape[0]
        li = jax.random.randint(key, (R,), 0, E) + pool.n_analytic
        uv = jax.random.uniform(jax.random.fold_in(key, 1), (R, 2))
        L, rad, dist = lightops.pool_light_incident(gpu, pool, li, uv, pos)
        f = shadeops.eval_brdf(n, v, L, alb, metal, rough)
        return f * rad * float(E)        # inv uniform-selection pdf

    mc = jax.jit(mc_batch)
    ref = np.zeros((R, 3), np.float32)
    NREF = 64
    for s in range(NREF):
        ref += np.asarray(mc(s))
    ref /= NREF

    step = jax.jit(lambda res, i: restirops.restir_di(
        gpu, None, gb, vc, settings, res, i, visibility=False, pool=pool))
    res = restirops.reservoir_init(H, W)
    acc = np.zeros((H, W, 3), np.float32)
    n_frames = 48
    for i in range(n_frames):
        direct, res = step(res, jnp.int32(i))
        acc += np.asarray(direct)
    avg = (acc / n_frames).reshape(R, 3)

    valid = np.asarray(gb.valid).reshape(R)
    lit = valid & (ref.sum(-1) > 1e-3)
    rel = np.abs(avg[lit] - ref[lit]).sum() / (ref[lit].sum() + 1e-9)
    assert rel < 0.15, f"emissive ReSTIR deviates {rel:.3f} from area integral"
