"""DDGI probe volume: octahedral mapping invariants, irradiance-estimator
normalization vs brute-force MC, and the deferred-graph integration (ref
src/DDGIRenderer.cpp:449-548, SURVEY.md §2.6 #44/#52)."""

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
from hobbyrenderer_tpu.ops import ddgi as ddgiops
from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.scene import Camera
from hobbyrenderer_tpu.scene.cooker import cook_mesh
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.scene.procedural import camera_looking_at, plane_geometry
from hobbyrenderer_tpu.scene.scene import Material, Node, Scene
from hobbyrenderer_tpu.utils import math as hm


def _room_scene(emission=(4.0, 3.0, 2.0)):
    """Closed 6m box, emissive ceiling: pure probe-GI interior."""
    sc = Scene()
    # single-sided, wound inward: the classification test relies on buried
    # probes seeing true backfaces
    grey = sc.add_material(Material(
        name="grey", base_color=np.array([0.6, 0.6, 0.6, 1], np.float32),
        roughness=0.9))
    emit = sc.add_material(Material(
        name="emit", base_color=np.array([0, 0, 0, 1], np.float32),
        emissive=np.asarray(emission, np.float32)))
    pos, nrm, uv, idx = plane_geometry(3.0)
    wall = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=grey)
    ceil = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=emit)
    s45 = np.float32(np.sin(np.pi / 4))
    # floor
    sc.add_node(Node(name="floor", mesh_primitives=[wall]))
    # ceiling at y=6, flipped so its normal points down into the room
    sc.add_node(Node(name="ceil", mesh_primitives=[ceil],
                     translation=np.array([0, 6, 0], np.float32),
                     rotation=np.array([1, 0, 0, 0], np.float32)))
    # four walls
    for name, t, q in [
        ("w0", [0, 3, -3], [s45, 0, 0, s45]),
        ("w1", [0, 3, 3], [-s45, 0, 0, s45]),
        ("w2", [-3, 3, 0], [0, 0, -s45, s45]),
        ("w3", [3, 3, 0], [0, 0, s45, s45]),
    ]:
        sc.add_node(Node(name=name, mesh_primitives=[wall],
                         translation=np.array(t, np.float32),
                         rotation=np.array(q, np.float32)))
    sc.cameras.append(camera_looking_at(np.array([0, 3, 2.5], np.float32),
                                        np.array([0, 2, 0], np.float32)))
    sc.finalize()
    return sc


def test_oct_texel_dirs_roundtrip():
    for res in (8, 16):
        dirs = np.asarray(ddgiops._oct_texel_dirs(res)).reshape(-1, 3)
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                                   atol=1e-5)
        e = hm.oct_encode(dirs, xp=np)
        back = hm.oct_decode(e, xp=np)
        np.testing.assert_allclose(back, dirs, atol=1e-5)


def test_ddgi_irradiance_matches_mc():
    """After convergence, the probe query at the room center matches a
    brute-force cosine-MC irradiance estimate with the same hit shader."""
    sc = _room_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    settings = RenderSettings().as_pytree()

    vol = ddgiops.ddgi_init((-2.4, 0.6, -2.4), (2.4, 5.4, 2.4),
                            counts=(4, 4, 4))
    upd = jax.jit(lambda v, f: ddgiops.ddgi_update(v, gpu, rt, settings, f))
    for f in range(24):
        vol = upd(vol, jnp.int32(f))

    q = np.array([[0.0, 3.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    E = np.asarray(ddgiops.ddgi_query(vol, jnp.asarray(q), jnp.asarray(n)))[0]

    # reference: E = pi * mean over cosine-sampled dirs of radiance
    from hobbyrenderer_tpu.ops import bvh as bvhops
    from hobbyrenderer_tpu.ops.restir_gi import _hit_radiance

    def mc(seed):
        R = 512
        key = jax.random.PRNGKey(seed)
        u1 = jax.random.uniform(key, (R,))
        u2 = jax.random.uniform(jax.random.fold_in(key, 1), (R,))
        d = smp.to_world(jnp.broadcast_to(jnp.asarray(n[0]), (R, 3)),
                         smp.cosine_sample_hemisphere(u1, u2))
        o = jnp.broadcast_to(jnp.asarray(q[0]), (R, 3))
        hit = bvhops.bvh_closest_hit(rt.bvh, o, d)
        pix = jnp.arange(R, dtype=jnp.uint32)
        _p, _n, rad = _hit_radiance(gpu, rt, rt.lights, hit, o, d, pix,
                                    jnp.uint32(seed + 31))
        return jnp.pi * rad.mean(0)
    mcj = jax.jit(mc)
    ref = np.mean([np.asarray(mcj(s)) for s in range(8)], axis=0)

    rel = np.abs(E - ref).sum() / (ref.sum() + 1e-9)
    assert rel < 0.45, f"DDGI query {E} vs MC {ref} (rel {rel:.2f})"
    # and the color ratio is right (emission is warm-tinted)
    assert E[0] > E[2] > 0


def test_ddgi_classification_marks_buried_probes():
    """A probe inside solid geometry sees backfaces and is marked dead."""
    sc = _room_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    settings = RenderSettings().as_pytree()
    # grid extends BELOW the floor: bottom layer is outside the room, looking
    # at the floor's backside
    vol = ddgiops.ddgi_init((-2.0, -3.0, -2.0), (2.0, 5.0, 2.0),
                            counts=(2, 4, 2))
    vol = jax.jit(lambda v: ddgiops.ddgi_update(v, gpu, rt, settings,
                                                jnp.int32(0)))(vol)
    alive = np.asarray(vol.alive).reshape(2, 4, 2)
    # layer 1 sits just below the floor (y=-0.33): sees the floor's backside
    # across much of its sky; layer 0 (y=-3) is mostly open space — the
    # classification criterion is backface FRACTION, so only near-buried
    # probes are required to die
    assert (alive[:, 1, :] == 0).all(), "probes under the floor must die"
    assert (alive[:, 2, :] == 1).all(), "interior probes must stay alive"


def test_ddgi_deferred_graph():
    from hobbyrenderer_tpu.models.deferred import DeferredRenderer
    W, H = 48, 32
    sc = _room_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    settings = RenderSettings().as_pytree()
    r = DeferredRenderer(gpu, W, H, rt=rt, indirect_mode="ddgi",
                         mode="normal_basic")
    for i in range(2):
        ldr, _ = r.render(gpu, cam.view_constants(i), settings)
    assert np.isfinite(np.asarray(ldr)).all()
    assert "ddgi_volume" in r.state


def test_ddgi_probe_relocation_rescues_buried_probes():
    """Ref RTXGI probe relocation: a probe just below the floor escapes
    through the closest backface over a few updates and comes back alive."""
    sc = _room_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    settings = RenderSettings().as_pytree()
    vol = ddgiops.ddgi_init((-2.0, -3.0, -2.0), (2.0, 5.0, 2.0),
                            counts=(2, 4, 2))
    step = jax.jit(lambda v, i: ddgiops.ddgi_update(v, gpu, rt, settings, i))
    for i in range(4):
        vol = step(vol, jnp.int32(i))
    alive = np.asarray(vol.alive).reshape(2, 4, 2)
    off = np.asarray(vol.offset).reshape(2, 4, 2, 3)
    # layer 1 started at y=-0.33 (under the floor at y=0): relocation must
    # push it up through the floor and classification must resurrect it
    assert (off[:, 1, :, 1] > 0.3).all(), f"no upward escape: {off[:, 1, :, 1]}"
    assert (alive[:, 1, :] == 1).all(), "relocated probes must come alive"
    # interior probes stay put (no spurious drift)
    assert (np.abs(off[:, 2, :, :]).max() < 0.2), off[:, 2]


def test_ddgi_variability_converges_and_gates_tracing():
    """Ref DDGI variability reduction: the metric decays on a static scene,
    and once converged the deferred pass skips tracing (volume frozen except
    the every-8th-frame keep-alive)."""
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer
    cfg = Config(scene="stress:3", width=64, height=48,
                 mode=RenderingMode.NORMAL, indirect_mode="ddgi")
    r = Renderer(cfg)
    varbs = []
    for _ in range(12):
        r.render_frame()
        varbs.append(float(np.asarray(r._model.state["ddgi_volume"]
                                      .variability)))
    assert varbs[-1] < varbs[0] * 0.5 or varbs[-1] < 0.02, varbs
    assert "ddgi_variability" in r.stats()
    if varbs[-1] < 0.01:
        # converged: a non-multiple-of-8 frame must leave the volume frozen
        while (r.frame_index + 1) % 8 == 0:
            r.render_frame()
        before = np.asarray(r._model.state["ddgi_volume"].irradiance)
        r.render_frame()
        after = np.asarray(r._model.state["ddgi_volume"].irradiance)
        assert np.array_equal(before, after), "converged volume must freeze"
