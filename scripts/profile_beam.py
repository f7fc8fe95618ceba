"""Beam-kernel visibility profile (run on TPU).

Answers: why do ReSTIR winner-visibility rays cost ~137 ms at 1080p when
pure sun-shadow beams run at ~39 Mrays/s (~53 ms)? Compares:
  1. sun-only rays (all lanes share the sun direction)
  2. actual ReSTIR winner rays from a real frame (mixed sun/local/emissive)
  3. winner rays quantized to the dominant direction (upper bound on the
     coherence win)
and sweeps the kernel's tile knobs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_beam.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.config import Config, RenderingMode, RenderSettings
from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
from hobbyrenderer_tpu.ops import beam as beamops
from hobbyrenderer_tpu.ops import culling as cullops
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import restir as restirops
from hobbyrenderer_tpu.scene import Camera, make_stress_scene
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu

W, H = 1920, 1080


def sync(x):
    np.asarray(jnp.sum(x))


def main():
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()

    def gb_fn(g, v):
        cu = cullops.cull_pairs(g, v, alpha_mask=jnp.asarray([True, True,
                                                              False]))
        slots, _ = cullops.compact_mask(cu["mask"],
                                        max(int(gpu.lod0_pair_capacity), 1))
        ro, aux = rasterops.rasterize(g, v, slots, W, H)
        return rasterops.resolve_gbuffer(g, v, ro, slots, aux=aux)

    gb = jax.jit(gb_fn)(gpu, vc)
    sync(gb.depth)

    pos = gb.world_pos
    gn = gb.geo_normal
    valid = gb.valid
    sun = -np.asarray([0.3, -0.8, 0.5])
    sun = jnp.asarray(sun / np.linalg.norm(sun), jnp.float32)

    def timed(name, o, d, tmax, act):
        f = jax.jit(lambda bt, oo, dd, tt, aa: beamops.beam_any_hit(
            bt, oo, dd, tt, aa, H, W))
        out = f(rt.btable, o, d, tmax, act)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = f(rt.btable, o, d, tmax, act)
        sync(out)
        ms = (time.perf_counter() - t0) / 4 * 1e3
        rays = float(np.asarray(act).sum())
        print(f"{name:32s} {ms:8.1f} ms  {rays / ms / 1e3:7.2f} Mrays/s",
              flush=True)
        return ms

    o = pos + gn * 0.05
    d_sun = jnp.broadcast_to(sun, (H, W, 3))
    tmax = jnp.full((H, W), 1e4)
    timed("sun-only (coherent)", o, d_sun, tmax, valid)

    # real ReSTIR winner rays: run the chain once without visibility, then
    # reconstruct the winner directions
    res0 = restirops.reservoir_init(H, W)
    f_di = jax.jit(lambda g, r, b, v, rr: restirops.restir_di(
        g, r, b, v, settings, rr, jnp.int32(3), visibility=False))
    _, res = f_di(gpu, rt, gb, vc, res0)
    sync(res.W)
    from hobbyrenderer_tpu.ops import lights as lightops
    pool = rt.lights
    R = H * W
    L, rad, dist = lightops.pool_light_incident_packed(
        pool, res.y.reshape(R), res.uv.reshape(R, 2), pos.reshape(R, 3))
    shoot = (valid.reshape(R) & (res.y.reshape(R) >= 0) &
             (res.W.reshape(R) > 0))
    d_win = L.reshape(H, W, 3)
    t_win = jnp.where(shoot, dist - 2e-3, 1e-4).reshape(H, W)
    timed("ReSTIR winners (mixed)", o, d_win, t_win, shoot.reshape(H, W))

    # upper bound: same activity mask, but all rays point at the sun
    timed("winners quantized to sun", o, d_sun, t_win, shoot.reshape(H, W))

    frac_sun = float(np.asarray(
        (jnp.sum(d_win * sun, -1) > 0.999) & shoot.reshape(H, W)).sum()
        / max(float(np.asarray(shoot).sum()), 1))
    print(f"winner rays within 2.5deg of sun: {frac_sun * 100:.1f}%")


if __name__ == "__main__":
    main()
