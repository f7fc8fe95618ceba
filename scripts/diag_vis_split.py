"""Measure ReSTIR winner-visibility cost structure on TPU at 1080p:
(a) beam_any_hit on PURE-SUN rays (coherent best case),
(b) beam_any_hit on MIXED sun+emissive winner rays (the flagship's actual
    workload — direction cones per tile span the light pool),
(c) bvh16_any_hit on the local-light subset with tight t_max.

Decides whether splitting visibility by winner type is worth it."""

from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, warmup=1, iters=4):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, r


def main():
    import jax
    import jax.numpy as jnp

    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    from hobbyrenderer_tpu.ops import beam as beamops
    from hobbyrenderer_tpu.ops import bvh16 as b16
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import make_stress_scene

    print("backend:", jax.default_backend(), flush=True)
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    H, W = 1080, 1920
    R = H * W
    rng = np.random.default_rng(11)

    # surface-ish origins: scatter across the scene bounds at ground-plus
    lo = np.asarray(rt.bvh.root_box[:3])
    hi = np.asarray(rt.bvh.root_box[3:])
    o_np = (lo + rng.random((R, 3), np.float32) * (hi - lo)).astype(np.float32)
    sun = np.asarray([0.35, 0.80, 0.49], np.float32)
    sun /= np.linalg.norm(sun)

    # emissive "lights": pick random points in the scene as targets
    n_loc = 64
    lpts = (lo + rng.random((n_loc, 3), np.float32) * (hi - lo)).astype(np.float32)
    li = rng.integers(0, n_loc, R)
    to_l = lpts[li] - o_np
    dist_l = np.linalg.norm(to_l, axis=-1, keepdims=True)
    d_loc = (to_l / np.maximum(dist_l, 1e-6)).astype(np.float32)

    mixed_is_sun = rng.random(R) < 0.5
    d_mix = np.where(mixed_is_sun[:, None], sun[None, :], d_loc)
    t_mix = np.where(mixed_is_sun, 1e30, dist_l[:, 0]).astype(np.float32)

    o = jnp.asarray(o_np)
    shoot = jnp.ones((H, W), bool)

    f_beam = jax.jit(lambda o, d, tm: beamops.beam_any_hit(
        rt.btable, o.reshape(H, W, 3), d.reshape(H, W, 3),
        tm.reshape(H, W), shoot, H, W))

    # (a) pure sun
    d_sun = jnp.broadcast_to(jnp.asarray(sun), (R, 3))
    t_inf = jnp.full((R,), 1e30)
    t, occ = bench(f_beam, o, d_sun, t_inf)
    print(f"beam sun-only : {t*1e3:8.1f} ms  {R/t/1e6:6.2f} Mrays/s  "
          f"occ {float(np.asarray(occ).mean()):.3f}", flush=True)

    # (b) mixed winners
    t, occ = bench(f_beam, o, jnp.asarray(d_mix), jnp.asarray(t_mix))
    print(f"beam mixed    : {t*1e3:8.1f} ms  {R/t/1e6:6.2f} Mrays/s  "
          f"occ {float(np.asarray(occ).mean()):.3f}", flush=True)

    # (b2) beam with only sun lanes active (the split's beam half)
    t_sun_only = jnp.asarray(np.where(mixed_is_sun, 1e30, 1e-4)
                             .astype(np.float32))
    t, occ = bench(f_beam, o, d_sun, t_sun_only)
    print(f"beam sun-mask : {t*1e3:8.1f} ms  {R/t/1e6:6.2f} Mrays/s",
          flush=True)

    # (c) bvh16 any-hit, local lanes only (tight t_max; sun lanes t_max=0)
    t_loc = jnp.asarray(np.where(mixed_is_sun, 1e-4, dist_l[:, 0] - 1e-3)
                        .astype(np.float32))
    f16 = jax.jit(lambda o, d, tm: b16.bvh16_any_hit(rt.bvh16, o, d,
                                                     t_max=tm))
    t, occ = bench(f16, o, jnp.asarray(d_loc), t_loc)
    print(f"bvh16 loc-mask: {t*1e3:8.1f} ms  {R/t/1e6:6.2f} Mrays/s  "
          f"occ {float(np.asarray(occ).mean()):.3f}", flush=True)


if __name__ == "__main__":
    main()
