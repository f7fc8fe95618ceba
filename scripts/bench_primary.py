"""PRIMARY-ray (camera-coherent) closest-hit: sorted-block kernel
(ops/trace.trace_closest) vs the wtrace walk — decides whether the path
tracer should route bounce 0 through the coherent kernel (r5 candidate)."""

from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, warmup=2, iters=4):
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

    from hobbyrenderer_tpu.models.pathtracer import (build_scene_rt,
                                                     camera_rays)
    from hobbyrenderer_tpu.ops import trace as traceops
    from hobbyrenderer_tpu.ops import wtrace as wt
    from hobbyrenderer_tpu.scene import Camera
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import make_stress_scene

    print("backend:", jax.default_backend(), flush=True)
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    W, H = 960, 540
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    o, d = camera_rays(vc, H, W, jnp.zeros((H, W, 2)))
    R = H * W
    print(f"primary rays: {R}", flush=True)

    fw = jax.jit(lambda o, d: wt.wtrace_closest_hit(rt.bvh16, o, d))
    t, rec = bench(fw, o, d)
    hr = float(np.asarray(rec.tri >= 0).mean())
    print(f"wtrace primary:      {t*1e3:8.2f} ms {R/t/1e6:6.2f} Mrays/s "
          f"hit {hr:.3f}", flush=True)

    fs = jax.jit(lambda o, d: traceops.trace_closest(
        rt.btable, rt.bvh.root_box, o, d))
    t2, rec2 = bench(fs, o, d)
    agree = float((np.asarray(rec2.tri >= 0)
                   == np.asarray(rec.tri >= 0)).mean())
    print(f"sorted-block primary:{t2*1e3:8.2f} ms {R/t2/1e6:6.2f} Mrays/s "
          f"hit-agree {agree:.4f} (speedup {t/t2:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
