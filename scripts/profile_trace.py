"""Incoherent-ray traversal microbench: sorted-block kernel vs XLA wavefront.

Run on TPU hardware. Prints Mrays/s for GI-bounce-like incoherent rays
(random cosine directions from visible surfaces of the stress scene) for:
  - ops/bvh.py   lockstep wavefront (the round-2 baseline, ~0.5 Mrays/s)
  - ops/trace.py sorted-block closest-hit beam kernel
  - ops/trace.py sorted-block any-hit (shadow rays)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import trace as traceops
from hobbyrenderer_tpu.scene import make_stress_scene
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu


def sync(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[:1]
                       .astype(jnp.float32)))


def main():
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    rt = build_scene_rt(sc, gpu)
    print(f"tris={rt.bvh.num_tris} nodes={rt.bvh.table.shape[0]}")

    R = 1 << 19                       # 512k rays (the half-res GI grid scale)
    rng = np.random.default_rng(1)
    lo = np.asarray(rt.bvh.root_box[:3])
    hi = np.asarray(rt.bvh.root_box[3:])
    # GI-like: origins on scene geometry-ish positions, cosine-ish dirs
    o = jnp.asarray(lo + rng.random((R, 3), np.float32) * (hi - lo))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    def bench(name, fn, n=3):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:32s} {R / dt / 1e6:8.2f} Mrays/s   ({dt * 1e3:.1f} ms)")

    bench("wavefront closest_hit", lambda: bvhops.bvh_closest_hit(rt.bvh, o, d))
    bench("sorted-block closest_hit",
          lambda: traceops.trace_closest(rt.btable, rt.bvh.root_box, o, d))
    t_max = jnp.full((R,), 20.0)
    bench("wavefront any_hit",
          lambda: bvhops.bvh_any_hit(rt.bvh, o, d, t_max=t_max))
    bench("sorted-block any_hit",
          lambda: traceops.trace_any_hit(rt.btable, rt.bvh.root_box, o, d,
                                         t_max=t_max))


if __name__ == "__main__":
    main()
