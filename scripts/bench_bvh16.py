"""bvh16 vs the 4-ary wavefront on the stress scene, real TPU numbers.

Ray mixes: fully-random (worst case, the tpu_smoke config), GI-like
(origins on visible surfaces, cosine-hemisphere directions), and any-hit
shadow rays. Usage: python scripts/bench_bvh16.py [R_log2]"""

from __future__ import annotations

import sys
import time

import numpy as np


def bench(fn, *args, warmup=2, iters=5):
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
    from hobbyrenderer_tpu.ops import bvh as bvhops
    from hobbyrenderer_tpu.ops import bvh16 as b16
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import make_stress_scene

    print("backend:", jax.default_backend(), flush=True)
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    print("tris:", rt.bvh16.num_tris, "| 4ary rows:", rt.bvh.table.shape,
          "| 16ary rows:", rt.bvh16.table.shape,
          "depth:", rt.bvh16.depth, flush=True)

    R = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    rng = np.random.default_rng(7)
    lo = np.asarray(rt.bvh.root_box[:3])
    hi = np.asarray(rt.bvh.root_box[3:])
    o = jnp.asarray(lo + rng.random((R, 3), np.float32) * (hi - lo))
    dd = rng.normal(size=(R, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))

    f16 = jax.jit(lambda o, d: b16.bvh16_closest_hit(rt.bvh16, o, d))
    t16, rec16 = bench(f16, o, d)
    hr = float(np.asarray(rec16.tri >= 0).mean())
    print(f"bvh16 closest (random): {t16*1e3:8.2f} ms  "
          f"{R/t16/1e6:6.2f} Mrays/s  hit {hr:.3f}", flush=True)

    f4 = jax.jit(lambda o, d: bvhops.bvh_closest_hit(rt.bvh, o, d))
    t4, rec4 = bench(f4, o, d, warmup=1, iters=2)
    print(f"bvh4  closest (random): {t4*1e3:8.2f} ms  "
          f"{R/t4/1e6:6.2f} Mrays/s  (16ary speedup {t4/t16:.1f}x)",
          flush=True)
    agree = float((np.asarray(rec16.tri) == np.asarray(rec4.tri)).mean())
    print(f"agreement: {agree:.4f}", flush=True)

    # GI-like rays: origins at primary-hit points, cosine directions
    prim_o = jnp.broadcast_to(jnp.asarray(lo + (hi - lo) * 0.5
                                          + np.asarray([0, 8, 14.0])), (R, 3))
    pd = np.stack([(np.arange(R) % 1024) / 1024.0 - 0.5,
                   -0.4 * np.ones(R),
                   (np.arange(R) // 1024) / max(R // 1024, 1) - 1.0],
                  -1).astype(np.float32)
    pd /= np.linalg.norm(pd, axis=-1, keepdims=True)
    rec_p = f16(prim_o, jnp.asarray(pd))
    hit_t = np.asarray(rec_p.t)
    hp = np.asarray(prim_o) + np.where(np.isfinite(hit_t), hit_t, 1.0)[:, None] \
        * pd * 0.999
    cd = rng.normal(size=(R, 3)).astype(np.float32)
    cd[:, 1] = np.abs(cd[:, 1])                      # upper hemisphere
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    o_gi, d_gi = jnp.asarray(hp.astype(np.float32)), jnp.asarray(cd)
    tgi, recgi = bench(f16, o_gi, d_gi)
    hrgi = float(np.asarray(recgi.tri >= 0).mean())
    print(f"bvh16 closest (GI-like): {tgi*1e3:8.2f} ms  "
          f"{R/tgi/1e6:6.2f} Mrays/s  hit {hrgi:.3f}", flush=True)

    fa16 = jax.jit(lambda o, d: b16.bvh16_any_hit(
        rt.bvh16, o, d, t_max=jnp.full((R,), 30.0)))
    ta, occ = bench(fa16, o_gi, d_gi)
    print(f"bvh16 any-hit (GI-like): {ta*1e3:8.2f} ms  "
          f"{R/ta/1e6:6.2f} Mrays/s  occ {float(np.asarray(occ).mean()):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
