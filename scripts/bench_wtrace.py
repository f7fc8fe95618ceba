"""wtrace (hybrid Pallas/XLA walk) vs bvh16 (pure XLA) on the stress scene,
real TPU numbers. Usage: python scripts/bench_wtrace.py [R_log2]"""

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
    from hobbyrenderer_tpu.ops import bvh16 as b16
    from hobbyrenderer_tpu.ops import wtrace as wt
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import make_stress_scene

    print("backend:", jax.default_backend(), flush=True)
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    bvh = rt.bvh16
    print(f"tris={bvh.num_tris} depth={bvh.depth} I={bvh.n_interior}",
          flush=True)

    R = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    rng = np.random.default_rng(7)
    lo = np.asarray(bvh.root_box[:3])
    hi = np.asarray(bvh.root_box[3:])
    o = jnp.asarray(lo + rng.random((R, 3), np.float32) * (hi - lo))
    dd = rng.normal(size=(R, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))

    fw = jax.jit(lambda o, d: wt.wtrace_closest_hit(bvh, o, d))
    tw, recw = bench(fw, o, d)
    hrw = float(np.asarray(recw.tri >= 0).mean())
    print(f"wtrace closest (random): {tw*1e3:8.2f} ms "
          f"{R/tw/1e6:6.2f} Mrays/s  hit {hrw:.3f}", flush=True)

    f16 = jax.jit(lambda o, d: b16.bvh16_closest_hit(bvh, o, d))
    t16, rec16 = bench(f16, o, d, warmup=1, iters=3)
    print(f"bvh16  closest (random): {t16*1e3:8.2f} ms "
          f"{R/t16/1e6:6.2f} Mrays/s  (wtrace speedup {t16/tw:.2f}x)",
          flush=True)
    agree = float((np.asarray(recw.tri) == np.asarray(rec16.tri)).mean())
    print(f"agreement: {agree:.4f}", flush=True)

    # GI-like: surface origins + cosine dirs
    prim_o = jnp.broadcast_to(jnp.asarray(lo + (hi - lo) * 0.5
                                          + np.asarray([0, 8, 14.0])), (R, 3))
    pd = np.stack([(np.arange(R) % 1024) / 1024.0 - 0.5,
                   -0.4 * np.ones(R),
                   (np.arange(R) // 1024) / max(R // 1024, 1) - 1.0],
                  -1).astype(np.float32)
    pd /= np.linalg.norm(pd, axis=-1, keepdims=True)
    rec_p = fw(prim_o, jnp.asarray(pd))
    hit_t = np.asarray(rec_p.t)
    hp = np.asarray(prim_o) + np.where(np.isfinite(hit_t), hit_t,
                                       1.0)[:, None] * pd * 0.999
    cd = rng.normal(size=(R, 3)).astype(np.float32)
    cd[:, 1] = np.abs(cd[:, 1])
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    o_gi, d_gi = jnp.asarray(hp.astype(np.float32)), jnp.asarray(cd)
    tg, _ = bench(fw, o_gi, d_gi)
    print(f"wtrace closest (GI):     {tg*1e3:8.2f} ms "
          f"{R/tg/1e6:6.2f} Mrays/s", flush=True)
    tg16, _ = bench(f16, o_gi, d_gi, warmup=1, iters=3)
    print(f"bvh16  closest (GI):     {tg16*1e3:8.2f} ms "
          f"{R/tg16/1e6:6.2f} Mrays/s  (speedup {tg16/tg:.2f}x)", flush=True)

    tmax = jnp.full((R,), 30.0)
    fwa = jax.jit(lambda o, d: wt.wtrace_any_hit(bvh, o, d, t_max=tmax))
    ta, occ = bench(fwa, o_gi, d_gi)
    print(f"wtrace any-hit (GI):     {ta*1e3:8.2f} ms "
          f"{R/ta/1e6:6.2f} Mrays/s  occ "
          f"{float(np.asarray(occ).mean()):.3f}", flush=True)
    f16a = jax.jit(lambda o, d: b16.bvh16_any_hit(bvh, o, d, t_max=tmax))
    ta16, occ16 = bench(f16a, o_gi, d_gi, warmup=1, iters=3)
    print(f"bvh16  any-hit (GI):     {ta16*1e3:8.2f} ms "
          f"{R/ta16/1e6:6.2f} Mrays/s  (speedup {ta16/ta:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
