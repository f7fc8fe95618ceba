"""Sweep wtrace kernel knobs (census leaf fraction, DMA unroll) on TPU —
one scene build, several configs. Usage: python scripts/sweep_wtrace.py"""

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

    import hobbyrenderer_tpu.ops.wtrace as wt
    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import make_stress_scene

    print("backend:", jax.default_backend(), flush=True)
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    bvh = rt.bvh16
    print(f"tris={bvh.num_tris}", flush=True)

    R = 1 << 18
    rng = np.random.default_rng(7)
    lo = np.asarray(bvh.root_box[:3])
    hi = np.asarray(bvh.root_box[3:])
    o = jnp.asarray(lo + rng.random((R, 3), np.float32) * (hi - lo))
    dd = rng.normal(size=(R, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))

    ref_tri = None
    for lf, un in [(4, 4), (4, 8), (2, 4), (2, 8), (6, 8), (2, 16)]:
        wt.LEAF_FRAC_NUM = lf
        wt.DMA_UNROLL = un
        f = jax.jit(lambda o, d: wt.wtrace_closest_hit(bvh, o, d))
        try:
            t, rec = bench(f, o, d)
        except Exception as e:
            print(f"lf={lf} unroll={un}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        tri = np.asarray(rec.tri)
        if ref_tri is None:
            ref_tri = tri
        agree = float((tri == ref_tri).mean())
        print(f"lf={lf} unroll={un}: {t*1e3:8.2f} ms "
              f"{R/t/1e6:5.2f} Mrays/s  agree {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
