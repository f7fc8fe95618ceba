"""Diagnose bvh16 traversal cost on TPU: steps-per-ray distribution vs
per-step cost. Decides whether the fix is tree quality (fewer visits) or
step cost (faster iteration)."""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    from hobbyrenderer_tpu.ops import bvh16 as b16
    from hobbyrenderer_tpu.ops.intersect import safe_inv_dir
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import make_stress_scene

    print("backend:", jax.default_backend(), flush=True)
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    bvh = rt.bvh16
    I = bvh.n_interior
    M = max(bvh.depth, 1)
    K = bvh.leaf_size

    R = 1 << 16
    rng = np.random.default_rng(7)
    lo = np.asarray(bvh.root_box[:3])
    hi = np.asarray(bvh.root_box[3:])
    o = jnp.asarray(lo + rng.random((R, 3), np.float32) * (hi - lo))
    dd = rng.normal(size=(R, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))

    # ---- steps-per-ray: run unphased with a per-lane live counter ---------
    def count_steps(o, d, budget):
        inv_d = safe_inv_dir(d)
        o3 = (o[:, 0], o[:, 1], o[:, 2])
        d3 = (d[:, 0], d[:, 1], d[:, 2])
        inv3 = (inv_d[:, 0], inv_d[:, 1], inv_d[:, 2])
        t_min = jnp.full((R,), 1e-4)
        state = (jnp.zeros(R, jnp.int32), jnp.zeros(R, jnp.int32),
                 jnp.zeros((R, M), jnp.int32), jnp.zeros((R, M), jnp.int32),
                 jnp.ones(R, bool), jnp.full((R,), 3e37),
                 jnp.full(R, -1, jnp.int32),
                 jnp.zeros(R), jnp.zeros(R), jnp.zeros(R, bool))

        def body(i, c):
            s, n = c
            s2 = b16._step16(bvh.table, I, M, K, o3, d3, inv3, t_min,
                             False, s)
            return s2, n + s[4].astype(jnp.int32)

        s, n = jax.lax.fori_loop(0, budget, body, (state, jnp.zeros(R, jnp.int32)))
        return n, s[4]

    f = jax.jit(count_steps, static_argnums=2)
    n, live = jax.block_until_ready(f(o, d, 512))
    n = np.asarray(n)
    print(f"steps/ray: mean {n.mean():.1f} p50 {np.percentile(n,50):.0f} "
          f"p90 {np.percentile(n,90):.0f} p99 {np.percentile(n,99):.0f} "
          f"max {n.max()} still-live {np.asarray(live).mean():.4f}",
          flush=True)

    # ---- per-step cost: fixed-budget loop, no cond --------------------------
    for budget in (32, 64, 128):
        for _ in range(2):
            jax.block_until_ready(f(o, d, budget))
        t0 = time.perf_counter()
        jax.block_until_ready(f(o, d, budget))
        dt = time.perf_counter() - t0
        print(f"budget {budget}: {dt*1e3:7.2f} ms -> "
              f"{dt/budget*1e6:6.1f} us/step ({R/(dt/budget)/1e6:6.0f} "
              f"Mlanes/s)", flush=True)

    # ---- bare gather at same R for reference -------------------------------
    idx0 = jnp.asarray(rng.integers(0, bvh.table.shape[0], R, dtype=np.int32))

    def g(idx):
        def body(_, c):
            idx, acc = c
            rows = jnp.take(bvh.table, idx, axis=0)
            s = rows.sum()
            return (idx + (s.astype(jnp.int32) & 7) + 1) % bvh.table.shape[0], acc + s
        return jax.lax.fori_loop(0, 64, body, (idx, jnp.float32(0)))

    gj = jax.jit(g)
    jax.block_until_ready(gj(idx0))
    t0 = time.perf_counter()
    jax.block_until_ready(gj(idx0))
    dt = (time.perf_counter() - t0) / 64
    print(f"bare row gather at R={R}: {dt*1e6:6.1f} us/step "
          f"({R/dt/1e6:6.0f} Mrows/s)", flush=True)


if __name__ == "__main__":
    main()
