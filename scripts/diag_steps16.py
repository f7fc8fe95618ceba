"""Time the REAL bvh16 lockstep step functions on TPU, chained, at several
wavefront widths — the attribution that decides where a Pallas traversal
kernel can win (gather vs one-hot fetch vs VPU step math vs bookkeeping).

Each timing runs the exact _step16_int / _step16_leaf / _step16 bodies in a
fori_loop with live state threading, on the real stress-scene BVH.
Writes /tmp/steps16.json.
"""

from __future__ import annotations

import json
import time

import numpy as np

OUT = {}


def chain(step_fn, state0, iters=16, warmup=2):
    import jax
    import jax.numpy as jnp

    def loop(state):
        def body(_, s):
            return step_fn(s)
        return jax.lax.fori_loop(0, iters, body, state)

    f = jax.jit(loop)
    for _ in range(warmup):
        jax.block_until_ready(f(state0))
    t0 = time.perf_counter()
    jax.block_until_ready(f(state0))
    return (time.perf_counter() - t0) / iters


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
    N = bvh.table.shape[1]
    print(f"tris={bvh.num_tris} I={I} N={N} M={M}", flush=True)

    rng = np.random.default_rng(7)
    lo = np.asarray(bvh.root_box[:3])
    hi = np.asarray(bvh.root_box[3:])

    for R in (262_144, 65_536, 16_384):
        o = jnp.asarray(lo + rng.random((R, 3), np.float32) * (hi - lo))
        dd = rng.normal(size=(R, 3)).astype(np.float32)
        d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
        inv = safe_inv_dir(d)
        o3 = (o[:, 0], o[:, 1], o[:, 2])
        d3 = (d[:, 0], d[:, 1], d[:, 2])
        inv3 = (inv[:, 0], inv[:, 1], inv[:, 2])
        t_min = jnp.full((R,), 1e-4)

        def mk_state(cur0):
            return (cur0, jnp.zeros((R, M), jnp.int32), jnp.ones(R, bool),
                    jnp.full((R,), 3e38), jnp.full(R, -1, jnp.int32))

        # rotate cur pseudo-randomly each iteration so the fetch pattern stays
        # random; keep it in-range
        def rot_int(s):
            cur, mask, live, bt, btri = s
            cur2 = (cur * 1103515245 + 12345) & 0x7fffffff
            return (cur2 % I, mask, live, bt, btri)

        def rot_leaf(s):
            cur, mask, live, bt, btri = s
            cur2 = (cur * 1103515245 + 12345) & 0x7fffffff
            return (I + cur2 % (N - I), mask, live, bt, btri)

        cur_i = jnp.asarray(rng.integers(0, I, R, dtype=np.int32))
        cur_l = jnp.asarray(rng.integers(I, N, R, dtype=np.int32))

        # A. full interior MXU step
        def step_int(s):
            s2 = b16._step16_int(bvh.int_bf, I, M, o3, inv3, False, s)
            return rot_int((s2[0], s2[1], jnp.ones(R, bool), s2[3], s2[4]))

        dt = chain(step_int, mk_state(cur_i))
        OUT[f"int_step_R{R}"] = dt * 1e3
        print(f"int step   R={R:7d}  {dt*1e3:8.3f} ms "
              f"({R/dt/1e6:6.1f} Mlanes/s)", flush=True)

        # B. full leaf step (gather + 12 MT tests + pop)
        def step_leaf(s):
            s2 = b16._step16_leaf(bvh.table, I, M, K, o3, d3, t_min, False, s)
            return rot_leaf((s2[0], s2[1], jnp.ones(R, bool),
                             jnp.full((R,), 3e38), s2[4]))

        dt = chain(step_leaf, mk_state(cur_l))
        OUT[f"leaf_step_R{R}"] = dt * 1e3
        print(f"leaf step  R={R:7d}  {dt*1e3:8.3f} ms "
              f"({R/dt/1e6:6.1f} Mlanes/s)", flush=True)

        # C. bare unified-table gather at this width (the leaf fetch alone)
        def step_g(s):
            cur, mask, live, bt, btri = s
            cols = bvh.table[:, cur]
            ssum = cols[0].sum() + cols[64].sum()
            cur2 = ((cur + ssum.astype(jnp.int32) % 7 + 1)
                    * 1103515245 + 12345) & 0x7fffffff
            return (I + cur2 % (N - I), mask, live, bt, btri)

        dt = chain(step_g, mk_state(cur_l))
        OUT[f"gather_R{R}"] = dt * 1e3
        print(f"gather     R={R:7d}  {dt*1e3:8.3f} ms "
              f"({R/dt/1e6:6.1f} Mrows/s)", flush=True)

        # D. unified (gather-both) step for comparison
        def step_u(s):
            s2 = b16._step16(bvh.table, I, M, K, o3, d3, inv3, t_min,
                             False, s)
            return rot_int((s2[0], s2[1], jnp.ones(R, bool), s2[3], s2[4]))

        dt = chain(step_u, mk_state(cur_i))
        OUT[f"unified_step_R{R}"] = dt * 1e3
        print(f"unif step  R={R:7d}  {dt*1e3:8.3f} ms "
              f"({R/dt/1e6:6.1f} Mlanes/s)", flush=True)

    with open("/tmp/steps16.json", "w") as f:
        json.dump(OUT, f, indent=1)
    print("wrote /tmp/steps16.json", flush=True)


if __name__ == "__main__":
    main()
