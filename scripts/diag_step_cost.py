"""Isolate bvh16 per-step cost components on TPU: gather vs transpose vs
column math, and the transposed-table (axis=1) gather alternative."""

from __future__ import annotations

import time

import numpy as np


def bench_loop(make_body, iters=64, **init):
    import jax
    import jax.numpy as jnp

    def loop(idx):
        def body(_, c):
            idx, acc = c
            s, idx2 = make_body(idx)
            return idx2, acc + s
        return jax.lax.fori_loop(0, iters, body, (idx, jnp.float32(0)))

    f = jax.jit(loop)
    jax.block_until_ready(f(init["idx0"]))
    t0 = time.perf_counter()
    jax.block_until_ready(f(init["idx0"]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    N, W, R = 69905, 128, 1 << 16
    tab = jnp.asarray(rng.random((N, W), np.float32))
    tabT = jnp.asarray(np.asarray(tab).T.copy())      # (W, N)
    idx0 = jnp.asarray(rng.integers(0, N, R, dtype=np.int32))

    def nxt(s, idx):
        return (idx + (s.astype(jnp.int32) & 7) + 1) % N

    # 1. bare gather
    def g1(idx):
        rows = jnp.take(tab, idx, axis=0)
        s = rows.sum()
        return s, nxt(s, idx)
    print(f"gather only:            {bench_loop(g1, idx0=idx0)*1e6:8.1f} us",
          flush=True)

    # 2. gather + full transpose, sum columns
    def g2(idx):
        c = jnp.take(tab, idx, axis=0).T
        s = sum(c[k].sum() for k in range(0, 128, 8))
        return s, nxt(s, idx)
    print(f"gather + .T + 16 cols:  {bench_loop(g2, idx0=idx0)*1e6:8.1f} us",
          flush=True)

    # 3. gather + 28 direct column slices (no transpose op)
    def g3(idx):
        rows = jnp.take(tab, idx, axis=0)
        s = sum(rows[:, k].sum() for k in range(0, 128, 8))
        return s, nxt(s, idx)
    print(f"gather + 16 col slices: {bench_loop(g3, idx0=idx0)*1e6:8.1f} us",
          flush=True)

    # 4. transposed-table gather along axis=1 -> (W, R) directly SoA
    def g4(idx):
        cols = jnp.take(tabT, idx, axis=1)            # (128, R)
        s = sum(cols[k].sum() for k in range(0, 128, 8))
        return s, nxt(s, idx)
    print(f"T-table axis1 gather:   {bench_loop(g4, idx0=idx0)*1e6:8.1f} us",
          flush=True)

    # 5. gather + REAL step math on .T columns (16 box tests + 12 MT)
    o = jnp.asarray(rng.random((R,), np.float32))
    def g5(idx):
        c = jnp.take(tab, idx, axis=0).T
        best = jnp.full((R,), 1e30)
        for ch in range(16):
            t0_ = (c[6 * ch] - o) * o
            t1_ = (c[6 * ch + 3] - o) * o
            ten = jnp.minimum(t0_, t1_)
            tex = jnp.maximum(t0_, t1_)
            best = jnp.where((ten <= tex) & (tex > 0), jnp.minimum(best, ten),
                             best)
        s = best.sum()
        return s, nxt(s, idx)
    print(f"gather + .T + 16 box:   {bench_loop(g5, idx0=idx0)*1e6:8.1f} us",
          flush=True)

    # 6. 8 separate narrow gathers (W=16 tables) instead of one wide + T
    tabs16 = [jnp.asarray(np.asarray(tab)[:, k*16:(k+1)*16].copy())
              for k in range(8)]
    def g6(idx):
        s = jnp.float32(0)
        for tk in tabs16:
            rows = jnp.take(tk, idx, axis=0)
            s = s + rows.sum()
        return s, nxt(s, idx)
    print(f"8x narrow w16 gathers:  {bench_loop(g6, idx0=idx0)*1e6:8.1f} us",
          flush=True)


if __name__ == "__main__":
    main()
