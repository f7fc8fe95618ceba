"""Microbench the EXACT interior-fetch forms for the bvh16 MXU-split walk.

Candidates, at the real shapes (interior table I=4369 -> Ip=4480, 96 f32 of
box data per node, wavefront R):
  A. gather_t:   table_T[:, idx] on the (128, N) TRANSPOSED table — what
                 _step16 actually does today (prim_bench measured axis-0
                 takes of (N, W); the axis-1 form may differ).
  B. onehot1:    (96, Ip)bf16 @ iota-one-hot (Ip, R)bf16 -> (96, R)f32.
  C. onehot2:    two-level: oh = oh_hi (Ih, R) x oh_lo (128, R); contraction
                 einsum('chl,lr->chr') then select h — one-hot GENERATION
                 drops from Ip*R to (Ih+128)*R elements.
  D. full int step (_step16_int) vs gather-step interior section, chained.

Writes /tmp/mxu_step.json.
"""

from __future__ import annotations

import json
import time

import numpy as np

OUT = {}


def chain(make_step, idx0, iters=8, warmup=1):
    import jax
    import jax.numpy as jnp

    def loop(idx):
        def body(_, c):
            idx, acc = c
            s, idx2 = make_step(idx)
            return idx2, acc + s
        return jax.lax.fori_loop(0, iters, body, (idx, jnp.float32(0.0)))

    f = jax.jit(loop)
    for _ in range(warmup):
        jax.block_until_ready(f(idx0))
    t0 = time.perf_counter()
    jax.block_until_ready(f(idx0))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    I = 4369
    Ip = 4480
    N = 69905            # I + L for the 528k-tri stress scene
    int_bf = jnp.asarray(rng.random((96, Ip), np.float32)) \
        .astype(jnp.bfloat16)
    table_T = jnp.asarray(rng.random((128, N), np.float32))

    for R in (262_144, 65_536, 8_192):
        idx0 = jnp.asarray(rng.integers(0, I, R, dtype=np.int32))

        # A. transposed-table gather (the current unified step's fetch)
        def stepA(idx):
            cols = table_T[:, idx]                     # (128, R)
            s = cols.sum()
            k = (s.astype(jnp.int32) & 7) + 1
            return s, (idx + k) % I

        dt = chain(stepA, idx0)
        OUT[f"gather_t_R{R}"] = dt * 1e3
        print(f"gather_t  R={R:7d}  {dt*1e3:8.3f} ms  "
              f"{R/dt/1e6:7.1f} Mrows/s", flush=True)

        # B. single one-hot matmul
        def stepB(idx):
            oh = (jax.lax.broadcasted_iota(jnp.int32, (Ip, R), 0)
                  == idx[None, :])
            cols = jax.lax.dot_general(int_bf, oh.astype(jnp.bfloat16),
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            s = cols.sum()
            k = (s.astype(jnp.int32) & 7) + 1
            return s, (idx + k) % I

        dt = chain(stepB, idx0)
        OUT[f"onehot1_R{R}"] = dt * 1e3
        print(f"onehot1   R={R:7d}  {dt*1e3:8.3f} ms  "
              f"{R/dt/1e6:7.1f} Mrows/s", flush=True)

        # C. two-level one-hot: idx = h*128 + l
        Ih = Ip // 128
        tab3 = int_bf.reshape(96, Ih, 128)

        def stepC(idx):
            hi = idx >> 7
            lo = idx & 127
            oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, R), 0)
                     == lo[None, :]).astype(jnp.bfloat16)
            # (96*Ih, 128) @ (128, R) -> (96, Ih, R) : MXU, K=128
            chr_ = jax.lax.dot_general(
                tab3.reshape(96 * Ih, 128), oh_lo,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(96, Ih, R)
            oh_hi = (jax.lax.broadcasted_iota(jnp.int32, (Ih, R), 0)
                     == hi[None, :]).astype(jnp.float32)
            cols = jnp.sum(chr_ * oh_hi[None], axis=1)   # (96, R) VPU select
            s = cols.sum()
            k = (s.astype(jnp.int32) & 7) + 1
            return s, (idx + k) % I

        dt = chain(stepC, idx0)
        OUT[f"onehot2_R{R}"] = dt * 1e3
        print(f"onehot2   R={R:7d}  {dt*1e3:8.3f} ms  "
              f"{R/dt/1e6:7.1f} Mrows/s", flush=True)

    with open("/tmp/mxu_step.json", "w") as f:
        json.dump(OUT, f, indent=1)
    print("wrote /tmp/mxu_step.json", flush=True)


if __name__ == "__main__":
    main()
