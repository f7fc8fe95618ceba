"""TPU primitive microbench: the numbers that decide the incoherent-trace
kernel design (VERDICT-r3 item 2).

Every measurement CHAINS iterations (each op's result perturbs the next op's
indices) inside one jitted fori_loop — nothing can be elided, overlapped, or
constant-folded. An earlier un-chained version reported 21 TB/s "gathers";
these numbers are real.

Measures, on the real chip:
  1. Random ROW GATHER (jnp.take axis=0) throughput vs row width, table size,
     dtype, and index sortedness — the wavefront BVH walk's inner op
     (ops/bvh.py:409 does one table[node] row gather per ray per step).
  2. One-hot MXU matmul gather for VMEM-size tables (the gather-free
     alternative for shallow top levels).
  3. Sort / sort-kv throughput at worklist sizes (per-step ray re-binning).
  4. A fused wavefront-step analogue (gather + box math) to see what the
     compiler does with the surrounding compute.

Usage: python scripts/prim_bench.py   (writes /tmp/prim_bench.json)
"""

from __future__ import annotations

import json
import time

import numpy as np

OUT = {}


def chain_bench(make_step, idx0, iters=16, warmup=1):
    """make_step(idx) -> (scalar, next_idx); runs a jitted fori_loop chain."""
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
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    R = 262_144

    # ---- 1. row gather: width x table-size x dtype x sortedness ----------
    for N in (175_000, 16_384):
        for W in (8, 32, 64, 128, 256):
            for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
                if dt_name == "bf16" and W not in (64, 128):
                    continue
                tab = jnp.asarray(rng.random((N, W), np.float32)).astype(dt)
                for srt in (False, True):
                    idx0 = rng.integers(0, N, R, dtype=np.int32)
                    if srt:
                        idx0 = np.sort(idx0)
                    idx0 = jnp.asarray(idx0)

                    def step(idx, tab=tab, N=N):
                        rows = jnp.take(tab, idx, axis=0)
                        s = rows.astype(jnp.float32).sum()
                        # scalar-dependent shift: +k preserves sortedness
                        # (mod wrap), serializes iterations
                        k = (s.astype(jnp.int32) & 7) + 1
                        return s, (idx + k) % N

                    dtm = chain_bench(step, idx0)
                    bpe = 2 if dt_name == "bf16" else 4
                    gbps = R * W * bpe / dtm / 1e9
                    key = (f"take_N{N}_w{W}_{dt_name}"
                           f"{'_sorted' if srt else ''}")
                    OUT[key] = {"ms": dtm * 1e3, "GBps": gbps,
                                "Mrows_s": R / dtm / 1e6}
                    print(f"{key:40s} {dtm*1e3:8.2f} ms {gbps:7.1f} GB/s "
                          f"{R/dtm/1e6:7.1f} Mrows/s", flush=True)

    # ---- 2. one-hot MXU gather (bf16) for small tables --------------------
    for N in (512, 2048, 8192, 32768):
        W = 32
        tab = jnp.asarray(rng.random((N, W), np.float32)).astype(jnp.bfloat16)
        idx0 = jnp.asarray(rng.integers(0, N, R, dtype=np.int32))

        def step(idx, tab=tab, N=N):
            oh = (idx[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
            rows = oh @ tab                       # (R, W) bf16 on the MXU
            s = rows.astype(jnp.float32).sum()
            k = (s.astype(jnp.int32) & 7) + 1
            return s, (idx + k) % N

        dtm = chain_bench(step, idx0, iters=4)
        key = f"onehot_N{N}_w{W}_bf16"
        OUT[key] = {"ms": dtm * 1e3, "Mrows_s": R / dtm / 1e6}
        print(f"{key:40s} {dtm*1e3:8.2f} ms          {R/dtm/1e6:7.1f} "
              f"Mrows/s", flush=True)

    # ---- 3. sort / sort-kv at worklist sizes -------------------------------
    for Rs in (262_144, 1_048_576, 4_194_304):
        k0 = jnp.asarray(rng.integers(0, 1 << 22, Rs, dtype=np.int32))

        def step(k, Rs=Rs):
            ks = jnp.sort(k)
            s = ks[Rs // 2].astype(jnp.float32)
            return s, (k + ks[::7][:Rs // 7].sum() % 13 + 1)

        dtm = chain_bench(step, k0, iters=4)
        OUT[f"sort_i32_R{Rs}"] = {"ms": dtm * 1e3, "Melem_s": Rs / dtm / 1e6}
        print(f"sort_i32_R{Rs:<9} {dtm*1e3:8.2f} ms  {Rs/dtm/1e6:8.1f} "
              f"Melem/s", flush=True)

        v0 = jnp.asarray(rng.random(Rs, np.float32))

        def stepkv(k, Rs=Rs, v0=v0):
            ks, vs = jax.lax.sort([k, v0], num_keys=1)
            s = vs.sum()
            return s, k + (ks[Rs // 2] & 3) + 1

        dtm2 = chain_bench(stepkv, k0, iters=4)
        OUT[f"sortkv_R{Rs}"] = {"ms": dtm2 * 1e3, "Melem_s": Rs / dtm2 / 1e6}
        print(f"sortkv_R{Rs:<9} {dtm2*1e3:8.2f} ms  {Rs/dtm2/1e6:8.1f} "
              f"Melem/s", flush=True)

    # ---- 4. fused wavefront-step analogue ----------------------------------
    # gather a 32-f32 node row per ray + 4 child AABB slab tests + next-node
    # arithmetic: what one traversal step actually costs end-to-end.
    N = 175_000
    tab = jnp.asarray(rng.random((N, 32), np.float32))
    o = jnp.asarray(rng.random((R, 3), np.float32))
    dinv = jnp.asarray(1.0 / (rng.random((R, 3), np.float32) - 0.5))
    idx0 = jnp.asarray(rng.integers(0, N, R, dtype=np.int32))

    def step(idx):
        rows = jnp.take(tab, idx, axis=0)          # (R, 32)
        best = jnp.full((R,), 1e30)
        nxt = jnp.zeros((R,), jnp.int32)
        for c in range(4):
            lo = rows[:, 6 * c:6 * c + 3]
            hi = rows[:, 6 * c + 3:6 * c + 6]
            t1 = (lo - o) * dinv
            t2 = (hi - o) * dinv
            ten = jnp.minimum(t1, t2).max(-1)
            tex = jnp.maximum(t1, t2).min(-1)
            hit = (ten <= tex) & (tex > 0)
            better = hit & (ten < best)
            best = jnp.where(better, ten, best)
            nxt = jnp.where(better, 4 * idx + 1 + c, nxt)
        s = best.sum()
        return s, nxt % N

    dtm = chain_bench(step, idx0)
    OUT["wavestep_R262144"] = {"ms": dtm * 1e3, "Msteps_s": R / dtm / 1e6}
    print(f"wavestep_R262144 {dtm*1e3:8.2f} ms  {R/dtm/1e6:8.1f} Msteps/s",
          flush=True)

    with open("/tmp/prim_bench.json", "w") as f:
        json.dump(OUT, f, indent=1)
    print("wrote /tmp/prim_bench.json")


if __name__ == "__main__":
    main()
