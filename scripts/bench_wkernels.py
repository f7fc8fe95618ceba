"""Microkernels isolating the wtrace per-step costs on TPU.

CAVEAT (measured r5): the repeat-loop methodology here is INVALID as-is —
Mosaic hoists/elides loop bodies whose outputs don't feed forward (K1
reported 0.3 ns/row, physically impossible), so these numbers must not be
trusted until the bodies carry cross-iteration dependences. Kept for the
kernel scaffolding; the trustworthy per-step numbers come from
scripts/diag_wsteps.py (real kernel, steps output): int ~17 us, leaf ~60 us.

K1: the leaf-step DMA pattern alone (issue RB random 512B rows, bulk wait),
    N repetitions — per-step cost vs rows, stripes, randomness.
K2: the interior-step fetch alone (one-hot build + (96,Ip)x(Ip,128) matmul
    per sub-row), N repetitions — per-step cost, one-hot build share.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB, LANE = 2048, 128
SUB = RB // LANE

def bench(f, *a, n=5, **kw):
    jax.block_until_ready(f(*a, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*a, **kw))
    return (time.perf_counter() - t0) / n, out

# ---------------- K1: DMA pattern ----------------
def k1_kernel(idx_ref, leaf_hbm, out_ref, idx_smem, leafbuf, dsem, ssem,
              *, iters, rows, unroll, nq):
    cp = pltpu.make_async_copy(idx_ref, idx_smem, ssem)
    cp.start(); cp.wait()
    def body(i, c):
        def issue(j, n):
            r = j * unroll
            for u in range(unroll):
                rr = r + u
                pltpu.make_async_copy(
                    leaf_hbm.at[idx_smem[rr // LANE, rr % LANE]],
                    leafbuf.at[rr], dsem.at[rr % nq]).start()
            return n
        jax.lax.fori_loop(0, rows // unroll, issue, jnp.int32(0))
        for q in range(nq):
            pltpu.make_async_copy(leafbuf.at[pl.ds(0, rows // nq)],
                                  leafbuf.at[pl.ds(0, rows // nq)],
                                  dsem.at[q]).wait()
        return c + 1
    jax.lax.fori_loop(0, iters, body, jnp.int32(0))
    out_ref[...] = leafbuf[pl.ds(0, SUB), :]

@functools.partial(jax.jit, static_argnames=("iters", "rows", "unroll", "nq"))
def k1(idx, leaf, *, iters, rows, unroll=8, nq=8):
    return pl.pallas_call(
        functools.partial(k1_kernel, iters=iters, rows=rows, unroll=unroll,
                          nq=nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((SUB, LANE), jnp.int32),
                        pltpu.VMEM((RB, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA((8,)),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, leaf)

# ---------------- K2: interior fetch ----------------
def k2_kernel(idx_ref, int_ref, out_ref, *, iters, Ip, subs):
    def body(i, c):
        acc = jnp.zeros((1, LANE), jnp.float32)
        for g in range(subs):
            idx_g = (idx_ref[g] + i) % Ip
            oh = (jax.lax.broadcasted_iota(jnp.int32, (Ip, LANE), 0)
                  == idx_g[None, :]).astype(jnp.bfloat16)
            cols = jax.lax.dot_general(int_ref[...], oh,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            acc = acc + cols[0][None]
        out_ref[...] = acc
        return c + 1
    jax.lax.fori_loop(0, iters, body, jnp.int32(0))

@functools.partial(jax.jit, static_argnames=("iters", "Ip", "subs"))
def k2(idx, intbf, *, iters, Ip, subs=16):
    return pl.pallas_call(
        functools.partial(k2_kernel, iters=iters, Ip=Ip, subs=subs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, intbf)

# K2b: factorized one-hot (hc-ordered table): inner matmul over 128-lo then
# 35-term combine with static slices
def k2b_kernel(idx_ref, int_hc_ref, out_ref, *, iters, Ip, subs):
    HB = Ip // 128
    def body(i, c):
        acc = jnp.zeros((1, LANE), jnp.float32)
        for g in range(subs):
            idx_g = (idx_ref[g] + i) % Ip
            hi = idx_g // 128
            lo = idx_g % 128
            oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, LANE), 0)
                     == lo[None, :]).astype(jnp.bfloat16)
            inner = jax.lax.dot_general(int_hc_ref[...], oh_lo,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            cols = jnp.zeros((96, LANE), jnp.float32)
            for h in range(HB):
                sel = (hi[None, :] == h).astype(jnp.float32)
                cols = cols + inner[96 * h:96 * h + 96, :] * sel
            acc = acc + cols[0][None]
        out_ref[...] = acc
        return c + 1
    jax.lax.fori_loop(0, iters, body, jnp.int32(0))

@functools.partial(jax.jit, static_argnames=("iters", "Ip", "subs"))
def k2b(idx, int_hc, *, iters, Ip, subs=16):
    return pl.pallas_call(
        functools.partial(k2b_kernel, iters=iters, Ip=Ip, subs=subs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, int_hc)

def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)
    Lrows = 65536
    leaf = jnp.asarray(rng.random((Lrows, LANE), np.float32))
    idx_rand = jnp.asarray(rng.integers(0, Lrows, (SUB, LANE)).astype(np.int32))
    idx_seq = jnp.asarray((np.arange(RB) % Lrows).reshape(SUB, LANE).astype(np.int32))

    ITERS = 64
    for name, rows, nq, idx in [
        ("rand rows=2048 nq=8", RB, 8, idx_rand),
        ("rand rows=2048 nq=1", RB, 1, idx_rand),
        ("rand rows=1024 nq=8", 1024, 8, idx_rand),
        ("rand rows=512  nq=8", 512, 8, idx_rand),
        ("seq  rows=2048 nq=8", RB, 8, idx_seq),
    ]:
        dt, _ = bench(k1, idx, leaf, iters=ITERS, rows=rows, nq=nq)
        per = dt / ITERS * 1e6
        print(f"K1 {name}: {per:8.2f} us/step  ({per/rows*1e3:.1f} ns/row)",
              flush=True)

    Ip = 4480
    intbf = jnp.asarray(rng.random((96, Ip), np.float32).astype(np.float32)).astype(jnp.bfloat16)
    idxs = jnp.asarray(rng.integers(0, Ip, (SUB, LANE)).astype(np.int32))
    dt, _ = bench(k2, idxs, intbf, iters=ITERS, Ip=Ip)
    print(f"K2 onehot full Ip={Ip}: {dt/ITERS*1e6:8.2f} us/step", flush=True)
    # hc-reordered table for K2b: rows (h*96 + c) = int_bf[c, 128h + l]
    HB = Ip // 128
    hc = np.asarray(intbf, dtype=np.float32).reshape(96, HB, 128) \
        .transpose(1, 0, 2).reshape(HB * 96, 128)
    int_hc = jnp.asarray(hc).astype(jnp.bfloat16)
    dt, _ = bench(k2b, idxs, int_hc, iters=ITERS, Ip=Ip)
    print(f"K2b factorized   Ip={Ip}: {dt/ITERS*1e6:8.2f} us/step", flush=True)
    idxs512 = jnp.asarray(rng.integers(0, 512, (SUB, LANE)).astype(np.int32))
    dt, _ = bench(k2, idxs512, intbf[:, :512], iters=ITERS, Ip=512)
    print(f"K2 onehot Ip=512 (shallow-only table): {dt/ITERS*1e6:8.2f} us/step",
          flush=True)

main()
