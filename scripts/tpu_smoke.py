"""TPU hardware smoke + microbench — run the moment the axon tunnel is up.

Covers VERDICT-r2 weak #8 (all Pallas kernels TPU-untested in r2) and
produces the round-3 perf evidence: kernel compile/run checks, the
incoherent-trace microbench (item 2's >= 5 Mrays/s target), the flagship
frame time with per-pass breakdown (item 1/3), and the PT Msamples/s/chip
BASELINE metric.

Usage:  python scripts/tpu_smoke.py [--full]
Writes /tmp/tpu_smoke.json and prints one section per check; safe to re-run.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

OUT = {}


def section(name):
    print(f"\n=== {name} ===", flush=True)


def bench(fn, *args, warmup=2, iters=8):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, r


def main(full: bool = False):
    import jax
    import jax.numpy as jnp
    devs = jax.devices()
    print("devices:", devs)
    OUT["backend"] = jax.default_backend()
    assert jax.default_backend() != "cpu", "not on TPU — aborting"

    from hobbyrenderer_tpu.config import Config, RenderingMode, RenderSettings
    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    from hobbyrenderer_tpu.scene import Camera, make_stress_scene
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu

    # ---- scene (the bench stand-in) ----
    section("scene build (stress:12, ~528k tris)")
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    n_tris = int(rt.bvh.num_tris)
    print("tris:", n_tris)

    # ---- kernel smokes ----
    section("beam any-hit kernel (coherent)")
    from hobbyrenderer_tpu.ops import beam as beamops
    H, W = 256, 256
    o = jnp.broadcast_to(jnp.asarray([0.0, 8.0, 14.0]), (H, W, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -0.5, -0.8]), (H, W, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    act = jnp.ones((H, W), bool)
    tmax = jnp.full((H, W), 1e8)
    t_beam, occ = bench(
        lambda: beamops.beam_any_hit(rt.btable, o, d, tmax, act, H, W))
    print(f"{t_beam * 1e3:.2f} ms for {H * W} rays "
          f"-> {H * W / t_beam / 1e6:.1f} Mrays/s")
    OUT["beam_mrays"] = H * W / t_beam / 1e6

    section("bvh16 closest-hit (incoherent dispatch path)")
    from hobbyrenderer_tpu.ops import trace as traceops
    R = 1 << 18      # 262k incoherent rays
    rng = np.random.default_rng(7)
    lo = np.asarray(rt.bvh.root_box[:3])
    hi = np.asarray(rt.bvh.root_box[3:])
    o_i = jnp.asarray(lo + rng.random((R, 3), np.float32) * (hi - lo))
    dd = rng.normal(size=(R, 3)).astype(np.float32)
    d_i = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))

    fn = jax.jit(lambda o, d: traceops.closest_hit_auto(rt, o, d))
    t_inc, rec = bench(fn, o_i, d_i)
    hitrate = float(np.asarray(rec.tri >= 0).mean())
    print(f"{t_inc * 1e3:.2f} ms for {R} rays "
          f"-> {R / t_inc / 1e6:.2f} Mrays/s (hit rate {hitrate:.2f})")
    OUT["incoherent_mrays"] = R / t_inc / 1e6

    # wavefront baseline for the same rays
    from hobbyrenderer_tpu.ops import bvh as bvhops
    fnw = jax.jit(lambda o, d: bvhops.bvh_closest_hit(rt.bvh, o, d))
    t_wav, recw = bench(fnw, o_i, d_i, warmup=1, iters=3)
    print(f"wavefront: {t_wav * 1e3:.2f} ms -> {R / t_wav / 1e6:.2f} Mrays/s "
          f"(kernel speedup {t_wav / t_inc:.1f}x)")
    OUT["wavefront_mrays"] = R / t_wav / 1e6
    # agreement
    agree = float((np.asarray(rec.tri) == np.asarray(recw.tri)).mean())
    print(f"kernel vs wavefront hit agreement: {agree:.4f}")
    OUT["trace_agreement"] = agree

    # ---- flagship frame ----
    section("flagship frame (1080p normal, restir+restir)")
    cfg = Config(scene="stress", width=1920, height=1080,
                 mode=RenderingMode.NORMAL, direct_mode="restir",
                 indirect_mode="restir")
    from hobbyrenderer_tpu.renderer import Renderer
    r = Renderer(cfg)
    for _ in range(3):
        r.render_frame()                       # compile + warm
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        ldr = r.render_frame()
    import jax as _j
    _j.block_until_ready(ldr)
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"flagship: {ms:.1f} ms/frame")
    OUT["flagship_ms"] = ms

    if full:
        section("per-pass breakdown (--execute-per-pass)")
        stats = r.render_frame_per_pass(repeats=4) \
            if hasattr(r, "render_frame_per_pass") else None
        if stats is None:
            # drive through the model API
            timings = getattr(r._model.graph, "last_pass_timings", None)
            print("per-pass API not exposed on Renderer; use "
                  "--execute-per-pass via CLI")
        else:
            for row in stats:
                print(f"  {row['pass']:20s} {row['ms']:8.2f} ms")
            OUT["per_pass"] = stats
    r.shutdown()

    # ---- PT throughput (BASELINE.json metric) ----
    section("path tracer Msamples/s/chip (720p, stress)")
    cfgp = Config(scene="stress", width=1280, height=720,
                  mode=RenderingMode.PATH_TRACER)
    rp = Renderer(cfgp)
    rp.render_frame()                          # compile
    t0 = time.perf_counter()
    Np = 4
    for _ in range(Np):
        ldr = rp.render_frame()
    _j.block_until_ready(ldr)
    spf = (time.perf_counter() - t0) / Np
    msamp = 1280 * 720 / spf / 1e6
    print(f"PT: {spf * 1e3:.0f} ms/frame -> {msamp:.2f} Msamples/s/chip")
    OUT["pt_msamples_s"] = msamp
    rp.shutdown()

    with open("/tmp/tpu_smoke.json", "w") as f:
        json.dump(OUT, f, indent=1)
    print("\nwrote /tmp/tpu_smoke.json")


if __name__ == "__main__":
    main(full="--full" in sys.argv)
