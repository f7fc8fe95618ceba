"""Split the RTXDI no-visibility chain on TPU at 1080p: candidates vs
temporal vs boiling vs spatial vs finalize — the r5 optimization map for the
~70 ms (real) reservoir chain. Each timing is a jitted truncated chain;
numbers carry the ~30 ms tunnel dispatch latency (subtract the floor)."""

from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, warmup=1, iters=4):
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

    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer
    from hobbyrenderer_tpu.ops import restir as restirops

    print("backend:", jax.default_backend(), flush=True)
    W, H = 1920, 1080
    cfg = Config(scene="stress", width=W, height=H,
                 mode=RenderingMode.NORMAL,
                 direct_mode="restir", indirect_mode="restir")
    r = Renderer(cfg)
    ldr = r.render_frame()
    jax.block_until_ready(ldr)
    gpu, rt = r.gpu, r._model.rt
    vc = r.camera.view_constants(1)
    settings = cfg.settings.as_pytree()
    from hobbyrenderer_tpu.graph.rendergraph import FrameContext
    model = r._model

    @jax.jit
    def gb_fn(gpu, rt, vc, state):
        ctx = FrameContext(gpu=gpu, vc=vc, settings=settings, config=cfg,
                           dt=jnp.float32(1 / 60), rt=rt)
        return model.graph.execute(ctx, state,
                                   outputs=("gbuffer",))["outputs"]["gbuffer"]

    gb = gb_fn(gpu, rt, vc, model.state)
    jax.block_until_ready(gb.depth)
    prev = restirops.reservoir_init(H, W)
    fi = jnp.uint32(2)

    for taps, boil, label in [(0, 0.0, "candidates+temporal"),
                              (0, 20.0, "+boiling"),
                              (2, 20.0, "+2 spatial taps"),
                              (4, 20.0, "+4 spatial taps")]:
        f = jax.jit(lambda gpu, rt, gb, vc, prev, taps=taps, boil=boil:
                    restirops.restir_di(gpu, rt, gb, vc, settings, prev, fi,
                                        visibility=False, spatial_taps=taps,
                                        boiling_mult=boil)[0])
        t, _ = bench(f, gpu, rt, gb, vc, prev)
        print(f"{label:22s}: {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
