"""RTXDI + specular cost structure on a REAL 1080p stress-scene G-buffer
(TPU): restir_di with/without winner visibility, specular_indirect with the
step caps. Pinpoints where the 1.5 s per-pass times go."""

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
    from hobbyrenderer_tpu.ops import specular as specops
    from hobbyrenderer_tpu.ops import ibl as iblops

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

    # real G-buffer straight from the graph (same resolve the frame uses)
    model = r._model
    from hobbyrenderer_tpu.graph.rendergraph import FrameContext

    @jax.jit
    def gb_fn(gpu, rt, vc, state):
        ctx = FrameContext(gpu=gpu, vc=vc, settings=settings, config=cfg,
                           dt=jnp.float32(1 / 60), rt=rt)
        return model.graph.execute(ctx, state,
                                   outputs=("gbuffer",))["outputs"]["gbuffer"]

    gb = gb_fn(gpu, rt, vc, model.state)
    jax.block_until_ready(gb.depth)
    print("gbuffer valid frac:",
          float(np.asarray(gb.valid).mean()), flush=True)

    prev = restirops.reservoir_init(H, W)
    fi = jnp.uint32(2)

    def di(vis):
        f = jax.jit(lambda gpu, rt, gb, vc, prev: restirops.restir_di(
            gpu, rt, gb, vc, settings, prev, fi, visibility=vis)[0])
        return bench(f, gpu, rt, gb, vc, prev)

    t_nv, _ = di(False)
    print(f"restir_di NO visibility : {t_nv*1e3:8.1f} ms", flush=True)
    t_v, _ = di(True)
    print(f"restir_di +visibility   : {t_v*1e3:8.1f} ms "
          f"(visibility = {(t_v-t_nv)*1e3:.1f} ms)", flush=True)

    # specular with the new caps
    st = specops.spec_state_init(H, W)
    sun = jnp.asarray([0.35, 0.8, 0.49], jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    irr = iblops.build_sky_irradiance(sun, settings)
    f_sp = jax.jit(lambda gpu, rt, gb, vc, st: specops.specular_indirect(
        gpu, rt, gb, vc, settings, st, fi, sun_dir=sun,
        sky_sh=irr)[0])
    t_sp, _ = bench(f_sp, gpu, rt, gb, vc, st)
    print(f"specular_indirect       : {t_sp*1e3:8.1f} ms", flush=True)

    # glossy active fraction on this scene (phase-tuning input)
    rough = np.asarray(gb.orm[..., 1])
    val = np.asarray(gb.valid)
    act = ((rough < specops.ROUGH_MAX) & val).mean()
    print(f"specular active fraction: {act:.3f}", flush=True)


if __name__ == "__main__":
    main()
