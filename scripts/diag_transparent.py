"""Break down the Transparent pass cost on TPU at 1080p: raster bins vs
resolve vs shading vs refracted background fetch."""

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
    from hobbyrenderer_tpu.ops import culling as cullops
    from hobbyrenderer_tpu.ops import raster as rasterops
    from hobbyrenderer_tpu.ops import refraction as refrops
    from hobbyrenderer_tpu.ops import sky as skyops

    print("backend:", jax.default_backend(), flush=True)
    W, H = 1920, 1080
    cfg = Config(scene="stress", width=W, height=H,
                 mode=RenderingMode.NORMAL_BASIC)
    r = Renderer(cfg)
    gpu, vc = r.gpu, r.camera.view_constants(0)
    settings = cfg.settings.as_pytree()
    cap = r._model.transparent_capacity if hasattr(r._model, "transparent_capacity") else None
    from hobbyrenderer_tpu.models import deferred as dd
    gb_hdr = None

    # opaque gbuffer + hdr via a basic frame
    ldr = r.render_frame()
    jax.block_until_ready(ldr)

    alpha_ok = jnp.asarray([False, False, True])

    def cull_only(gpu, vc):
        cull = cullops.cull_pairs(gpu, vc, alpha_mask=alpha_ok)
        return cull["mask"].sum()

    t, n = bench(jax.jit(cull_only), gpu, vc)
    n_t = int(np.asarray(n))
    print(f"transparent meshlet pairs live: {n_t}  cull {t*1e3:.1f} ms",
          flush=True)

    tcap = max(n_t, 1)
    # round up to the pipeline's static capacity choice
    from hobbyrenderer_tpu.utils.math import next_pow2
    tcap = int(next_pow2(tcap)) if hasattr(jnp, "ndarray") else tcap

    def raster_bin(gpu, vc):
        cull = cullops.cull_pairs(gpu, vc, alpha_mask=alpha_ok)
        slots, _ = cullops.compact_mask(cull["mask"], tcap)
        ro, aux, attr = rasterops.rasterize(gpu, vc, slots, W, H,
                                            double_sided_all=False,
                                            resolve_attrs=True)
        return ro.depth.sum()

    t, _ = bench(jax.jit(raster_bin), gpu, vc)
    print(f"one transparent raster bin (cap {tcap}): {t*1e3:.1f} ms",
          flush=True)

    def raster_resolve(gpu, vc):
        cull = cullops.cull_pairs(gpu, vc, alpha_mask=alpha_ok)
        slots, _ = cullops.compact_mask(cull["mask"], tcap)
        ro, aux, attr = rasterops.rasterize(gpu, vc, slots, W, H,
                                            double_sided_all=False,
                                            resolve_attrs=True)
        tgb = rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux,
                                        attr_img=attr)
        return tgb.albedo.sum()

    t, _ = bench(jax.jit(raster_resolve), gpu, vc)
    print(f"bin + resolve: {t*1e3:.1f} ms", flush=True)

    # refracted background fetch alone on synthetic inputs
    rng = np.random.default_rng(0)
    hdr = jnp.asarray(rng.random((H, W, 3), np.float32))
    wpos = jnp.asarray(rng.random((H, W, 3), np.float32) * 10)
    opos = wpos + 1.0
    nrm = jnp.asarray(np.tile(np.asarray([0, 0, 1], np.float32), (H, W, 1)))
    vdir = nrm * jnp.asarray([0, 0, -1.0])
    ior = jnp.full((H, W), 1.5)
    rough = jnp.full((H, W), 0.1)
    atten = jnp.ones((H, W, 3))
    adist = jnp.ones((H, W))
    valid = jnp.ones((H, W), bool)
    sun = jnp.asarray([0.3, 0.8, 0.5]) / jnp.linalg.norm(jnp.asarray([0.3, 0.8, 0.5]))

    def refr(hdr, wpos):
        return refrops.refracted_background(
            hdr, vc, wpos, opos, nrm, vdir, ior, rough, atten, adist, valid,
            miss_fn=lambda d: skyops.sky_radiance_fast(d, sun, settings)).sum()

    t, _ = bench(jax.jit(refr), hdr, wpos)
    print(f"refracted_background: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
