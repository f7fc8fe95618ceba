"""Benchmark driver: one JSON line on stdout.

Headline metric (BASELINE.json north star): deferred frame time at 1080p on the
stress benchmark scene (the Sponza-class stand-in — the reference ships no scene
assets), single chip. Target < 16 ms => vs_baseline = 16 / measured_ms.
"""

from __future__ import annotations

import json
import sys
import time


def _wait_for_device(max_wait_s: float = 900.0) -> None:
    """The axon TPU tunnel occasionally drops and recovers after minutes; a
    bench run that lands in that window must wait, not record garbage."""
    import jax
    import numpy as np

    t0 = time.monotonic()
    while True:
        try:
            import jax.numpy as jnp
            np.asarray(jnp.zeros(8) + 1.0)
            return
        except Exception as e:                     # backend init failure
            if time.monotonic() - t0 > max_wait_s:
                raise
            print(f"# device unavailable ({type(e).__name__}); retrying...",
                  file=sys.stderr)
            time.sleep(30.0)


def main():
    import jax

    # persistent XLA compilation cache: the flagship frame compiles in tens
    # of minutes on TPU; repeat bench runs reuse the compiled executable
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer

    _wait_for_device()
    W, H = 1920, 1080
    # The FLAGSHIP Normal mode: deferred raster + ReSTIR DI (temporal+spatial
    # reservoir reuse, RT winner visibility) + half-rate ReSTIR GI + RELAX
    # denoise + TAA/bloom/exposure/tonemap — the reference's headline config
    # (src/Renderer.cpp:1300-1313) and BASELINE.json's north-star target
    cfg = Config(scene="stress", width=W, height=H,
                 mode=RenderingMode.NORMAL,
                 direct_mode="restir", indirect_mode="restir")
    r = Renderer(cfg)

    # warmup (compile). NOTE: through the remote-TPU tunnel
    # block_until_ready does NOT block; a scalar device->host fetch is the
    # only real synchronization point, so one is issued before and after the
    # timed loop (costs one ~30 ms round trip, amortized over n frames).
    import jax.numpy as jnp
    import numpy as np

    def sync(x):
        np.asarray(jnp.sum(x))

    for _ in range(2):
        ldr = r.render_frame()
    sync(ldr)

    n = 12
    t0 = time.perf_counter()
    for _ in range(n):
        ldr = r.render_frame()
    sync(ldr)
    ms = (time.perf_counter() - t0) / n * 1e3

    print(json.dumps({
        "metric": "deferred_frame_ms_1080p_stress",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / ms, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
