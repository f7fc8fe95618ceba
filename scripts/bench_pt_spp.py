"""PT wavefront-width sweep on TPU: Msamples/s at 960x540 for spp 1/2/4/8.

Decides the bench.py PT config (BASELINE.json Msamples/s/chip metric) — wider
wavefronts amortize lockstep dispatch overheads; this measures by how much.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import numpy as np
    import jax.numpy as jnp
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer

    print("backend:", jax.default_backend(), flush=True)
    W, H = 960, 540
    out = {}
    for spp in (1, 2, 4, 8):
        cfg = Config(scene="stress", width=W, height=H,
                     mode=RenderingMode.PATH_TRACER, pt_spp=spp)
        r = Renderer(cfg)
        ldr = r.render_frame()
        np.asarray(ldr[:1, :1])              # sync (tunnel-safe)
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            ldr = r.render_frame()
        np.asarray(ldr[:1, :1])
        dt = time.perf_counter() - t0
        ms = W * H * spp * n / dt / 1e6
        out[f"spp{spp}"] = {"frame_ms": round(dt / n * 1e3, 1),
                            "Msamples_s": round(ms, 4)}
        print(f"spp={spp}: {dt/n*1e3:8.1f} ms/frame  {ms:7.4f} Msamples/s",
              flush=True)
        r.shutdown()
    with open("/tmp/pt_spp.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
