"""Localize the TPU-kernel-path quality gap (r5 finding: the flagship image
rendered through the TPU kernels measures ~0.166 RMSE vs PT ground truth
while the SAME code through the XLA paths (CPU backend) measures ~0.116 —
the benched configuration carries ~0.05 RMSE of kernel-path error the CPU
golden gates cannot see).

Renders the flagship on TPU with kernel stages toggled to their XLA
fallbacks (ops/restir.KERNEL_MODE, ops/raster.RASTER_BACKEND) against the
cached 192-spp TPU PT reference. Run on TPU; ~1 compile per variant."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import numpy as np

import jax
from tests.golden_ref import pt_reference
from hobbyrenderer_tpu.config import Config, RenderingMode
from hobbyrenderer_tpu.renderer import Renderer
from hobbyrenderer_tpu.ops import culling
from hobbyrenderer_tpu.ops import raster as rasterops
from hobbyrenderer_tpu.ops import restir as restirops

W, H, SCENE = 96, 64, "stress:4"
print("backend:", jax.default_backend(), flush=True)

def render_flagship(frames=24):
    cfg = Config(scene=SCENE, width=W, height=H, mode=RenderingMode.NORMAL,
                 direct_mode="restir", indirect_mode="restir",
                 cache_dir=".hr_cache_test")
    r = Renderer(cfg)
    r.camera.jitter_enabled = False
    ldr = None
    for _ in range(frames):
        ldr = r.render_frame(dt=0.0)
    r.shutdown()
    return np.asarray(ldr).astype(np.float32) / 255.0

old_lod = culling.LOD_TARGET_PIXEL_ERROR
culling.LOD_TARGET_PIXEL_ERROR = 1e-6
t0 = time.time()
ref = pt_reference(SCENE, W, H, 192)
print(f"ref ready ({time.time()-t0:.0f}s) mean {ref.mean():.4f}", flush=True)

def run(name, **flags):
    old = {}
    for mod, attr, val in flags.get("set", []):
        old[(id(mod), attr)] = (mod, getattr(mod, attr))
        setattr(mod, attr, val)
    t0 = time.time()
    got = render_flagship()
    for (_, attr), (mod, val) in old.items():
        setattr(mod, attr, val)
    rmse = float(np.sqrt(np.mean((got - ref) ** 2)))
    corr = float(np.corrcoef(got.ravel(), ref.ravel())[0, 1])
    print(f"{name}: rmse {rmse:.4f} corr {corr:.4f} mean {got.mean():.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return got

run("base (all kernels)")
run("straggler90", set=[(restirops, "STRAGGLER_STEPS", 90)])
run("vis+cand XLA", set=[(restirops, "KERNEL_MODE", "xla")])
run("raster XLA", set=[(rasterops, "RASTER_BACKEND", "xla")])
run("all XLA", set=[(restirops, "KERNEL_MODE", "xla"),
                    (rasterops, "RASTER_BACKEND", "xla")])
culling.LOD_TARGET_PIXEL_ERROR = old_lod
