"""Is the residual TPU-vs-CPU flagship error XLA's default bf16 matmul
precision? Renders the flagship + PT ref on TPU under
jax_default_matmul_precision=highest and compares (diag_tpu_quality.py
measured all-XLA 0.146 vs the CPU backend's 0.116)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import numpy as np
import jax
jax.config.update("jax_default_matmul_precision", "highest")
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

culling.LOD_TARGET_PIXEL_ERROR = 1e-6
# fresh ref under highest precision (different digest path: bump via env —
# just render directly, don't use the cache)
from hobbyrenderer_tpu.renderer import Renderer as _R
t0 = time.time()
cfg = Config(scene=SCENE, width=W, height=H, mode=RenderingMode.PATH_TRACER,
             cache_dir=".hr_cache_test")
r = _R(cfg); r.camera.jitter_enabled = False
ldr = None
for _ in range(192):
    ldr = r.render_frame(dt=0.0)
r.shutdown()
ref = np.asarray(ldr).astype(np.float32) / 255.0
print(f"ref(highest) {time.time()-t0:.0f}s mean {ref.mean():.4f}", flush=True)
refc = pt_reference(SCENE, W, H, 192)    # cached default-precision TPU ref
print("ref(highest) vs ref(default) rmse:",
      float(np.sqrt(np.mean((ref - refc) ** 2))), flush=True)

for name, flags in [("base(highest)", []),
                    ("allXLA(highest)", [(restirops, "KERNEL_MODE", "xla"),
                                         (rasterops, "RASTER_BACKEND", "xla")])]:
    old = [(m, a, getattr(m, a)) for m, a, v in flags]
    for m, a, v in flags: setattr(m, a, v)
    t0 = time.time()
    got = render_flagship()
    for m, a, v in old: setattr(m, a, v)
    rmse = float(np.sqrt(np.mean((got - ref) ** 2)))
    corr = float(np.corrcoef(got.ravel(), ref.ravel())[0, 1])
    print(f"{name}: rmse {rmse:.4f} corr {corr:.4f} mean {got.mean():.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
