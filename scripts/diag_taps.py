"""Balanced-preset DI spatial taps golden ablation — measured (r4, stress:4
@96x64, 48-spp PT ref): taps=3 RMSE 0.1155 / taps=2 RMSE 0.1156 (neutral)
-> balanced preset runs 2 taps."""
import sys
sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_llvm_disable_expensive_passes=true"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from hobbyrenderer_tpu.config import Config, RenderingMode
from hobbyrenderer_tpu.renderer import Renderer
from hobbyrenderer_tpu.ops import culling
from hobbyrenderer_tpu.ops import restir_presets as rp

W, H = 96, 64
culling.LOD_TARGET_PIXEL_ERROR = 1e-6

def render(mode, frames, **kw):
    cfg = Config(scene="stress:4", width=W, height=H, mode=mode,
                 cache_dir=".hr_cache_test", **kw)
    r = Renderer(cfg)
    r.camera.jitter_enabled = False
    for _ in range(frames):
        ldr = r.render_frame(dt=0.0)
    r.shutdown()
    return np.asarray(ldr).astype(np.float32) / 255.0

ref = render(RenderingMode.PATH_TRACER, frames=48)
print("PT done", flush=True)
for taps in (3, 2):
    rp.PRESETS["balanced"] = rp.ReSTIRPreset(di_spatial_taps=taps)
    got = render(RenderingMode.NORMAL, frames=24,
                 direct_mode="restir", indirect_mode="restir")
    rmse = float(np.sqrt(np.mean((ref - got) ** 2)))
    corr = float(np.corrcoef(ref.ravel(), got.ravel())[0, 1])
    print(f"taps={taps}  RMSE {rmse:.4f} corr {corr:.3f}", flush=True)
