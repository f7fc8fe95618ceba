"""Measure the r5 golden-gate numbers against the NEW 192-spp cached
reference (VERDICT r4 #3): natural-LOD and forced-LOD0 flagship RMSE/corr at
96x64 (192 spp) and 256x192 (96 spp). Populates tests/.golden_cache."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_llvm_disable_expensive_passes" not in flags:
    flags += " --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = flags
import time
import numpy as np
from tests.golden_ref import pt_reference
from hobbyrenderer_tpu.config import Config, RenderingMode
from hobbyrenderer_tpu.renderer import Renderer
from hobbyrenderer_tpu.ops import culling

SCENE = "stress:4"

def render_flagship(W, H, frames=24, lod0=False):
    old = culling.LOD_TARGET_PIXEL_ERROR
    if lod0:
        culling.LOD_TARGET_PIXEL_ERROR = 1e-6
    try:
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
    finally:
        culling.LOD_TARGET_PIXEL_ERROR = old

def stats(name, ref, got):
    rmse = float(np.sqrt(np.mean((ref - got) ** 2)))
    corr = float(np.corrcoef(ref.ravel(), got.ravel())[0, 1])
    print(f"{name}: rmse {rmse:.4f} corr {corr:.4f}", flush=True)

for (W, H, spp) in [(96, 64, 192), (256, 192, 96)]:
    t0 = time.time()
    ref = pt_reference(SCENE, W, H, spp)
    print(f"ref {W}x{H} spp{spp}: {time.time()-t0:.0f}s", flush=True)
    # reference noise floor estimate: compare against the 48-spp prefix?
    # (skip — diag_ptnoise.py owns that)
    got_nat = render_flagship(W, H)
    stats(f"natural-LOD {W}x{H} (spp{spp} ref)", ref, got_nat)
    got_l0 = render_flagship(W, H, lod0=True)
    stats(f"forced-LOD0 {W}x{H} (spp{spp} ref)", ref, got_l0)
