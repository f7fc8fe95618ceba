"""Golden impact of reduced-rate winner visibility (di_vis_scale): flagship
at vis_scale 1 vs 2 against the same PT ground truth. CPU-runnable."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_llvm_disable_expensive_passes" not in flags:
    flags += " --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = flags

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from hobbyrenderer_tpu.config import Config, RenderingMode
from hobbyrenderer_tpu.renderer import Renderer
from hobbyrenderer_tpu.ops import culling
from hobbyrenderer_tpu.ops import restir_presets as rp

W, H = 96, 64
SCENE = "stress:4"
culling.LOD_TARGET_PIXEL_ERROR = 1e-6


def render(mode, frames, **kw):
    cfg = Config(scene=SCENE, width=W, height=H, mode=mode,
                 cache_dir=".hr_cache_test", **kw)
    r = Renderer(cfg)
    r.camera.jitter_enabled = False
    for _ in range(frames):
        ldr = r.render_frame(dt=0.0)
    r.shutdown()
    return np.asarray(ldr).astype(np.float32) / 255.0


def stats(name, ref, got):
    rmse = float(np.sqrt(np.mean((ref - got) ** 2)))
    corr = float(np.corrcoef(ref.ravel(), got.ravel())[0, 1])
    print(f"{name:28s} RMSE {rmse:.4f} corr {corr:.3f}", flush=True)


ref = render(RenderingMode.PATH_TRACER, frames=48)
print("PT done", flush=True)
for vs in (1, 2):
    rp.PRESETS["balanced"] = rp.ReSTIRPreset(di_vis_scale=vs)
    got = render(RenderingMode.NORMAL, frames=24,
                 direct_mode="restir", indirect_mode="restir")
    stats(f"flagship vis_scale={vs}", ref, got)
