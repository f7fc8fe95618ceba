"""How much of the flagship-vs-PT golden RMSE is PT sampling noise?

Render 96 PT frames; the LDR at 48 and at 96 give two independent 48-sample
half-estimates (m2 = 2*mean96 - mean48). RMSE(m1, m2) ~= sqrt(2) x the
48-spp noise floor. If the floor is a large share of the flagship gate's
0.115, the gate is measuring reference variance, not renderer error."""
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

W, H = 96, 64
SCENE = "stress:4"
culling.LOD_TARGET_PIXEL_ERROR = 1e-6

cfg = Config(scene=SCENE, width=W, height=H, mode=RenderingMode.PATH_TRACER,
             cache_dir=".hr_cache_test")
r = Renderer(cfg)
r.camera.jitter_enabled = False
for _ in range(48):
    ldr48 = r.render_frame(dt=0.0)
a48 = np.asarray(ldr48).astype(np.float32) / 255.0
for _ in range(48):
    ldr96 = r.render_frame(dt=0.0)
a96 = np.asarray(ldr96).astype(np.float32) / 255.0
r.shutdown()

b48 = np.clip(2.0 * a96 - a48, 0.0, 1.0)     # the second half's estimate
d = a48 - b48
rmse = float(np.sqrt(np.mean(d * d)))
floor = rmse / np.sqrt(2.0)
print(f"PT 48-vs-48 RMSE {rmse:.4f}  -> per-48spp noise floor ~{floor:.4f}")
lum = a96.mean(-1)
for lo, hi in [(0, .2), (.2, .5), (.5, .8), (.8, 1.01)]:
    m = (lum >= lo) & (lum < hi)
    if m.any():
        rb = float(np.sqrt((d * d).mean(-1)[m].mean())) / np.sqrt(2.0)
        print(f"  lum [{lo:.1f},{hi:.1f}): {m.mean()*100:4.1f}% px, "
              f"floor {rb:.4f}")
