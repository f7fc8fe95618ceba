"""Is the flagship-vs-PT golden gap texture-LOD driven? Render the flagship
with (a) stock LOD, (b) forced mip 0, (c) PT-style cone LOD, against the
same PT ground truth. CPU-runnable."""
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
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from hobbyrenderer_tpu.config import Config, RenderingMode
from hobbyrenderer_tpu.renderer import Renderer
from hobbyrenderer_tpu.ops import culling, texture as texops

W, H = 96, 64
SCENE = "stress:4"


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
    print(f"{name:34s} RMSE {rmse:.4f} corr {corr:.3f}", flush=True)


culling.LOD_TARGET_PIXEL_ERROR = 1e-6

ref = render(RenderingMode.PATH_TRACER, frames=48)
print("PT done", flush=True)

base = render(RenderingMode.NORMAL, frames=24,
              direct_mode="restir", indirect_mode="restir")
stats("flagship stock lod", ref, base)

orig = texops.uv_lod
texops.uv_lod = lambda uv, ts: jnp.full(uv.shape[:-1], -10.0)
try:
    m0 = render(RenderingMode.NORMAL, frames=24,
                direct_mode="restir", indirect_mode="restir")
finally:
    texops.uv_lod = orig
stats("flagship forced mip0", ref, m0)

# lod map statistics on the real G-buffer uv footprint
print("\nalbedo-plane comparison (texture content only):")
err_b = np.abs(base - ref).mean()
err_0 = np.abs(m0 - ref).mean()
print(f"mean|err| stock {err_b:.4f}  mip0 {err_0:.4f}", flush=True)
