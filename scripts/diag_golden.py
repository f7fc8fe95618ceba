"""Decompose the flagship-vs-PT golden gap (currently ~0.108 RMSE on stress:4
@96x64, gate ratchet target <= 0.05).

Renders PT ground truth once, then a set of flagship ablations, and reports
RMSE/corr per ablation plus a spatial error profile (which rows/columns and
which surface kinds carry the error). CPU-runnable.

Usage: python scripts/diag_golden.py [WxH] [scene]
"""
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

size = sys.argv[1] if len(sys.argv) > 1 else "96x64"
W, H = (int(x) for x in size.split("x"))
SCENE = sys.argv[2] if len(sys.argv) > 2 else "stress:4"


def render(mode, frames, max_bounces=None, **kw):
    cfg = Config(scene=SCENE, width=W, height=H, mode=mode,
                 cache_dir=".hr_cache_test", **kw)
    if max_bounces is not None:
        cfg.settings.max_bounces = max_bounces
    r = Renderer(cfg)
    r.camera.jitter_enabled = False
    for _ in range(frames):
        ldr = r.render_frame(dt=0.0)
    r.shutdown()
    return np.asarray(ldr).astype(np.float32) / 255.0


def stats(name, ref, got):
    rmse = float(np.sqrt(np.mean((ref - got) ** 2)))
    corr = float(np.corrcoef(ref.ravel(), got.ravel())[0, 1])
    bias = float(np.mean(got) - np.mean(ref))
    print(f"{name:42s} RMSE {rmse:.4f}  corr {corr:.3f}  mean-bias {bias:+.4f}")
    return rmse


culling.LOD_TARGET_PIXEL_ERROR = 1e-6   # LOD0 everywhere (lighting gate)

print(f"== scene {SCENE} @ {W}x{H} ==")
ref = render(RenderingMode.PATH_TRACER, frames=48)
print("PT ground truth done")

base = render(RenderingMode.NORMAL, frames=24,
              direct_mode="restir", indirect_mode="restir")
r0 = stats("flagship (restir+restir)", ref, base)

# ablations
for name, kw in [
    ("direct restir, indirect none", dict(direct_mode="restir",
                                          indirect_mode="none")),
    ("direct restir, indirect ssgi", dict(direct_mode="restir",
                                          indirect_mode="ssgi")),
    ("direct restir, indirect ddgi", dict(direct_mode="restir",
                                          indirect_mode="ddgi")),
    ("direct restir, indirect sharc", dict(direct_mode="restir",
                                           indirect_mode="sharc")),
    ("direct restir, indirect combined", dict(direct_mode="restir",
                                              indirect_mode="combined")),
    ("NormalBasic", None),
]:
    try:
        if name == "NormalBasic":
            got = render(RenderingMode.NORMAL_BASIC, frames=8)
        else:
            got = render(RenderingMode.NORMAL, frames=24, **kw)
        stats(name, ref, got)
    except Exception as e:
        print(f"{name:42s} FAILED {type(e).__name__}: {e}")

# PT with 1 bounce ~= direct+emissive only: bound the direct-vs-indirect split
ref1 = render(RenderingMode.PATH_TRACER, frames=48, max_bounces=1)
stats("PT 1-bounce vs PT full (indirect energy)", ref, ref1)

# spatial profile of the flagship error
err = np.abs(base - ref).mean(axis=-1)
q = np.quantile(err, [0.5, 0.9, 0.99])
print(f"\nflagship |err| p50 {q[0]:.4f} p90 {q[1]:.4f} p99 {q[2]:.4f}")
ys, xs = np.unravel_index(np.argsort(err.ravel())[::-1][:200], err.shape)
print(f"top-200 error pixels: rows {ys.min()}-{ys.max()} "
      f"(median {int(np.median(ys))}), cols {xs.min()}-{xs.max()} "
      f"(median {int(np.median(xs))})")
# brightness split: is the error in bright (emissive/specular) or dark regions?
lum = ref.mean(axis=-1)
for lo, hi in [(0, .2), (.2, .5), (.5, .8), (.8, 1.01)]:
    m = (lum >= lo) & (lum < hi)
    if m.any():
        print(f"  ref-lum [{lo:.1f},{hi:.1f}): {m.mean()*100:4.1f}% of px, "
              f"RMSE {float(np.sqrt((((base-ref)**2).mean(-1))[m].mean())):.4f}")

# save images for eyeballing
try:
    from PIL import Image
    os.makedirs("/tmp/diag", exist_ok=True)
    Image.fromarray((ref * 255).astype(np.uint8)).save("/tmp/diag/pt.png")
    Image.fromarray((base * 255).astype(np.uint8)).save("/tmp/diag/flagship.png")
    e8 = (np.clip(err / max(q[2], 1e-6), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(e8).save("/tmp/diag/err.png")
    print("wrote /tmp/diag/{pt,flagship,err}.png")
except Exception as e:
    print("image save skipped:", e)
