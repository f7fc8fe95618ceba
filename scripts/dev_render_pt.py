"""Dev driver: path-trace the cube scene on CPU."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

from hobbyrenderer_tpu.config import Config, RenderingMode
from hobbyrenderer_tpu.renderer import Renderer

which = sys.argv[1] if len(sys.argv) > 1 else "cube"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
cfg = Config(scene=which, width=192, height=144, mode=RenderingMode.PATH_TRACER)
r = Renderer(cfg)
stats = r.run(num_frames=spp, screenshot=f"/tmp/pt_{which}.png")
print(stats)
ldr = np.asarray(r.last_frame)
print("nonzero px:", int((ldr.sum(-1) > 0).sum()), "/", ldr.shape[0] * ldr.shape[1])
print("center px:", ldr[ldr.shape[0] // 2, ldr.shape[1] // 2])
