"""Dev driver: render the default cube scene to PNG on CPU (debug aid)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

from hobbyrenderer_tpu.config import Config, RenderSettings
from hobbyrenderer_tpu.scene import Camera, make_default_cube_scene, make_stress_scene
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.models.deferred import DeferredRenderer
from hobbyrenderer_tpu.utils.image import write_png

W, H = 256, 192
which = sys.argv[1] if len(sys.argv) > 1 else "cube"
sc = make_default_cube_scene() if which == "cube" else make_stress_scene(grid=4, lod_rich=False)
gpu = build_scene_gpu(sc)
cam = Camera(sc.cameras[0], W, H)
cam.look_at(sc.center)
settings = RenderSettings().as_pytree()
r = DeferredRenderer(gpu, W, H)
ldr, overflow = r.render(gpu, cam.view_constants(0), settings)
ldr = np.asarray(ldr)
print("overflow:", int(overflow))
print("nonzero px:", int((ldr.sum(-1) > 0).sum()), "/", W * H)
print("center px:", ldr[H // 2, W // 2])
write_png(f"/tmp/dev_{which}.png", ldr)
print(f"wrote /tmp/dev_{which}.png")
