"""Component-split localization of the flagship-vs-PT golden gap (VERDICT r4
#3): compare DIRECT-only images (flagship: indirect none, ambient 0, spec
off; PT: max_bounces=1) and attribute the residual to direct vs indirect
transport. CPU-runnable; pins the backend explicitly."""
import os, sys
sys.path.insert(0, "/root/repo")
if os.environ.get("KEEP_BACKEND") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
        + " --xla_llvm_disable_expensive_passes=true")
import numpy as np, jax
if os.environ.get("KEEP_BACKEND") != "1":
    jax.config.update("jax_platforms", "cpu")
    try: jax.config.update("jax_num_cpu_devices", 8)
    except Exception: pass
os.chdir("/root/repo")
from hobbyrenderer_tpu.config import Config, RenderingMode
from hobbyrenderer_tpu.renderer import Renderer
from hobbyrenderer_tpu.ops import culling

W, H, SCENE = 96, 64, "stress:4"
culling.LOD_TARGET_PIXEL_ERROR = 1e-6
print("backend:", jax.default_backend(), flush=True)

def render(mode, frames, max_bounces=None, settings_over=None, **kw):
    cfg = Config(scene=SCENE, width=W, height=H, mode=mode,
                 cache_dir=".hr_cache_test", **kw)
    if settings_over:
        import dataclasses as dc
        cfg = dc.replace(cfg, settings=dc.replace(cfg.settings,
                                                  **settings_over))
    r = Renderer(cfg)
    if max_bounces is not None and hasattr(r._model, "max_bounces"):
        r._model.max_bounces = max_bounces
    r.camera.jitter_enabled = False
    ldr = None
    for _ in range(frames):
        ldr = r.render_frame(dt=0.0)
    r.shutdown()
    return np.asarray(ldr).astype(np.float32) / 255.0

def cmp(name, a, b):
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    print(f"{name}: rmse {rmse:.4f} corr {corr:.4f} "
          f"meanA {a.mean():.4f} meanB {b.mean():.4f}", flush=True)

# full-transport baselines
_cache = "/tmp/diag_comp_imgs.npz"
if os.path.exists(_cache):
    _z = np.load(_cache)
    ref_full, got_full, ref_dir, got_dir = (_z["rf"], _z["gf"], _z["rd"],
                                            _z["gd"])
else:
    ref_full = render(RenderingMode.PATH_TRACER, 96)
    got_full = render(RenderingMode.NORMAL, 24, direct_mode="restir",
                      indirect_mode="restir")
cmp("FULL      flagship vs PT(96spp)", got_full, ref_full)

# direct-only: PT 1 bounce (camera hit: NEE + emissive + sky) vs flagship
# with every indirect term off
if not os.path.exists(_cache):
    ref_dir = render(RenderingMode.PATH_TRACER, 96, max_bounces=1)
    got_dir = render(RenderingMode.NORMAL, 24, direct_mode="restir",
                     indirect_mode="none", specular_indirect=False,
                     settings_over={"ambient_scale": 0.0})
    np.savez(_cache, rf=ref_full, gf=got_full, rd=ref_dir, gd=got_dir)
cmp("DIRECT    flagship vs PT(1b)   ", got_dir, ref_dir)

# indirect residue (LDR differences don't subtract linearly, but the spatial
# pattern still localizes): where does the FULL error live vs the DIRECT?
err_full = np.abs(got_full - ref_full).mean(-1)
err_dir = np.abs(got_dir - ref_dir).mean(-1)
print("err_full mean", float(err_full.mean()),
      "err_dir mean", float(err_dir.mean()), flush=True)
# indirect magnitudes on each side
ind_pt = np.clip(ref_full - ref_dir, 0, None)
ind_fl = np.clip(got_full - got_dir, 0, None)
print("PT indirect mean", float(ind_pt.mean()),
      "flagship indirect mean", float(ind_fl.mean()), flush=True)
cmp("INDIRECT  flagship vs PT       ", ind_fl, ind_pt)

# ---- masked attribution: which surface kinds carry the error ----
from hobbyrenderer_tpu.scene import Camera
from hobbyrenderer_tpu.scene.procedural import make_stress_scene
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
from hobbyrenderer_tpu.models.pathtracer import (build_scene_rt, camera_rays)
from hobbyrenderer_tpu.ops import bvh16 as b16
import jax.numpy as jnp

sc = make_stress_scene(4)
gpu = build_scene_gpu(sc)
rt = build_scene_rt(sc, gpu)
cam = Camera(sc.cameras[0], W, H)
cam.jitter_enabled = False
vc = {k: jnp.asarray(v) for k, v in cam.view_constants(0).items()
      if isinstance(v, np.ndarray)}
o, d = camera_rays(vc, H, W, jnp.zeros((H, W, 2)))
hit = b16.bvh16_closest_hit(rt.bvh16, o, d)
stri = np.asarray(hit.tri).reshape(H, W)
s2o = np.asarray(rt.split_to_orig)
tri = np.where(stri >= 0, s2o[np.maximum(stri, 0)], -1)
tm = np.asarray(rt.tri_mat)
mat = np.where(tri >= 0, tm[np.maximum(tri, 0)], -1)
amode = np.asarray(gpu.mat_i)[np.maximum(mat, 0), 0]
sky_m = stri < 0
glass_m = (~sky_m) & (amode == 2)
opaque_m = (~sky_m) & (amode != 2)
print(f"mask px: sky {sky_m.sum()} glass {glass_m.sum()} opaque {opaque_m.sum()}",
      flush=True)

def masked(name, a, b):
    for mn, m in [("opaque", opaque_m), ("glass", glass_m), ("sky", sky_m)]:
        if m.sum() == 0:
            continue
        da = a[m]; db = b[m]
        rmse = float(np.sqrt(np.mean((da - db) ** 2)))
        print(f"  {name} [{mn}]: rmse {rmse:.4f} meanA {da.mean():.4f} "
              f"meanB {db.mean():.4f}", flush=True)

masked("FULL   fl vs PT", got_full, ref_full)
masked("DIRECT fl vs PT", got_dir, ref_dir)
masked("INDIR  fl vs PT", ind_fl, ind_pt)
