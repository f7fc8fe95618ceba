import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import conftest  # noqa: F401  (forces CPU platform like pytest does)
import numpy as np
import jax
import jax.numpy as jnp

import test_restir_gi as t
from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
from hobbyrenderer_tpu.ops import bvh as bvhops
from hobbyrenderer_tpu.ops import restir_gi as giops
from hobbyrenderer_tpu.ops import sampling as smp
from hobbyrenderer_tpu.ops.intersect import offset_ray_origin
from hobbyrenderer_tpu.scene import Camera
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu

W, H, SCALE = t.W, t.H, t.SCALE
sc = t._wall_scene()
gpu = build_scene_gpu(sc)
rt = build_scene_rt(sc, gpu)
cam = Camera(sc.cameras[0], W, H)
cam.jitter_enabled = False
vc = cam.view_constants(0)
settings = RenderSettings().as_pytree()
gb = jax.jit(lambda g, v: t._gbuffer(g, v, max(int(gpu.lod0_pair_capacity), 1))
             )(gpu, vc)
Hg, Wg = H // SCALE, W // SCALE
R = Hg * Wg
sub = lambda img: img[::SCALE, ::SCALE][:Hg, :Wg]
pos = sub(gb.world_pos).reshape(R, 3)
n = sub(gb.normal).reshape(R, 3)
gn = sub(gb.geo_normal).reshape(R, 3)
valid = np.asarray(sub(gb.valid).reshape(R))
alb = sub(gb.albedo).reshape(R, 3)

def mc(seed):
    key = jax.random.PRNGKey(seed)
    u1 = jax.random.uniform(key, (R,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (R,))
    d = smp.to_world(n, smp.cosine_sample_hemisphere(u1, u2))
    o = offset_ray_origin(pos, gn, d)
    hit = bvhops.bvh_closest_hit(rt.bvh, o, d)
    pix = jnp.arange(R, dtype=jnp.uint32)
    _sp, _sn, rad = giops._hit_radiance(gpu, rt, rt.lights, hit, o, d, pix,
                                        jnp.uint32(seed + 7000))
    return alb * rad
mcj = jax.jit(mc)
ref = np.zeros((R, 3), np.float32)
NREF = 192
for s in range(NREF):
    ref += np.asarray(mcj(s))
ref /= NREF

step = jax.jit(lambda res, i: giops.restir_gi(
    gpu, rt, gb, vc, settings, res, i, scale=SCALE))
res = giops.gi_reservoir_init(Hg, Wg)
acc = np.zeros((H, W, 3), np.float32)
lit = valid & (ref.sum(-1) > 2e-3)
for i in range(192):
    ind, res = step(res, jnp.int32(i))
    acc += np.asarray(ind)
    if (i + 1) in (24, 48, 96, 192):
        avg = (acc / (i + 1))[::SCALE, ::SCALE][:Hg, :Wg].reshape(R, 3)
        energy = avg[lit].sum() / (ref[lit].sum() + 1e-9)
        percell = np.abs(avg[lit] - ref[lit]).sum() / ref[lit].sum()
        B = 4
        Hb, Wb = Hg // B, Wg // B
        m = lit.reshape(Hg, Wg)[:Hb * B, :Wb * B]
        blk = lambda x: np.where(m[..., None], x.reshape(Hg, Wg, 3), 0.0)[
            :Hb * B, :Wb * B].reshape(Hb, B, Wb, B, 3).sum((1, 3))
        cnt = m.reshape(Hb, B, Wb, B).sum((1, 3))
        ok = cnt > 1
        ba = blk(avg)[ok] / cnt[ok, None]
        br = blk(ref)[ok] / cnt[ok, None]
        rel = np.abs(ba - br).sum() / (np.abs(br).sum() + 1e-9)
        print(f"frames {i+1:3d}: energy ratio {energy:.3f}  "
              f"per-cell L1 {percell:.3f}  block L1 {rel:.3f}")
