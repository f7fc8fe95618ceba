"""Per-iteration attribution of the wtrace kernel on TPU: iteration/leaf-step
counts per block (the new steps output) + ms at capped max_iters => per-step
costs. Usage: python scripts/diag_wsteps.py [R_log2]"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    from hobbyrenderer_tpu.ops import wtrace as wt
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import make_stress_scene

    print("backend:", jax.default_backend(), flush=True)
    sc = make_stress_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    bvh = rt.bvh16
    R = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    rng = np.random.default_rng(7)
    lo = np.asarray(bvh.root_box[:3]); hi = np.asarray(bvh.root_box[3:])
    o = jnp.asarray(lo + rng.random((R, 3), np.float32) * (hi - lo))
    dd = rng.normal(size=(R, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    t_min = jnp.full((R,), 1e-4)
    rays, G, Rp = wt._pack_blocks(o, d, t_min, R)
    I, Ip, M, K = bvh.n_interior, bvh.int_bf.shape[1], max(bvh.depth,1), bvh.leaf_size
    cur = jnp.zeros((G, wt.SUB, wt.LANE), jnp.int32)
    mask = jnp.zeros((G, M, wt.SUB, wt.LANE), jnp.int32)
    live = jnp.ones((G, wt.SUB, wt.LANE), jnp.int32)
    bt = jnp.full((G, wt.SUB, wt.LANE), wt.BIG)
    btri = jnp.full((G, wt.SUB, wt.LANE), -1, jnp.int32)

    def run(mi, lf=None):
        f = lambda: wt.wtrace_phase(rays, cur, mask, live, bt, btri,
                                    bvh.int_bf, bvh.leaf_rw, I=I, Ip=Ip, M=M,
                                    K=K, any_hit=False, max_iters=mi,
                                    leaf_frac=lf if lf else wt.LEAF_FRAC_NUM)
        out = jax.block_until_ready(f())          # compile+warm
        t0 = time.perf_counter(); n = 3
        for _ in range(n):
            out = jax.block_until_ready(f())
        dt = (time.perf_counter() - t0) / n
        steps = np.asarray(out[5])
        iters = steps[:, 0, 0]; leafs = steps[:, 0, 1]
        livec = np.asarray(out[2]).sum()
        return dt, iters, leafs, livec

    for mi in (8, 16, 32, 64, 128, 600):
        dt, iters, leafs, livec = run(mi)
        print(f"max_iters {mi:4d}: {dt*1e3:8.2f} ms  iters mean {iters.mean():6.1f} max {iters.max():4d}  "
              f"leafsteps mean {leafs.mean():5.1f}  live {livec}", flush=True)
    # leaf_frac sweep at full depth
    for lf in (1, 2, 4, 8):
        dt, iters, leafs, livec = run(600, lf)
        print(f"leaf_frac {lf}: {dt*1e3:8.2f} ms  iters mean {iters.mean():6.1f}  leafsteps mean {leafs.mean():5.1f}", flush=True)

main()
