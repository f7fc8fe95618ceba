"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4:
"multi-node without a cluster")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hobbyrenderer_tpu.config import RenderSettings
from hobbyrenderer_tpu.models.deferred import DeferredRenderer
from hobbyrenderer_tpu.parallel import DeferredShardedRenderer, build_mesh
from hobbyrenderer_tpu.scene import Camera, make_default_cube_scene
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu


def test_mesh_has_8_devices():
    mesh = build_mesh()
    assert mesh.devices.size == 8, "conftest must provide 8 virtual devices"


def test_sharded_deferred_matches_single_device():
    """Row-sharded frame must equal the single-device frame (same math, psum'd
    histogram is identical to the global one)."""
    from hobbyrenderer_tpu.ops import sky as skyops
    import pytest as _pt
    old_scale = skyops.SKY_FAST_SCALE
    skyops.SKY_FAST_SCALE = 1  # band-local strided sky != full-frame strided
    try:
        _run_sharded_parity()
    finally:
        skyops.SKY_FAST_SCALE = old_scale


def _run_sharded_parity():
    W, H = 96, 64  # 64 rows = 8 devices x 1 tile row of 8? TILE=32 -> need H % 256 == 0
    # with TILE=32 and 2 devices: H=64 works
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()

    single = DeferredRenderer(gpu, W, H)
    ldr_ref, _ = single.render(gpu, vc, settings)

    mesh = build_mesh(2)
    sharded = DeferredShardedRenderer(gpu, W, H, mesh=mesh)
    ldr_sh, _ = sharded.render(gpu, vc, settings)

    a = np.asarray(ldr_ref).astype(np.int32)
    b = np.asarray(ldr_sh).astype(np.int32)
    # identical math; allow off-by-one from non-determinism in reductions
    assert np.abs(a - b).max() <= 1, f"max diff {np.abs(a - b).max()}"


def test_sharded_8_devices_runs():
    W, H = 64, 256  # 256 rows = 8 devices x 32-row band
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    r = DeferredShardedRenderer(gpu, W, H, mesh=build_mesh(8))
    ldr, _ = r.render(gpu, vc, settings)
    ldr = np.asarray(ldr)
    assert ldr.shape == (H, W, 3)
    assert (ldr.sum(-1) > 0).mean() > 0.5  # sky everywhere at least


def test_sharded_restir_di_matches_single_device():
    """ReSTIR DI under shard_map with ppermute halos == single-device chain
    (same RNG by global pixel id; spatial/temporal taps through the halo)."""
    from hobbyrenderer_tpu.graph.rendergraph import FrameContext  # noqa: F401
    from hobbyrenderer_tpu.ops import culling as cullops
    from hobbyrenderer_tpu.ops import raster as rasterops
    from hobbyrenderer_tpu.ops import restir as restirops
    from hobbyrenderer_tpu.ops import shard_utils as shu
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except Exception:
        from jax.experimental.shard_map import shard_map

    W, H = 64, 64
    n_dev = 4
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    cap = max(int(gpu.lod0_pair_capacity), 1)

    def gbuffer(gpu, vc):
        cu = cullops.cull_pairs(gpu, vc,
                                alpha_mask=jnp.asarray([True, True, False]))
        slots, _ = cullops.compact_mask(cu["mask"], cap)
        ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
        return rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)

    gb = jax.jit(gbuffer)(gpu, vc)
    prev = restirops.reservoir_init(H, W)

    # two sequential frames so the temporal path is exercised
    def run_single(gb, prev):
        d1, r1 = restirops.restir_di(gpu, None, gb, vc, settings, prev,
                                     jnp.int32(0), visibility=False)
        d2, r2 = restirops.restir_di(gpu, None, gb, vc, settings, r1,
                                     jnp.int32(1), visibility=False)
        return d2, r2

    d_ref, r_ref = jax.jit(run_single)(gb, prev)

    mesh = build_mesh(n_dev)
    shard_h = H // n_dev
    specs_gb = jax.tree_util.tree_map(lambda _: P("tiles"), gb)
    specs_res = jax.tree_util.tree_map(lambda _: P("tiles"), prev)

    def body(gb_b, prev_b):
        shard = shu.make_row_shard("tiles", n_dev, shard_h)
        d1, r1 = restirops.restir_di(gpu, None, gb_b, vc, settings, prev_b,
                                     jnp.int32(0), visibility=False,
                                     shard=shard)
        d2, r2 = restirops.restir_di(gpu, None, gb_b, vc, settings, r1,
                                     jnp.int32(1), visibility=False,
                                     shard=shard)
        return d2, r2

    sharded = jax.jit(shard_map(body, mesh=mesh,
                                in_specs=(specs_gb, specs_res),
                                out_specs=(P("tiles"),
                                           jax.tree_util.tree_map(
                                               lambda _: P("tiles"), prev)),
                                check_vma=False))
    d_sh, r_sh = sharded(gb, prev)

    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_sh.W), np.asarray(r_ref.W),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_sh.y), np.asarray(r_ref.y))


def test_sharded_flagship_runs_and_matches_on_restir_chain():
    """The flagship sharded frame (ReSTIR DI + denoise + TAA + psum exposure +
    replicated post) runs on the virtual mesh and its restir+denoise+taa chain
    equals the single-device composition bit-for-bit."""
    from hobbyrenderer_tpu.ops import culling as cullops
    from hobbyrenderer_tpu.ops import denoise as dnops
    from hobbyrenderer_tpu.ops import raster as rasterops
    from hobbyrenderer_tpu.ops import restir as restirops
    from hobbyrenderer_tpu.ops import shard_utils as shu
    from hobbyrenderer_tpu.ops import taa as taaops
    from hobbyrenderer_tpu.parallel import FlagshipShardedRenderer
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except Exception:
        from jax.experimental.shard_map import shard_map

    W, H = 64, 64
    n_dev = 2
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    cap = max(int(gpu.lod0_pair_capacity), 1)

    def gbuffer(gpu, vc):
        cu = cullops.cull_pairs(gpu, vc,
                                alpha_mask=jnp.asarray([True, True, False]))
        slots, _ = cullops.compact_mask(cu["mask"], cap)
        ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
        return rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)

    gb = jax.jit(gbuffer)(gpu, vc)
    prev = restirops.reservoir_init(H, W)
    dn0 = dnops.denoise_init(H, W)
    hist0 = jnp.zeros((H, W, 3))

    def chain(gb, prev, dn, hist, shard=None):
        d, r = restirops.restir_di(gpu, None, gb, vc, settings, prev,
                                   jnp.int32(3), visibility=False, shard=shard)
        d, dn2 = dnops.denoise(d, gb, dn, shard=shard)
        out = taaops.taa_resolve(d, hist, gb.motion, jnp.bool_(True),
                                 settings, shard=shard)
        return out, r, dn2

    ref = jax.jit(lambda gb, p, dn, h: chain(gb, p, dn, h))(gb, prev, dn0, hist0)

    mesh = build_mesh(n_dev)
    shard_h = H // n_dev
    sp = lambda t: jax.tree_util.tree_map(lambda _: P("tiles"), t)

    def body(gb_b, prev_b, dn_b, hist_b):
        shard = shu.make_row_shard("tiles", n_dev, shard_h)
        return chain(gb_b, prev_b, dn_b, hist_b, shard=shard)

    sharded = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(sp(gb), sp(prev), sp(dn0), P("tiles")),
        out_specs=(P("tiles"), sp(prev), sp(dn0)),
        check_vma=False))
    got = sharded(gb, prev, dn0, hist0)

    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # and the full flagship renderer executes end-to-end on the mesh
    r = FlagshipShardedRenderer(gpu, W, H, rt=None, mesh=mesh)
    for i in range(2):
        ldr, _ = r.render(gpu, cam.view_constants(i), settings)
    assert np.asarray(ldr).shape == (H, W, 3)
    assert np.isfinite(np.asarray(ldr)).all()


def test_sharded_transparent_matches_single_device():
    """The forward transparent pass under shard_map (banded raster/shade,
    refraction through the gathered full frame) == the single-chip pass.
    Covers VERDICT-r2 item 5: BLEND geometry used to be DROPPED multi-chip."""
    from hobbyrenderer_tpu.ops import culling as cullops
    from hobbyrenderer_tpu.ops import ibl as iblops
    from hobbyrenderer_tpu.ops import raster as rasterops
    from hobbyrenderer_tpu.ops import transparent as transops
    from hobbyrenderer_tpu.parallel.frame import _sun_dir
    from hobbyrenderer_tpu.scene import make_stress_scene
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except Exception:
        from jax.experimental.shard_map import shard_map

    W, H = 64, 64
    n_dev = 2
    sc = make_stress_scene(4)   # has transmission=0.6 BLEND materials
    gpu = build_scene_gpu(sc)
    assert (np.asarray(gpu.inst_alpha_mode) == 2).any(), \
        "stress scene must carry BLEND geometry for this test"
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    cap = max(int(gpu.lod0_pair_capacity), 1)

    def opaque(gpu, vc):
        cu = cullops.cull_pairs(gpu, vc,
                                alpha_mask=jnp.asarray([True, True, False]))
        slots, _ = cullops.compact_mask(cu["mask"], cap)
        ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
        return rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)

    gb = jax.jit(opaque)(gpu, vc)
    # synthetic lit-opaque hdr with structure (so refraction fetches matter)
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, H), jnp.linspace(0, 1, W),
                          indexing="ij")
    hdr = jnp.stack([xx, yy, 1.0 - xx], -1).astype(jnp.float32)
    sun = _sun_dir(gpu, settings)
    irr = iblops.build_sky_irradiance(sun, settings)

    kw = dict(width=W, height=H, transparent_capacity=cap, sun_dir=sun,
              sky_sh=irr, ibl_scale=1.0)
    ref = jax.jit(lambda: transops.transparent_composite(
        gpu, vc, settings, gb, hdr, **kw))()

    mesh = build_mesh(n_dev)
    shard_h = H // n_dev
    sp = lambda t: jax.tree_util.tree_map(lambda _: P("tiles"), t)

    def body(gb_b, hdr_b, hdr_full):
        from hobbyrenderer_tpu.ops import shard_utils as shu
        shard = shu.make_row_shard("tiles", n_dev, shard_h)
        return transops.transparent_composite(
            gpu, vc, settings, gb_b, hdr_b, y0=shard.y0, shard_h=shard_h,
            hdr_full=hdr_full, **kw)

    got = jax.jit(shard_map(body, mesh=mesh,
                            in_specs=(sp(gb), P("tiles"), P()),
                            out_specs=P("tiles"),
                            check_vma=False))(gb, hdr, hdr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # and the flagship renderer draws BLEND geometry end-to-end on the mesh
    from hobbyrenderer_tpu.parallel import FlagshipShardedRenderer
    r = FlagshipShardedRenderer(gpu, W, H, rt=None, mesh=mesh)
    assert r.with_transparent
    ldr, _ = r.render(gpu, vc, settings)
    assert np.isfinite(np.asarray(ldr)).all()


def test_sharded_bloom_matches_single_device():
    """Banded bloom (one ppermute halo row per pyramid level) == the
    replicated bloom() it replaces, at pow2-friendly dims (the flagship mesh
    guarantees shard_h % 32 == 0)."""
    from hobbyrenderer_tpu.config import RenderSettings
    from hobbyrenderer_tpu.ops import post as postops
    from hobbyrenderer_tpu.ops import shard_utils as shu
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except Exception:
        from jax.experimental.shard_map import shard_map

    H, W = 128, 64
    n_dev = 2
    rng = np.random.default_rng(11)
    hdr = jnp.asarray(rng.random((H, W, 3), np.float32) * 3.0)
    settings = RenderSettings().as_pytree()

    ref = jax.jit(lambda x: postops.bloom(x, settings))(hdr)

    mesh = build_mesh(n_dev)
    shard_h = H // n_dev

    def body(x):
        shard = shu.make_row_shard("tiles", n_dev, shard_h)
        return postops.bloom_sharded(x, settings, shard, full_h=H)

    got = jax.jit(shard_map(body, mesh=mesh, in_specs=(P("tiles"),),
                            out_specs=P("tiles"), check_vma=False))(hdr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_ssgi_matches_single_device():
    """SSGI under shard_map (band marches against the gathered depth +
    prev-HDR; blue noise aligned to global rows) == the single-chip pass.
    VERDICT-r2 item 5: one RT-free indirect mode multi-chip."""
    from hobbyrenderer_tpu.ops import culling as cullops
    from hobbyrenderer_tpu.ops import ibl as iblops
    from hobbyrenderer_tpu.ops import raster as rasterops
    from hobbyrenderer_tpu.ops import shard_utils as shu
    from hobbyrenderer_tpu.ops import ssgi as ssgiops
    from hobbyrenderer_tpu.parallel.frame import _sun_dir
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except Exception:
        from jax.experimental.shard_map import shard_map

    W, H = 64, 64
    n_dev = 2
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    cap = max(int(gpu.lod0_pair_capacity), 1)

    def opaque(gpu, vc):
        cu = cullops.cull_pairs(gpu, vc,
                                alpha_mask=jnp.asarray([True, True, False]))
        slots, _ = cullops.compact_mask(cu["mask"], cap)
        ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
        return rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)

    gb = jax.jit(opaque)(gpu, vc)
    rng = np.random.default_rng(4)
    prev_hdr = jnp.asarray(rng.random((H, W, 3), np.float32))
    sun = _sun_dir(gpu, settings)
    irr = iblops.build_sky_irradiance(sun, settings)

    ref = jax.jit(lambda: ssgiops.ssgi_half_res(
        gb, vc, prev_hdr, irr, settings, jnp.int32(5)))()

    mesh = build_mesh(n_dev)
    shard_h = H // n_dev
    sp = lambda t: jax.tree_util.tree_map(lambda _: P("tiles"), t)

    def body(gb_b, prev_b):
        shard = shu.make_row_shard("tiles", n_dev, shard_h)
        depth_full = jax.lax.all_gather(gb_b.depth, "tiles", axis=0,
                                        tiled=True)
        prev_full = jax.lax.all_gather(prev_b, "tiles", axis=0, tiled=True)
        return ssgiops.ssgi_half_res(gb_b, vc, None, irr, settings,
                                     jnp.int32(5), shard=shard,
                                     depth_full=depth_full,
                                     prev_hdr_full=prev_full)

    got = jax.jit(shard_map(body, mesh=mesh, in_specs=(sp(gb), P("tiles")),
                            out_specs=P("tiles"), check_vma=False))(gb,
                                                                    prev_hdr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # flagship renderer end-to-end in SSGI mode on the mesh
    from hobbyrenderer_tpu.parallel import FlagshipShardedRenderer
    r = FlagshipShardedRenderer(gpu, W, H, rt=None, mesh=mesh,
                                indirect="ssgi")
    for i in range(2):
        ldr, _ = r.render(gpu, cam.view_constants(i), settings)
    assert np.isfinite(np.asarray(ldr)).all()


def test_sharded_specular_matches_single_device():
    """Traced specular indirect under shard_map (GGX-VNDF rays + RELAX at the
    half-res band; RNG on global pixel ids) == single-chip. With it, the FULL
    benched flagship config (DI + GI + specular + transparent) is multi-chip."""
    from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
    from hobbyrenderer_tpu.ops import culling as cullops
    from hobbyrenderer_tpu.ops import ibl as iblops
    from hobbyrenderer_tpu.ops import raster as rasterops
    from hobbyrenderer_tpu.ops import shard_utils as shu
    from hobbyrenderer_tpu.ops import specular as specops
    from hobbyrenderer_tpu.ops.specular import spec_state_init
    from hobbyrenderer_tpu.parallel.frame import _sun_dir
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except Exception:
        from jax.experimental.shard_map import shard_map

    W, H = 64, 64
    n_dev = 2
    sc = make_default_cube_scene()
    gpu = build_scene_gpu(sc)
    rt = build_scene_rt(sc, gpu)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    vc = cam.view_constants(0)
    settings = RenderSettings().as_pytree()
    cap = max(int(gpu.lod0_pair_capacity), 1)

    def opaque(gpu, vc):
        cu = cullops.cull_pairs(gpu, vc,
                                alpha_mask=jnp.asarray([True, True, False]))
        slots, _ = cullops.compact_mask(cu["mask"], cap)
        ro, aux = rasterops.rasterize(gpu, vc, slots, W, H)
        return rasterops.resolve_gbuffer(gpu, vc, ro, slots, aux=aux)

    gb = jax.jit(opaque)(gpu, vc)
    sun = _sun_dir(gpu, settings)
    irr = iblops.build_sky_irradiance(sun, settings)
    st0 = spec_state_init(H, W)

    kw = dict(sun_dir=sun, skip_pool_emissive=True, sky_sh=irr, ibl_scale=1.0)
    ref = jax.jit(lambda: specops.specular_indirect(
        gpu, rt, gb, vc, settings, st0, jnp.int32(2), **kw))()

    mesh = build_mesh(n_dev)
    shard_h = H // n_dev
    sp = lambda t: jax.tree_util.tree_map(lambda _: P("tiles"), t)

    def body(gb_b, st_b):
        shard = shu.make_row_shard("tiles", n_dev, shard_h)
        return specops.specular_indirect(gpu, rt, gb_b, vc, settings, st_b,
                                         jnp.int32(2), shard=shard, **kw)

    got = jax.jit(shard_map(body, mesh=mesh, in_specs=(sp(gb), sp(st0)),
                            out_specs=(P("tiles"), P("tiles"), sp(st0)),
                            check_vma=False))(gb, st0)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # end-to-end: flagship with rt (DI visibility + GI + specular) on the mesh
    from hobbyrenderer_tpu.parallel import FlagshipShardedRenderer
    r = FlagshipShardedRenderer(gpu, W, H, rt=rt, mesh=mesh)
    assert r.with_spec
    for i in range(2):
        ldr, _ = r.render(gpu, cam.view_constants(i), settings)
    assert np.isfinite(np.asarray(ldr)).all()
