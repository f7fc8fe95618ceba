"""Texture streaming: feedback -> budgeted tile IO -> residency convergence.

Reference capabilities under test (SURVEY.md §2.6 #26-31): sampler feedback,
residency maps, per-frame tile budget, LRU page heaps, eviction hysteresis."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbyrenderer_tpu.ops import texture as texops
from hobbyrenderer_tpu.scene.procedural import make_default_cube_scene
from hobbyrenderer_tpu.scene.streaming import (PAGE_TEXELS, TILE,
                                               TextureStreamer)
from hobbyrenderer_tpu.scene.textures import MAX_MIPS, material_texel_chain


def _textured_scene(res=256, n_mats=2, seed=0):
    sc = make_default_cube_scene()
    rng = np.random.default_rng(seed)
    sc.images = []
    from hobbyrenderer_tpu.scene.scene import Material
    for k in range(n_mats):
        img = rng.integers(0, 256, (res, res, 4), dtype=np.uint8)
        img[..., 3] = 255
        sc.images.append(img)
        sc.materials.append(Material(name=f"tex{k}", base_color_tex=len(sc.images) - 1))
    return sc


def _feedback(n_mats, demands):
    """demands: {mat: finest_mip}."""
    fb = np.zeros((n_mats, MAX_MIPS), np.int32)
    for mi, li in demands.items():
        fb[mi, li] = 100
    return fb


def test_streaming_residency_converges_and_matches_dense():
    sc = _textured_scene()
    M = len(sc.materials)
    mi = M - 2                       # first textured material (256^2)
    st = TextureStreamer(sc, budget_pages=256, tiles_per_frame=16,
                         hysteresis_s=0.0, sync_mode=True)
    tables = st.initial_tables()
    # initially only tail mips resident: 256^2 -> tail at 32 = mip 3
    assert int(np.asarray(tables.mat_resident)[mi]) == 3

    # demand mip 0 and stream until resident
    for step in range(64):
        st.publish_feedback(_feedback(M, {mi: 0}))
        st.poll()
        tables = st.apply_updates(tables)
        if int(np.asarray(tables.mat_resident)[mi]) == 0:
            break
    assert int(np.asarray(tables.mat_resident)[mi]) == 0, "never converged"
    # budget respected: mip 0 alone is 64 tiles, 16/frame -> >= 4 applies
    assert step >= 3

    # streamed sampling now matches the dense-chain ground truth exactly
    chain = material_texel_chain(sc, mi)
    S = chain[0].shape[0]
    uv = jnp.asarray(np.random.default_rng(1).random((128, 2), np.float32))
    key = jnp.zeros((128, 3), jnp.uint32)     # u=0 -> deterministic nearest
    ts = texops.sample_material_streamed(
        tables, jnp.full((128,), mi, jnp.int32), uv, jnp.zeros(128), key)
    xi = np.floor(np.asarray(uv)[:, 0] * S - 0.5).astype(int) % S
    yi = np.floor(np.asarray(uv)[:, 1] * S - 0.5).astype(int) % S
    expect = chain[0][yi, xi, 0:3].astype(np.float32) / 255.0
    got = np.asarray(ts.albedo)
    assert np.allclose(got, expect ** 2.2, atol=1e-3), \
        f"max err {np.abs(got - expect ** 2.2).max()}"


def test_streaming_budget_per_frame():
    sc = _textured_scene()
    M = len(sc.materials)
    mi = M - 2
    st = TextureStreamer(sc, budget_pages=256, tiles_per_frame=8,
                         hysteresis_s=0.0, sync_mode=True)
    st.publish_feedback(_feedback(M, {mi: 0}))
    st.poll()
    up = st._pending
    assert up is not None
    assert up.page_entries.shape[0] <= 8, "tile budget exceeded"


def test_streaming_eviction_after_hysteresis():
    # injectable clock: the hysteresis window must be immune to how long the
    # surrounding test run takes (wall-clock flaked under a loaded full suite)
    clock = {"t": 0.0}
    sc = _textured_scene()
    M = len(sc.materials)
    mi = M - 2
    st = TextureStreamer(sc, budget_pages=256, tiles_per_frame=128,
                         hysteresis_s=2.0, sync_mode=True,
                         now_fn=lambda: clock["t"])
    tables = st.initial_tables()
    for _ in range(32):
        st.publish_feedback(_feedback(M, {mi: 0}))
        st.poll()
        tables = st.apply_updates(tables)
        if int(np.asarray(tables.mat_resident)[mi]) == 0:
            break
    assert int(np.asarray(tables.mat_resident)[mi]) == 0
    free_before = len(st.free_pages)
    # demand only a coarse mip; within hysteresis nothing is dropped
    clock["t"] += 0.5
    st.publish_feedback(_feedback(M, {mi: 3}))
    st.poll()
    tables = st.apply_updates(tables)
    assert int(np.asarray(tables.mat_resident)[mi]) == 0, \
        "downgraded before hysteresis expired"
    clock["t"] += 2.2
    st.publish_feedback(_feedback(M, {mi: 3}))
    st.poll()
    tables = st.apply_updates(tables)
    assert int(np.asarray(tables.mat_resident)[mi]) == 3, "never downgraded"
    assert len(st.free_pages) > free_before, "no pages were recycled"


def test_streaming_pool_reuse_under_pressure():
    """Two materials demanding more than the pool: pages recycle via LRU and
    whatever mips complete stay exactly sampleable."""
    sc = _textured_scene(res=256, n_mats=3)
    M = len(sc.materials)
    tex_mats = [M - 3, M - 2, M - 1]
    # pool smaller than one material's full chain (64+16+4 = 84 tiles)
    st = TextureStreamer(sc, budget_pages=40, tiles_per_frame=16,
                         hysteresis_s=0.0, sync_mode=True)
    tables = st.initial_tables()
    for step in range(48):
        st.publish_feedback(_feedback(M, {m: 1 for m in tex_mats}))
        st.poll()
        tables = st.apply_updates(tables)
    res = np.asarray(tables.mat_resident)[tex_mats]
    assert (res <= 3).all()
    # residency claims are honest: every tile of every resident mip is paged
    pt = np.asarray(tables.page_table)
    for m in tex_mats:
        for li in range(int(res[tex_mats.index(m)]), 4):
            if li >= 3:
                continue
            base = st.vt_base[m, li]
            nt = st._mip_tiles(m, li)
            assert (pt[base:base + nt] >= 0).all(), \
                f"mat {m} mip {li} claimed resident but has absent tiles"


def test_streaming_end_to_end_render():
    """Full Renderer loop with --tex-streaming: frames converge to the dense
    render as tiles stream in."""
    import time as _t
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer
    from hobbyrenderer_tpu.scene.cooker import cook_mesh
    from hobbyrenderer_tpu.scene.procedural import (camera_looking_at,
                                                    plane_geometry)
    from hobbyrenderer_tpu.scene.scene import Material, Node, Scene

    def build_scene():
        sc = Scene()
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (256, 256, 4), dtype=np.uint8)
        img[..., 3] = 255
        sc.images = [img]
        m = sc.add_material(Material(name="floor", roughness=0.8,
                                     base_color_tex=0, double_sided=True))
        pos, nrm, uv, idx = plane_geometry(4.0, uv_tiles=1.0)
        prim = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=m)
        sc.add_node(Node(name="floor", mesh_primitives=[prim]))
        sc.cameras.append(camera_looking_at(np.array([0, 3.0, 3.0], np.float32),
                                            np.array([0, 0, 0], np.float32)))
        sc.finalize()
        return sc

    W, H = 96, 64
    cfg_s = Config(width=W, height=H, mode=RenderingMode.NORMAL_BASIC,
                   tex_streaming=True, tex_budget_mb=8)
    r_s = Renderer(cfg_s, scene=build_scene())
    try:
        first = np.asarray(r_s.render_frame()).astype(np.int32)
        for k in range(40):
            r_s.render_frame()
            _t.sleep(0.02)      # let the async worker drain feedback
            if int(r_s.gpu.tex_stream.mat_resident[0]) == 0:
                break
        assert int(r_s.gpu.tex_stream.mat_resident[0]) == 0, \
            "streamer never brought mip 0 resident"
        n_frames = r_s.frame_index

        cfg_d = Config(width=W, height=H, mode=RenderingMode.NORMAL_BASIC)
        r_d = Renderer(cfg_d, scene=build_scene())
        for _ in range(n_frames):
            ldr_d = r_d.render_frame()
        # wash the coarse warm-up frames out of the TAA history
        for _ in range(30):
            ldr_s = r_s.render_frame()
            ldr_d = r_d.render_frame()
        a = np.asarray(ldr_s).astype(np.int32)
        b = np.asarray(ldr_d).astype(np.int32)
        err = np.abs(a - b).mean()
        assert err < 6.0, f"streamed render deviates from dense: {err:.2f} LSB"
        # and the warm-up frame (tail mips only) was visibly coarser
        assert np.abs(first - b).mean() > err
    finally:
        r_s.shutdown()


def test_streaming_residency_honest_under_churn():
    """Adversarial interleaving (partial loads interrupted by downgrades and
    LRU recycling): after EVERY apply, any mip claimed resident must have all
    tiles paged (regression: a recycled page of a partially-pending mip was
    dropped from the pending set, leaving a permanent hole)."""
    clock = {"t": 0.0}
    sc = _textured_scene(res=256, n_mats=3)
    M = len(sc.materials)
    tex_mats = [M - 3, M - 2, M - 1]
    st = TextureStreamer(sc, budget_pages=48, tiles_per_frame=5,
                         hysteresis_s=0.5, sync_mode=True,
                         now_fn=lambda: clock["t"])
    tables = st.initial_tables()
    rng = np.random.default_rng(9)
    for step in range(120):
        clock["t"] += 0.3
        demands = {m: int(rng.integers(0, 4)) for m in tex_mats
                   if rng.random() < 0.8}
        st.publish_feedback(_feedback(M, demands))
        st.poll()
        tables = st.apply_updates(tables)
        pt = np.asarray(tables.page_table)
        res = np.asarray(tables.mat_resident)
        for m in tex_mats:
            for li in range(int(res[m]), st.tail_mip[m]):
                base = st.vt_base[m, li]
                nt = st._mip_tiles(m, li)
                assert (pt[base:base + nt] >= 0).all(), \
                    f"step {step}: mat {m} mip {li} resident with holes"


def test_tex_residency_debug_overlay():
    """--tex-debug heatmap (ref TileResidencyDebugRenderer): at startup only
    the mip tails are resident, so textured pixels must show the residency
    tint (differ from the plain render); the overlay disappears once the
    demanded mips stream in... which we emulate by comparing against the
    overlay-less config at the same frame."""
    import time as _t
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer
    from hobbyrenderer_tpu.scene.procedural import (camera_looking_at,
                                                    plane_geometry)
    from hobbyrenderer_tpu.scene.scene import Material, Node, Scene
    from hobbyrenderer_tpu.scene.cooker import cook_mesh

    def build_scene():
        rng = np.random.default_rng(3)
        img = (rng.random((256, 256, 4)) * 255).astype(np.uint8)
        img[..., 3] = 255
        sc = Scene()
        sc.images = [img]
        m = sc.add_material(Material(name="floor", roughness=0.8,
                                     base_color_tex=0, double_sided=True))
        pos, nrm, uv, idx = plane_geometry(4.0, uv_tiles=1.0)
        prim = sc.add_mesh(cook_mesh(pos, idx, normals=nrm, uvs=uv), material=m)
        sc.add_node(Node(name="floor", mesh_primitives=[prim]))
        sc.cameras.append(camera_looking_at(np.array([0, 3.0, 3.0], np.float32),
                                            np.array([0, 0, 0], np.float32)))
        sc.finalize()
        return sc

    W, H = 96, 64
    cfg = Config(width=W, height=H, mode=RenderingMode.NORMAL_BASIC,
                 tex_streaming=True, tex_budget_mb=8, tex_debug=True)
    r = Renderer(cfg, scene=build_scene())
    over = np.asarray(r.render_frame()).astype(np.int32)
    r.shutdown()
    cfg2 = Config(width=W, height=H, mode=RenderingMode.NORMAL_BASIC,
                  tex_streaming=True, tex_budget_mb=8)
    r2 = Renderer(cfg2, scene=build_scene())
    plain = np.asarray(r2.render_frame()).astype(np.int32)
    r2.shutdown()
    # frame 0: everything is clamped to the tail -> red-ish tint on the floor
    diff_frac = (np.abs(over - plain).max(-1) > 8).mean()
    assert diff_frac > 0.2, f"overlay changed only {diff_frac:.2%} of pixels"
    # tint leans red (clamped) not green on the textured region
    changed = np.abs(over - plain).max(-1) > 8
    assert (over[..., 0][changed].mean() > plain[..., 0][changed].mean()), \
        "residency-clamped pixels should gain red"
