"""Texture layer: decode, packed table, stochastic sampling, alpha test.

Ref parity targets: TextureLoader.cpp (decode), Bindless.hlsli (sampling),
BasePass _AlphaTest permutation (masked cutout)."""

import io

import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.scene import textures as tx
from hobbyrenderer_tpu.scene.scene import (ALPHA_MASKED, Light, LIGHT_DIRECTIONAL,
                                           Material, Node, Scene)


def _png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, "PNG")
    return buf.getvalue()


def _checker(s=64, a=255):
    img = np.zeros((s, s, 4), np.uint8)
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    c = ((xx // 8 + yy // 8) % 2).astype(bool)
    img[..., 0] = np.where(c, 255, 0)       # red / black checker
    img[..., 3] = np.where(c, 255, a)       # red cells opaque, black cells a
    return img


def test_decode_png_roundtrip():
    img = _checker()
    out = tx.decode_image_bytes(_png_bytes(img))
    assert out.shape == (64, 64, 4)
    assert np.array_equal(out, img)


def test_decode_dds_bc1():
    # hand-build a 4x4 BC1 DDS: solid red block
    # c0 = red565 (0xF800) > c1 = 0 -> 4-color mode, all indices 0
    header = bytearray(128)
    header[0:4] = b"DDS "
    import struct
    struct.pack_into("<IIII", header, 4, 124, 0x1007, 4, 4)
    struct.pack_into("<II", header, 80, 0x4, struct.unpack("<I", b"DXT1")[0])
    block = struct.pack("<HHI", 0xF800, 0x0000, 0)
    out = tx.decode_dds(bytes(header) + block)
    assert out.shape == (4, 4, 4)
    assert out[0, 0, 0] == 255 and out[0, 0, 1] == 0 and out[0, 0, 3] == 255


def _textured_scene():
    sc = Scene()
    sc.images = [tx.decode_image_bytes(_png_bytes(_checker()))]
    m = Material(name="tex", base_color=np.ones(4, np.float32), roughness=1.0)
    m.base_color_tex = 0
    sc.add_material(m)
    return sc


def test_texture_table_layout():
    sc = _textured_scene()
    t = tx.build_texture_table(sc)
    # material 0 = default (1 texel), material 1 = 64x64 chain
    assert t["mat_tex_size"][0] == 1
    assert t["mat_tex_size"][1] == 64
    base = t["mat_mip_off"][1, 0]
    # chain offsets: 64^2, then 32^2...
    assert t["mat_mip_off"][1, 1] - base == 64 * 64
    # analytic offset formula used by the sampler matches the table
    S = 64
    for l in range(7):
        Sl = max(S >> l, 1)
        assert t["mat_mip_off"][1, l] == base + (4 * S * S - 4 * Sl * Sl) // 3
    # top-mip texel fetch: checker cell (8,0) is red, (0,0) is black
    assert (t["tex_table"][base + 8][0] & 0xFF) == 255
    assert (t["tex_table"][base][0] & 0xFF) == 0


def test_stochastic_sample_expectation():
    """Averaging many stochastic samples converges to the box-filter mean."""
    from hobbyrenderer_tpu.ops.texture import sample_material
    from hobbyrenderer_tpu.utils.rng import pcg3d
    sc = _textured_scene()
    t = tx.build_texture_table(sc)

    class G:
        tex_table = jnp.asarray(t["tex_table"])

    N = 4096
    size = jnp.full((N,), 64.0)
    base = jnp.full((N,), int(t["mat_mip_off"][1, 0]), jnp.int32)
    uv = jnp.full((N, 2), 0.5)            # center of the checker
    lod = jnp.full((N,), 3.0)             # 8x8 texels footprint ~ 50% gray
    key = pcg3d(jnp.stack([jnp.arange(N, dtype=jnp.uint32),
                           jnp.zeros(N, jnp.uint32),
                           jnp.full((N,), 7, jnp.uint32)], -1))
    s = sample_material(G(), size, base, uv, lod, key)
    mean_r = float(jnp.mean(s.albedo[:, 0]))
    # linearized 50% checker: 0.5 * 1.0 + 0.5 * 0.0 = 0.5 +- noise
    assert 0.35 < mean_r < 0.65, mean_r


def test_gltf_texture_ingest():
    """In-memory glTF with a data-URI PNG: image decoded, material resolved."""
    import base64
    from hobbyrenderer_tpu.scene.loader import load_gltf_from_memory
    png = base64.b64encode(_png_bytes(_checker())).decode()
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    pos_b64 = base64.b64encode(tri.tobytes()).decode()
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    uv_b64 = base64.b64encode(uvs.tobytes()).decode()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                                    "material": 0}]}],
        "materials": [{"pbrMetallicRoughness":
                       {"baseColorTexture": {"index": 0}}}],
        "textures": [{"source": 0}],
        "images": [{"uri": "data:image/png;base64," + png}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3",
             "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC2"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 1, "byteOffset": 0, "byteLength": 24},
        ],
        "buffers": [
            {"byteLength": 36, "uri": "data:application/octet-stream;base64," + pos_b64},
            {"byteLength": 24, "uri": "data:application/octet-stream;base64," + uv_b64},
        ],
    }
    sc = load_gltf_from_memory(doc)
    assert len(sc.images) == 1 and sc.images[0].shape == (64, 64, 4)
    assert sc.materials[1].base_color_tex == 0
    from hobbyrenderer_tpu.scene.gpu import MAT_TEX_SIZE, build_scene_gpu
    gpu = build_scene_gpu(sc, device_put=False)
    assert gpu.mat_f[1, MAT_TEX_SIZE] == 64
    assert gpu.tex_table.shape[0] > 2


def test_masked_alpha_cutout_render():
    """A masked checker quad must show holes to the wall behind it."""
    from hobbyrenderer_tpu.config import RenderingMode, RenderSettings
    from hobbyrenderer_tpu.models.deferred import DeferredRenderer
    from hobbyrenderer_tpu.scene import Camera
    from hobbyrenderer_tpu.scene.cooker import cook_mesh
    from hobbyrenderer_tpu.scene.gpu import build_scene_gpu
    from hobbyrenderer_tpu.scene.procedural import camera_looking_at, plane_geometry

    sc = Scene()
    sc.images = [tx.decode_image_bytes(_png_bytes(_checker(a=0)))]
    green = sc.add_material(Material(name="wall",
                                     base_color=np.array([0, 1, 0, 1], np.float32),
                                     roughness=1.0))
    leaf = Material(name="leaf", base_color=np.array([1, 0, 0, 1], np.float32),
                    roughness=1.0, alpha_mode=ALPHA_MASKED, alpha_cutoff=0.5)
    leaf.base_color_tex = 0
    leafi = sc.add_material(leaf)
    pos, nrm, uv, idx = plane_geometry(1.5)
    pos_v = pos[:, [0, 2, 1]].astype(np.float32)
    nrm_v = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    idx_v = idx.reshape(-1, 3)[:, ::-1].reshape(-1)
    wall = sc.add_mesh(cook_mesh(pos_v * 2, idx_v, normals=nrm_v, uvs=uv),
                       material=green)
    quad = sc.add_mesh(cook_mesh(pos_v, idx_v, normals=nrm_v, uvs=uv),
                       material=leafi)
    sc.add_node(Node(name="wall", mesh_primitives=[wall],
                     translation=np.array([0, 0, -1], np.float32)))
    sc.add_node(Node(name="leaf", mesh_primitives=[quad],
                     translation=np.array([0, 0, 1], np.float32)))
    sc.add_light(Light(type=LIGHT_DIRECTIONAL,
                       direction=np.array([0, -0.3, -1], np.float32),
                       intensity=4.0))
    sc.cameras.append(camera_looking_at(np.array([0, 0, 5], np.float32),
                                        np.zeros(3)))
    sc.finalize()

    W, H = 96, 64
    gpu = build_scene_gpu(sc)
    cam = Camera(sc.cameras[0], W, H)
    cam.jitter_enabled = False
    s = RenderSettings()
    r = DeferredRenderer(gpu, W, H, mode=RenderingMode.NORMAL_BASIC,
                         with_taa=False)
    ldr = np.asarray(r.render(gpu, cam.view_constants(0), s.as_pytree())[0]
                     ).astype(np.int32)
    # central band crosses the masked quad: both red (kept) and green
    # (cut out -> wall) pixels must appear
    band = ldr[H // 2 - 8:H // 2 + 8, W // 2 - 12:W // 2 + 12]
    red = (band[..., 0] > 80) & (band[..., 1] < 80)
    green_px = (band[..., 1] > 80) & (band[..., 0] < 80)
    assert red.sum() > 10, f"no kept masked texels: {band[8, ::4]}"
    assert green_px.sum() > 10, f"no cutout holes: {band[8, ::4]}"


# ---------------------------------------------------------------------------
# BC6H / BC7 (ref TextureLoader.cpp: the reference's primary compressed
# formats; BC7 routes through PIL's native decoder, BC6H through
# scene/bc6h.py which keeps the HDR floats PIL clamps away)
# ---------------------------------------------------------------------------

def _dds_dx10(w, h, dxgi, payload):
    import struct
    hdr = bytearray(148)
    hdr[0:4] = b"DDS "
    struct.pack_into("<I", hdr, 4, 124)
    struct.pack_into("<I", hdr, 8, 0x1007)
    struct.pack_into("<I", hdr, 12, h)
    struct.pack_into("<I", hdr, 16, w)
    struct.pack_into("<I", hdr, 76, 32)
    struct.pack_into("<I", hdr, 80, 0x4)
    hdr[84:88] = b"DX10"
    struct.pack_into("<I", hdr, 108, 0x1000)
    struct.pack_into("<I", hdr, 128, dxgi)
    struct.pack_into("<I", hdr, 132, 3)
    struct.pack_into("<I", hdr, 140, 1)
    return bytes(hdr) + payload


def test_bc6h_unsigned_fuzz_vs_pil():
    """Every BC6H mode, random blocks: our float decoder must agree with
    PIL's independent native implementation on the clamped-u8 projection
    (PIL's only output; the float path is ours alone)."""
    from PIL import Image
    from hobbyrenderer_tpu.scene.bc6h import _MODES, decode_bc6h_blocks
    rng = np.random.default_rng(0)
    for m in _MODES:
        N = 128
        blocks = rng.integers(0, 256, (N, 16), np.uint8)
        if m < 2:
            blocks[:, 0] = (blocks[:, 0] & np.uint8(252)) | np.uint8(m)
        else:
            blocks[:, 0] = (blocks[:, 0] & np.uint8(224)) | np.uint8(m)
        mine = decode_bc6h_blocks(blocks, signed=False)
        d = _dds_dx10(4, 4 * N, 95, blocks.tobytes())
        ref = np.asarray(Image.open(io.BytesIO(d)).convert("RGB"))
        ref = ref.reshape(N, 4, 4, 3).astype(int)
        mu = np.clip(np.round(np.clip(mine, 0, 1) * 255), 0, 255).astype(int)
        bad = (np.abs(mu - ref) > 1).mean()
        assert bad == 0.0, f"mode {m:05b}: {bad:.4f} of texels off by >1"


def test_bc6h_signed_spec_path():
    """SF16: spec-correct signed decode (PIL's SF16 delta handling diverges
    from the D3D spec, so untransformed modes are the cross-check and the
    transformed path is pinned by a hand-derived vector)."""
    from hobbyrenderer_tpu.scene.bc6h import decode_bc6h_blocks
    # mode 00011 (one region, EPB 10, untransformed): rw=gw=bw=300,
    # rx=gx=bx=1023-300 => negative when sign-extended
    bits = np.zeros(128, np.uint8)
    for i in range(5):
        bits[i] = (0b00011 >> i) & 1
    for base, val in ((5, 300), (15, 300), (25, 300),
                      (35, 724), (45, 724), (55, 724)):
        for i in range(10):
            bits[base + i] = (val >> i) & 1
    # indices: anchor p0 = 0 (-> e0), the rest max (-> e1)
    pos = 65 + 3
    for p in range(1, 16):
        for i in range(4):
            bits[pos + i] = 1
        pos += 4
    blk = np.zeros(16, np.uint8)
    for i in range(128):
        blk[i >> 3] |= bits[i] << (i & 7)
    out = decode_bc6h_blocks(blk[None], signed=True)[0]
    # e0 = +300 (10-bit signed) -> unq = (300<<15+0x4000)>>9 ... -> positive
    assert out[0, 0, 0] > 0
    # e1 = 724 -> sign-extended = -300 -> symmetric negative
    assert np.isclose(out[0, 1, 0], -out[0, 0, 0], rtol=1e-3)
    assert np.allclose(out[..., 0], out[..., 1]) and \
        np.allclose(out[..., 0], out[..., 2])


def test_bc7_dds_roundtrip():
    """BC7 DDS loads through decode_dds (mode-6 black block + PIL oracle on a
    random payload)."""
    blk = bytearray(16)
    blk[0] = 0x40                     # mode 6, all endpoints/indices zero
    out = tx.decode_dds(_dds_dx10(4, 4, 98, bytes(blk)))
    assert out.shape == (4, 4, 4) and out.dtype == np.uint8
    assert (out[..., :3] == 0).all()
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 256, (4, 16), np.uint8).tobytes()
    out = tx.decode_dds(_dds_dx10(8, 8, 98, payload))
    assert out.shape == (8, 8, 4)


def test_bc6h_envmap_keeps_floats():
    """A BC6H DDS loaded as an envmap keeps linear HDR floats (> 1.0)."""
    import os
    import tempfile
    from hobbyrenderer_tpu.ops.envmap import load_envmap
    from hobbyrenderer_tpu.scene.bc6h import decode_bc6h_blocks
    # mode 00011, rw=gw=bw=rx=gx=bx=600 -> a constant HDR value
    bits = np.zeros(128, np.uint8)
    for i in range(5):
        bits[i] = (0b00011 >> i) & 1
    for base in (5, 15, 25, 35, 45, 55):
        for i in range(10):
            bits[base + i] = (600 >> i) & 1
    blk = np.zeros(16, np.uint8)
    for i in range(128):
        blk[i >> 3] |= bits[i] << (i & 7)
    val = decode_bc6h_blocks(blk[None], signed=False)[0, 0, 0, 0]
    assert val > 1.0, "test block should be HDR"
    payload = blk.tobytes() * 4       # 8x8
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "sky.dds")
        with open(p, "wb") as f:
            f.write(_dds_dx10(8, 8, 95, payload))
        env = load_envmap(p)
    assert env.dtype == np.float32 and env.shape == (8, 8, 3)
    assert np.allclose(env, val, rtol=1e-3)
