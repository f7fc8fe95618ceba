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
