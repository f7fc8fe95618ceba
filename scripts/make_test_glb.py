"""Generate tests/assets/checkroom.glb — a small REAL .glb asset for the
end-to-end CI test (VERDICT r3 #9): embedded PNG textures (opaque checker +
alpha-masked grate), a masked material, an emissive panel, a point light
(KHR_lights_punctual) and an authored camera. Written with plain struct
packing — no external glTF writer."""

from __future__ import annotations

import json
import os
import struct
import sys
import zlib

import numpy as np


def png_bytes(rgba: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit RGBA)."""
    h, w = rgba.shape[:2]

    def chunk(tag, data):
        out = struct.pack(">I", len(data)) + tag + data
        return out + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 9))
            + chunk(b"IEND", b""))


def quad(size, y=0.0):
    p = np.array([[-size, y, -size], [size, y, -size],
                  [size, y, size], [-size, y, size]], np.float32)
    n = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float32)
    idx = np.array([0, 2, 1, 0, 3, 2], np.uint16)
    return p, n, uv, idx


def box(hx, hy, hz):
    faces = []
    for axis, sgn in [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]:
        n = np.zeros(3, np.float32)
        n[axis] = sgn
        u = np.zeros(3, np.float32)
        u[(axis + 1) % 3] = 1.0
        v = np.cross(n, u)
        c = n * [hx, hy, hz][axis]
        ext_u = [hx, hy, hz][(axis + 1) % 3]
        ext_v = [hx, hy, hz][(axis + 2) % 3]
        quad_p = [c - u * ext_u - v * ext_v, c + u * ext_u - v * ext_v,
                  c + u * ext_u + v * ext_v, c - u * ext_u + v * ext_v]
        faces.append((np.stack(quad_p).astype(np.float32),
                      np.tile(n, (4, 1)),
                      np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)))
    P = np.concatenate([f[0] for f in faces])
    N = np.concatenate([f[1] for f in faces])
    UV = np.concatenate([f[2] for f in faces])
    idx = []
    for f in range(6):
        b = 4 * f
        idx += [b, b + 2, b + 1, b, b + 3, b + 2]
    return P, N, UV, np.asarray(idx, np.uint16)


def main(out_path):
    rng = np.random.default_rng(11)
    # opaque checker texture
    c = np.zeros((64, 64, 4), np.uint8)
    yy, xx = np.mgrid[0:64, 0:64]
    ck = ((yy // 8 + xx // 8) % 2).astype(bool)
    c[..., 0] = np.where(ck, 200, 60)
    c[..., 1] = np.where(ck, 160, 80)
    c[..., 2] = np.where(ck, 110, 140)
    c[..., 3] = 255
    # alpha-masked grate texture
    g = np.zeros((32, 32, 4), np.uint8)
    bars = ((np.mgrid[0:32, 0:32][1] // 4) % 2).astype(bool)
    g[..., :3] = 180
    g[..., 3] = np.where(bars, 255, 0)
    png0, png1 = png_bytes(c), png_bytes(g)

    geoms = [quad(6.0), box(1.0, 1.0, 1.0), quad(1.5), box(0.6, 0.05, 0.6)]
    bin_parts = []
    offset = 0
    views = []
    accessors = []

    def add_view(data: bytes, target=None):
        nonlocal offset
        pad = (-len(data)) % 4
        bin_parts.append(data + b"\x00" * pad)
        v = {"buffer": 0, "byteOffset": offset, "byteLength": len(data)}
        if target:
            v["target"] = target
        views.append(v)
        offset += len(data) + pad
        return len(views) - 1

    def add_acc(arr, type_, comp, target):
        vi = add_view(np.ascontiguousarray(arr).tobytes(), target)
        a = {"bufferView": vi, "componentType": comp,
             "count": int(arr.shape[0]), "type": type_}
        if type_ == "VEC3" and comp == 5126:
            a["min"] = [float(x) for x in arr.min(0)]
            a["max"] = [float(x) for x in arr.max(0)]
        accessors.append(a)
        return len(accessors) - 1

    meshes = []
    for i, (p, n, uv, idx) in enumerate(geoms):
        ap = add_acc(p, "VEC3", 5126, 34962)
        an = add_acc(n, "VEC3", 5126, 34962)
        at = add_acc(uv, "VEC2", 5126, 34962)
        ai = add_acc(idx, "SCALAR", 5123, 34963)
        mat = [0, 1, 2, 3][i]
        meshes.append({"primitives": [{
            "attributes": {"POSITION": ap, "NORMAL": an, "TEXCOORD_0": at},
            "indices": ai, "material": mat}]})

    iv0 = add_view(png0)
    iv1 = add_view(png1)

    doc = {
        "asset": {"version": "2.0", "generator": "hobbyrenderer-tpu tests"},
        "extensionsUsed": ["KHR_lights_punctual"],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1.0, 0.85, 0.6], "intensity": 60.0,
             "range": 30.0, "name": "bulb"}]}},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2, 3, 4, 5]}],
        "nodes": [
            {"name": "floor", "mesh": 0},
            {"name": "crate", "mesh": 1, "translation": [0.0, 1.0, 0.0],
             "rotation": [0.0, 0.3826834, 0.0, 0.9238795]},
            {"name": "grate", "mesh": 2,
             "translation": [-2.5, 1.5, 0.0],
             "rotation": [0.7071068, 0.0, 0.0, 0.7071068]},
            {"name": "panel", "mesh": 3, "translation": [2.2, 0.1, 2.0]},
            {"name": "bulb", "translation": [-1.5, 3.0, 2.5],
             "extensions": {"KHR_lights_punctual": {"light": 0}}},
            {"name": "cam", "translation": [4.5, 3.2, 5.5],
             "rotation": [-0.2126311, 0.3820515, 0.0897056, 0.8953154],
             "camera": 0},
        ],
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.9, "znear": 0.05}}],
        "materials": [
            {"name": "floor", "pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "roughnessFactor": 0.85, "metallicFactor": 0.0}},
            {"name": "crate", "pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "roughnessFactor": 0.4, "metallicFactor": 0.2}},
            {"name": "grate", "alphaMode": "MASK", "alphaCutoff": 0.5,
             "doubleSided": True, "pbrMetallicRoughness": {
                 "baseColorTexture": {"index": 1},
                 "roughnessFactor": 0.6}},
            {"name": "panel", "emissiveFactor": [1.0, 1.0, 1.0],
             "extensions": {"KHR_materials_emissive_strength":
                            {"emissiveStrength": 6.0}},
             "pbrMetallicRoughness": {"baseColorFactor": [1, 1, 1, 1]}},
        ],
        "textures": [{"source": 0, "sampler": 0}, {"source": 1, "sampler": 0}],
        "samplers": [{"wrapS": 10497, "wrapT": 10497}],
        "images": [{"bufferView": iv0, "mimeType": "image/png"},
                   {"bufferView": iv1, "mimeType": "image/png"}],
        "buffers": [{"byteLength": offset}],
        "bufferViews": views,
        "accessors": accessors,
        "meshes": meshes,
    }

    js = json.dumps(doc, separators=(",", ":")).encode()
    js += b" " * ((-len(js)) % 4)
    bin_blob = b"".join(bin_parts)
    total = 12 + 8 + len(js) + 8 + len(bin_blob)
    glb = (struct.pack("<III", 0x46546C67, 2, total)
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(bin_blob), 0x004E4942) + bin_blob)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(glb)
    print(f"wrote {out_path} ({len(glb)} bytes)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else os.path.join(os.path.dirname(__file__), "..", "tests",
                           "assets", "checkroom.glb"))
