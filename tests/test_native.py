"""Native C++ meshlet cooker: availability + bit-exact equality with the
python reference scan."""

import numpy as np
import pytest

from hobbyrenderer_tpu.native.build import build_meshlets_native, native_available
from hobbyrenderer_tpu.scene.cooker import _greedy_scan_py


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_matches_python(rng):
    nv = 500
    tris = rng.integers(0, nv, (4000, 3)).astype(np.int32)
    tris = tris[(tris[:, 0] != tris[:, 1]) & (tris[:, 1] != tris[:, 2])
                & (tris[:, 0] != tris[:, 2])]
    got = build_meshlets_native(tris, nv, 64, 96)
    assert got is not None
    ref = _greedy_scan_py(tris, 64, 96)
    names = ("vert_offset", "vert_count", "tri_offset", "tri_count",
             "vertices", "tris")
    for name, a, b in zip(names, got, ref):
        np.testing.assert_array_equal(a, b, err_msg=f"mismatch in {name}")


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_used_in_cook(rng):
    from hobbyrenderer_tpu.scene.cooker import cook_mesh
    from hobbyrenderer_tpu.scene.procedural import sphere_geometry
    pos, nrm, uv, idx = sphere_geometry(0.5, 24, 32)
    mesh = cook_mesh(pos, idx, normals=nrm, uvs=uv)
    ms = mesh.lods[0].meshlets
    assert int(ms.tri_count.sum()) == mesh.lods[0].indices.shape[0]
    assert (ms.vert_count <= 64).all() and (ms.tri_count <= 96).all()
