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


def _uv_sphere(nu=64, nv=32):
    th = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    ph = np.linspace(1e-3, np.pi - 1e-3, nv)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pos = np.stack([np.cos(T) * np.sin(P), np.cos(P),
                    np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    idx = lambda i, j: (i % nu) * nv + j
    tris = []
    for i in range(nu):
        for j in range(nv - 1):
            tris += [[idx(i, j), idx(i + 1, j), idx(i, j + 1)],
                     [idx(i + 1, j), idx(i + 1, j + 1), idx(i, j + 1)]]
    return pos.astype(np.float32), np.asarray(tris, np.int32)


def test_qem_sphere_error_bounded():
    """QEM simplification hits the index target with object-space error far
    under the bound (ref meshopt_simplifyWithAttributes error bound 0.1,
    src/SceneLoader.cpp:1995-2044)."""
    from hobbyrenderer_tpu.native.build import simplify_qem_native
    pos, tris = _uv_sphere()
    res = simplify_qem_native(pos, tris, tris.shape[0] // 3, 0.2)
    if res is None:
        import pytest
        pytest.skip("native unavailable")
    out, err = res
    assert out.shape[0] <= tris.shape[0] // 3 + 8
    assert err < 0.05  # collapse error << bound on a smooth sphere
    # endpoint placement: surviving verts still lie on the unit sphere, and
    # simplified faces stay near the surface
    c = pos[out].mean(1)
    rc = np.linalg.norm(c, axis=-1)
    assert rc.min() > 0.95 and rc.max() < 1.05


def test_qem_preserves_borders():
    """Open-edge constraint quadrics keep the boundary of an open mesh: the
    simplified unit plane retains its corners and planarity."""
    from hobbyrenderer_tpu.native.build import simplify_qem_native
    n = 17
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n),
                         indexing="ij")
    pos = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    ii = lambda i, j: i * n + j
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            tris += [[ii(i, j), ii(i + 1, j), ii(i, j + 1)],
                     [ii(i + 1, j), ii(i + 1, j + 1), ii(i, j + 1)]]
    tris = np.asarray(tris, np.int32)
    res = simplify_qem_native(pos, tris, 16, 0.5)
    if res is None:
        import pytest
        pytest.skip("native unavailable")
    out, _ = res
    assert out.shape[0] < tris.shape[0] // 4
    used = pos[np.unique(out)]
    np.testing.assert_allclose(used[:, :2].min(0), [0, 0], atol=1e-6)
    np.testing.assert_allclose(used[:, :2].max(0), [1, 1], atol=1e-6)
    assert np.abs(used[:, 2]).max() == 0.0


def test_qem_in_lod_chain():
    """cook_mesh builds a monotonically coarsening LOD chain through the QEM
    path with non-decreasing reported error."""
    from hobbyrenderer_tpu.scene.cooker import cook_mesh
    pos, tris = _uv_sphere(48, 24)
    mesh = cook_mesh(pos, tris)
    counts = [l.indices.shape[0] for l in mesh.lods]
    errs = [l.error for l in mesh.lods]
    assert len(counts) >= 3
    assert all(b < a for a, b in zip(counts, counts[1:]))
    assert all(b >= a for a, b in zip(errs, errs[1:]))
