"""Unit tests for math/quantization (SURVEY.md §4: quantization round-trip, oct
encoding, frustum tests, exposure curves run in pure JAX on the CPU backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hobbyrenderer_tpu.utils import math as m


def test_oct_roundtrip_numpy(rng):
    n = rng.normal(size=(1024, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    dec = np.asarray(m.oct_decode(m.oct_encode(n)))
    assert np.max(np.abs(dec - n)) < 1e-6 or np.max(np.sum(dec * n, axis=-1)) <= 1.0 + 1e-6
    np.testing.assert_allclose(np.sum(dec * n, axis=-1), 1.0, atol=1e-5)


def test_oct_roundtrip_jnp(rng):
    n = rng.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    dec = np.asarray(m.oct_decode(m.oct_encode(jnp.asarray(n), xp=jnp), xp=jnp))
    np.testing.assert_allclose(np.sum(dec * n, axis=-1), 1.0, atol=1e-5)


def test_packed_normal_roundtrip(rng):
    n = rng.normal(size=(512, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    signs = np.where(rng.random(512) > 0.5, 1.0, -1.0).astype(np.float32)
    packed = m.pack_normal_oct(n, signs)
    dec, s = m.unpack_normal_oct(packed)
    # 10-bit oct: worst-case angular error well under 1 degree
    cos = np.sum(np.asarray(dec) * n, axis=-1)
    assert np.min(cos) > np.cos(np.deg2rad(1.0))
    np.testing.assert_array_equal(np.asarray(s), signs)
    # same unpack on device path
    dec_j, s_j = m.unpack_normal_oct(jnp.asarray(packed), xp=jnp)
    np.testing.assert_allclose(np.asarray(dec_j), np.asarray(dec), atol=1e-6)


def test_packed_tangent_roundtrip(rng):
    t = rng.normal(size=(256, 3)).astype(np.float32)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    dec = np.asarray(m.unpack_tangent_oct(m.pack_tangent_oct(t)))
    cos = np.sum(dec * t, axis=-1)
    assert np.min(cos) > np.cos(np.deg2rad(3.0))  # 8-bit oct is coarser


def test_uv_half2_roundtrip(rng):
    uv = (rng.random((512, 2)).astype(np.float32) * 8.0 - 2.0)
    dec = np.asarray(m.unpack_uv_half2(m.pack_uv_half2(uv)))
    np.testing.assert_allclose(dec, uv, atol=4e-3)
    dec_j = np.asarray(m.unpack_uv_half2(m.pack_uv_half2(jnp.asarray(uv), xp=jnp), xp=jnp))
    np.testing.assert_allclose(dec_j, dec, atol=1e-7)


def test_reversed_z_infinite_projection():
    near = 0.1
    P = m.perspective_reversed_z_infinite(np.deg2rad(60.0), 16 / 9, near)
    # point at the near plane -> depth 1
    p_near = np.array([0.0, 0.0, -near, 1.0], np.float32)
    c = P @ p_near
    assert abs(c[2] / c[3] - 1.0) < 1e-6
    # very far point -> depth ~0
    p_far = np.array([0.0, 0.0, -1e7, 1.0], np.float32)
    c = P @ p_far
    assert abs(c[2] / c[3]) < 1e-6
    # depth decreases monotonically with distance
    zs = [-(near * (2.0 ** k)) for k in range(10)]
    depths = [(P @ np.array([0, 0, z, 1.0]))[2] / (P @ np.array([0, 0, z, 1.0]))[3] for z in zs]
    assert all(d0 > d1 for d0, d1 in zip(depths, depths[1:]))


def test_look_at_orthonormal():
    V = m.look_at([3, 4, 5], [0, 0, 0], [0, 1, 0])
    R = V[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    # center maps to -z axis
    c = V @ np.array([0, 0, 0, 1.0], np.float32)
    assert c[2] < 0 and abs(c[0]) < 1e-5 and abs(c[1]) < 1e-5


def test_frustum_sphere_culling():
    P = m.perspective_reversed_z_infinite(np.deg2rad(90.0), 1.0, 0.1)
    V = m.look_at([0, 0, 0], [0, 0, -1], [0, 1, 0])
    planes = m.extract_frustum_planes(P @ V)
    centers = np.array([
        [0, 0, -5],     # dead center: visible
        [0, 0, 5],      # behind: culled
        [100, 0, -5],   # far right: culled
        [5.2, 0, -5],   # just outside right plane (fov 90 => |x|<=|z|): culled
        [4.9, 0, -5],   # just inside: visible
    ], np.float32)
    radii = np.array([0.1, 0.1, 0.1, 0.1, 0.2], np.float32)
    vis = m.sphere_in_frustum(planes, centers, radii)
    np.testing.assert_array_equal(vis, [True, False, False, False, True])
    # big sphere containing the camera is never culled
    assert m.sphere_in_frustum(planes, np.array([[0, 0, 10.0]]), np.array([50.0]))[0]


def test_halton_properties():
    h2 = np.asarray(m.halton(np.arange(1, 129), 2))
    h3 = np.asarray(m.halton(np.arange(1, 129), 3))
    assert h2.min() >= 0 and h2.max() < 1
    # first few known values
    np.testing.assert_allclose(h2[:4], [0.5, 0.25, 0.75, 0.125], atol=1e-6)
    np.testing.assert_allclose(h3[:3], [1 / 3, 2 / 3, 1 / 9], atol=1e-6)
    # low discrepancy: mean close to 0.5
    assert abs(h2.mean() - 0.5) < 0.01 and abs(h3.mean() - 0.5) < 0.02


def test_exposure_ev100():
    # sunny-16: f/16, 1/100s, ISO 100 -> EV100 = 14.97
    ev = m.ev100_from_camera(16.0, 1.0 / 100.0, 100.0)
    assert abs(ev - np.log2(16 * 16 * 100)) < 1e-5
    assert m.exposure_from_ev100(np.float32(0.0)) == pytest.approx(1 / 1.2)


def test_transform_and_project():
    P = m.perspective_reversed_z_infinite(np.deg2rad(60.0), 1.0, 0.1)
    V = m.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])
    pts = np.array([[0, 0, 0], [0.5, 0.5, 0]], np.float32)
    scr, depth, w = m.project_to_screen(P @ V, pts, 100, 100)
    np.testing.assert_allclose(scr[0], [50, 50], atol=1e-4)
    assert scr[1][0] > 50 and scr[1][1] < 50  # +x right, +y up -> screen y down
    assert (depth > 0).all() and (depth < 1).all()


def test_compose_trs_identity():
    t = np.zeros(3, np.float32)
    r = np.array([0, 0, 0, 1], np.float32)
    s = np.ones(3, np.float32)
    np.testing.assert_allclose(m.compose_trs(t, r, s), np.eye(4), atol=1e-7)
    # 90 deg about +Y: +x -> -z  (RH)
    r90 = np.array([0, np.sin(np.pi / 4), 0, np.cos(np.pi / 4)], np.float32)
    M = m.compose_trs(t, r90, s)
    v = M[:3, :3] @ np.array([1, 0, 0], np.float32)
    np.testing.assert_allclose(v, [0, 0, -1], atol=1e-6)
