"""Joint-bilateral upsample (ops/upsample.py): alignment, edge preservation,
fallback, and sharded==single exactness (the GI-class resolves ride this)."""

import numpy as np
import jax
import jax.numpy as jnp

from hobbyrenderer_tpu.ops.upsample import joint_bilateral_upsample


def _flat_guides(H, W, s):
    """Uniform geometry: guidance is a no-op, pure bilinear remains."""
    fd = jnp.full((H, W), 0.5)
    fn = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
    qd = fd[::s, ::s]
    qn = fn[::s, ::s]
    qv = jnp.ones((H // s, W // s), bool)
    return qd, qn, qv, fd, fn


def test_constant_field_exact():
    H, W, s = 32, 48, 4
    qd, qn, qv, fd, fn = _flat_guides(H, W, s)
    q = jnp.full((H // s, W // s, 3), 0.7)
    out = joint_bilateral_upsample(q, qd, qn, qv, fd, fn, s)
    np.testing.assert_allclose(np.asarray(out), 0.7, rtol=1e-5)


def test_top_left_alignment():
    """Output at the sample positions (i*s, j*s) equals the grid value —
    the [::s] convention (jax.image.resize was center-aligned: ~1.5px shift)."""
    H, W, s = 32, 32, 4
    qd, qn, qv, fd, fn = _flat_guides(H, W, s)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.random((H // s, W // s, 2), np.float32))
    out = np.asarray(joint_bilateral_upsample(q, qd, qn, qv, fd, fn, s))
    np.testing.assert_allclose(out[::s, ::s], np.asarray(q), atol=1e-5)
    # and interior points interpolate linearly between grid samples
    expect = 0.5 * (q[1, 1] + q[1, 2])
    np.testing.assert_allclose(out[4, 6], expect, atol=1e-5)


def test_depth_edge_no_bleed():
    """A depth discontinuity MIDWAY between grid columns: full-res pixels on
    the near plane must take only near-plane grid values (bilinear would blend
    ~50% of the far plane's signal at the edge)."""
    H, W, s = 16, 16, 4
    edge = 6                      # full-res column of the depth step
    fd = jnp.where(jnp.arange(W)[None, :] < edge, 1.0, 0.2)
    fd = jnp.broadcast_to(fd, (H, W))
    fn = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
    qd, qn, qv = fd[::s, ::s], fn[::s, ::s], jnp.ones((H // s, W // s), bool)
    # near plane lit (1.0), far plane dark (0.0), per grid sample
    q = jnp.where(qd[..., None] > 0.5, 1.0, 0.0)
    out = np.asarray(joint_bilateral_upsample(q, qd, qn, qv, fd, fn, s))
    near = np.asarray(fd) > 0.5
    assert out[near].min() > 0.95, "far-plane signal bled onto the near plane"
    assert out[~near].max() < 0.05, "near-plane signal bled onto the far plane"


def test_invalid_samples_excluded_and_fallback():
    H, W, s = 16, 16, 4
    qd, qn, qv, fd, fn = _flat_guides(H, W, s)
    q = jnp.ones((H // s, W // s, 1))
    q = q.at[1, 1].set(100.0)
    qv = qv.at[1, 1].set(False)   # the hot sample is invalid
    out = np.asarray(joint_bilateral_upsample(q, qd, qn, qv, fd, fn, s))
    assert out.max() <= 1.0 + 1e-5
    # all-invalid grid -> zeros, not NaN
    out0 = np.asarray(joint_bilateral_upsample(
        q, qd, qn, jnp.zeros_like(qv), fd, fn, s))
    assert np.isfinite(out0).all() and np.abs(out0).max() == 0.0


def test_sharded_matches_single():
    """Row-banded upsample (1-row ppermute halo on the low-res grid) is
    bit-comparable to the single-chip result."""
    from jax.sharding import Mesh
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from hobbyrenderer_tpu.ops import shard_utils as shu

    H, W, s, n = 64, 32, 4, 4
    rng = np.random.default_rng(11)
    fd = jnp.asarray(0.2 + rng.random((H, W), np.float32))
    nz = rng.normal(size=(H, W, 3)).astype(np.float32)
    fn = jnp.asarray(nz / np.linalg.norm(nz, axis=-1, keepdims=True))
    q = jnp.asarray(rng.random((H // s, W // s, 3), np.float32))
    qd, qn = fd[::s, ::s], fn[::s, ::s]
    qv = jnp.asarray(rng.random((H // s, W // s)) > 0.2)

    single = joint_bilateral_upsample(q, qd, qn, qv, fd, fn, s)

    mesh = Mesh(np.array(jax.devices()[:n]), ("rows",))
    shard_h = H // n

    def banded(q, qd, qn, qv, fd, fn):
        shard = shu.make_row_shard("rows", n, shard_h)
        return joint_bilateral_upsample(q, qd, qn, qv, fd, fn, s, shard=shard)

    out = shard_map(banded, mesh=mesh,
                    in_specs=(P("rows"),) * 6,
                    out_specs=P("rows"))(q, qd, qn, qv, fd, fn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               atol=1e-6)
