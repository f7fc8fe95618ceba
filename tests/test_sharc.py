"""SHARC radiance cache: insert/query round trip + eviction + e2e graph."""

import numpy as np
import jax.numpy as jnp

from hobbyrenderer_tpu.ops import sharc as sharcops


def test_sharc_insert_query_roundtrip(rng):
    cache = sharcops.sharc_init(1 << 12)
    cam = jnp.zeros(3)
    pos = jnp.asarray(rng.uniform(-5, 5, (256, 3)).astype(np.float32))
    nrm = jnp.asarray(np.tile([[0, 1, 0]], (256, 1)).astype(np.float32))
    rad = jnp.asarray(rng.uniform(0, 2, (256, 3)).astype(np.float32))
    valid = jnp.ones(256, bool)
    cache = sharcops.sharc_update(cache, pos, nrm, rad, valid, cam)
    out, hit = sharcops.sharc_query(cache, pos, nrm, cam)
    hit = np.asarray(hit)
    assert hit.mean() > 0.95, f"most samples should hit their own cell: {hit.mean()}"
    # same cell -> same cached value; radiance is a cell average, so positive
    assert (np.asarray(out)[hit].sum(-1) > 0).all()
    # far-away positions miss
    far = pos + 1000.0
    _, miss = sharcops.sharc_query(cache, far, nrm, cam)
    assert not np.asarray(miss).any()


def test_sharc_eviction():
    cache = sharcops.sharc_init(1 << 10)
    cam = jnp.zeros(3)
    pos = jnp.asarray([[1.0, 0, 0]], dtype=jnp.float32)
    nrm = jnp.asarray([[0, 1.0, 0]], dtype=jnp.float32)
    rad = jnp.ones((1, 3), jnp.float32)
    cache = sharcops.sharc_update(cache, pos, nrm, rad, jnp.ones(1, bool), cam)
    _, hit = sharcops.sharc_query(cache, pos, nrm, cam)
    assert np.asarray(hit)[0]
    for _ in range(int(2 * sharcops.STALE_FRAMES) + 2):
        cache = sharcops.sharc_resolve(cache)
    _, hit = sharcops.sharc_query(cache, pos, nrm, cam)
    assert not np.asarray(hit)[0], "stale entries must stop resolving"


def test_sharc_e2e_graph():
    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer
    cfg = Config(scene="stress:3", width=96, height=64,
                 mode=RenderingMode.NORMAL, indirect_mode="sharc")
    r = Renderer(cfg)
    for i in range(3):
        ldr = r.render_frame()
    cache = r._model.state["sharc_cache"]
    assert int((np.asarray(cache.key) != 0).sum()) > 50
    assert (np.asarray(ldr).sum(-1) > 0).mean() > 0.5
