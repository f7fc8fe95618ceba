"""Device mesh construction (the multi-chip layer; new vs the single-GPU reference).

SURVEY.md §5.8: the TPU build's communication backend is ICI collectives under
shard_map over a jax.sharding.Mesh. The framebuffer is sharded tile-row-wise
("tiles" axis); scene buffers are replicated per chip (mirroring the reference's
upload-once discipline)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


TILE_AXIS = "tiles"


def build_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D mesh over the first n devices (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TILE_AXIS,))
