"""Pytree helpers: a dict with attribute access, registered as a JAX pytree.

Used for the per-frame uniform block (RenderSettings.as_pytree) and view constants,
so pass code reads ``ctx.settings.bloom_intensity`` like the reference's generated
srrhi constant-buffer structs (PIPELINE.md:320-405)."""

from __future__ import annotations

import jax


class DotDict(dict):
    """dict + attribute access; keys sorted for stable pytree structure."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _flatten(d: DotDict):
    keys = tuple(sorted(d.keys()))
    return tuple(d[k] for k in keys), keys


def _unflatten(keys, values):
    return DotDict(zip(keys, values))


jax.tree_util.register_pytree_node(DotDict, _flatten, _unflatten)
