"""Rendering modes ("model families"): each composes ops into a full frame graph.

Reference mode dispatch: src/Renderer.cpp:1278-1323 — Normal, NormalBasic, IBL,
ReferencePathTracer."""

from hobbyrenderer_tpu.models.deferred import build_deferred_graph, DeferredRenderer  # noqa: F401
