from hobbyrenderer_tpu.graph.rendergraph import (FrameContext, RenderGraph, RenderPass,  # noqa: F401
                                                 render_pass)
