"""hobbyrenderer_tpu — a TPU-native rendering framework built from scratch in JAX/XLA/Pallas.

Rebuilds the capabilities of the reference C++/D3D12 renderer (lawfuyang/HobbyRenderer,
surveyed in SURVEY.md) as an idiomatic TPU program:

- ``scene``     glTF 2.0 ingest, meshlet/LOD cooking, cooked binary cache, camera
                (reference: src/Scene.cpp, src/SceneLoader.cpp, src/SceneCache.cpp)
- ``graph``     jit-compiled pass graph + FrameState pytree replacing the D3D12
                RenderGraph/command-list machinery (reference: src/RenderGraph.cpp)
- ``ops``       the "shader library": culling, software rasterization, BVH build +
                traversal, shading, ReSTIR, SHARC, denoising, post-processing
                (reference: src/shaders/*.hlsl)
- ``models``    rendering modes composing ops into full frames: Deferred (Normal /
                NormalBasic / IBL) and ReferencePathTracer (reference: src/Renderer.cpp
                rendering-mode dispatch at src/Renderer.cpp:1278-1323)
- ``parallel``  multi-chip framebuffer sharding over a jax.sharding.Mesh with ICI
                collectives (new for TPU; the reference is single-GPU)
- ``utils``     math, quantization, RNG, timing, image IO
"""

__version__ = "0.1.0"

from hobbyrenderer_tpu.config import Config  # noqa: F401
