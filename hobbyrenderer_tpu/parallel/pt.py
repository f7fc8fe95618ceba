"""Sample-parallel multi-chip path tracer.

Reference: the single-GPU progressive path tracer
(src/PathTracerRenderer.cpp, src/shaders/PathTracer.hlsl:331-339) accumulates
one sample/pixel/frame. SURVEY.md §2.7's multi-chip row prescribes the TPU
parallelism: "path-tracer sample-parallel accumulation with final psum".

Design: scene + BVH are replicated (the upload-once discipline); each device
traces the FULL pixel grid with its own RNG stream — device k of an n-device
mesh renders deterministic accumulation frame c*n + k, so one n-device call
is EXACTLY the mean of n consecutive single-chip frames (the same contract
--pt-spp batching documents in models/pathtracer.trace_paths). The per-call
mean is one psum over ICI; accumulation/exposure/tonemap run replicated
(trivially cheap next to the trace). Perfect scaling: n chips = n x the
samples/s of one chip, with 12 bytes/pixel of ICI traffic per call."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from hobbyrenderer_tpu.models.pathtracer import SceneRT, trace_paths
from hobbyrenderer_tpu.ops import post as postops
from hobbyrenderer_tpu.parallel.mesh import TILE_AXIS, build_mesh

try:  # JAX >= 0.6 moved shard_map around
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


class PathTracerShardedRenderer:
    """API-compatible render(gpu, vc, settings, dt) -> (ldr, 0)."""

    def __init__(self, gpu, width: int, height: int, rt: SceneRT, mesh=None,
                 n_devices: int = 0, config=None, env_as_lights: bool = False,
                 spp: int = 1):
        self.mesh = mesh if mesh is not None else build_mesh(n_devices)
        self.n = int(self.mesh.devices.size)
        self.width, self.height = width, height
        self.rt = rt
        self.env_as_lights = env_as_lights
        self.spp = max(int(spp), 1)
        self.max_bounces = int(getattr(getattr(config, "settings", None),
                                       "max_bounces", 8) or 8)
        self.rr_start = int(getattr(getattr(config, "settings", None),
                                    "rr_start_bounce", 2) or 2)
        self.accum = jnp.zeros((height, width, 3), jnp.float32)
        self.num_accum = 0          # SAMPLES accumulated (n * spp per call)
        self.exposure = jnp.float32(1.0)
        self._prev_view = None
        self._jitted = None

    def _step(self, gpu, rt, vc, settings, accum, call_index, n_accum,
              exposure, dt):
        n = self.n
        spp = self.spp

        def body(gpu, rt, vc, settings, accum, exposure):
            k = jax.lax.axis_index(TILE_AXIS)
            # device k traces deterministic frames call*n*spp + k*spp .. +spp-1
            # (trace_paths expands spp internally as frame*spp + s, so pass
            # the spp-frame ordinal call*n + k)
            sample = trace_paths(gpu, rt, vc, settings, self.height,
                                 self.width,
                                 call_index * n + k.astype(jnp.int32),
                                 self.max_bounces, self.rr_start,
                                 env_as_lights=self.env_as_lights, spp=spp)
            sample = jax.lax.pmean(sample, TILE_AXIS)      # ICI psum / n
            sample = sample.reshape(self.height, self.width, 3)
            w = (n * spp) / (n_accum.astype(jnp.float32) + n * spp)
            accum = accum * (1.0 - w) + sample * w
            hist = postops.luminance_histogram(accum)
            exposure = postops.exposure_adapt(hist, exposure, dt, settings)
            ldr = postops.tonemap_to_output(accum, exposure)
            return ldr, accum, exposure

        fn = shard_map(body, mesh=self.mesh,
                       in_specs=(P(), P(), P(), P(), P(), P()),
                       out_specs=(P(), P(), P()), check_vma=False)
        return fn(gpu, rt, vc, settings, accum, exposure)

    def render(self, gpu, vc, settings, dt: float = 1 / 60):
        vm = np.asarray(vc["view_proj_no_jitter"])
        if self._prev_view is None or not np.array_equal(vm, self._prev_view):
            self.num_accum = 0
            self.accum = jnp.zeros_like(self.accum)
            self._prev_view = vm
        if self._jitted is None:
            self._jitted = jax.jit(self._step,
                                   static_argnums=(),
                                   donate_argnums=(4,))
        call = self.num_accum // (self.n * self.spp)
        ldr, self.accum, self.exposure = self._jitted(
            gpu, self.rt, vc, settings, self.accum, jnp.int32(call),
            jnp.int32(self.num_accum), self.exposure, jnp.float32(dt))
        self.num_accum += self.n * self.spp
        return ldr, jnp.int32(0)
