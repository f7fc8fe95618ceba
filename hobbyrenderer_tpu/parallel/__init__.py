from hobbyrenderer_tpu.parallel.mesh import build_mesh  # noqa: F401
from hobbyrenderer_tpu.parallel.frame import DeferredShardedRenderer  # noqa: F401
from hobbyrenderer_tpu.parallel.flagship import FlagshipShardedRenderer  # noqa: F401
from hobbyrenderer_tpu.parallel.pt import PathTracerShardedRenderer  # noqa: F401
