from hobbyrenderer_tpu.utils import math as hrmath  # noqa: F401
