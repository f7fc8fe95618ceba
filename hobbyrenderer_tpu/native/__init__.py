from hobbyrenderer_tpu.native.build import get_lib, native_available  # noqa: F401
