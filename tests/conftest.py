"""Test configuration: force 8 virtual CPU devices BEFORE jax initializes.

SURVEY.md §4: multi-chip sharding logic is tested without a real v5e-8 by running
JAX's CPU backend with xla_force_host_platform_device_count=8. This must happen
before any `import jax` in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's LLVM "expensive" passes take minutes on the raster/traversal loops;
# tests only need correctness, not optimized CPU code (TPU uses a different backend)
if "xla_llvm_disable_expensive_passes" not in flags:
    flags += " --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# CAUTION: the axon sitecustomize imports jax at interpreter startup, which
# latches jax_platforms from the original environment (axon). The env vars above
# are too late for that — but backends are initialized lazily, so config.update
# here still wins. These two lines are what actually forces CPU + 8 devices.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above handles it

# persistent compilation cache: CPU compiles of the raster/BVH loops are slow;
# cache them across test runs
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Drop compiled executables at module teardown.

    The full suite jits ~150+ whole-frame programs; keeping every executable
    loaded in the XLA:CPU JIT eventually segfaults the COMPILER on the next
    program (observed deterministically around the 150th test, standalone the
    same test passes — an accumulation failure, not a test bug). The
    persistent disk cache (above) makes any cross-module re-jit a cheap
    reload, so this costs seconds, not the minutes of a cold recompile."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: estimator/parity core (~10 min) — `pytest -m quick` when the "
        "full 55-min suite is too slow for the edit loop")


# the estimator-correctness + parity core: cheap modules that catch most
# regressions (VERDICT-r3 weak #8 — give the edit loop a fast gate)
_QUICK_MODULES = {
    "test_math.py", "test_bvh.py", "test_bvh16.py", "test_wtrace.py",
    "test_restir_kernel.py", "test_textures.py", "test_upsample.py",
    "test_lights.py", "test_scene.py", "test_runtime.py", "test_pt_compact.py",
}


def pytest_collection_modifyitems(config, items):
    import pathlib
    for item in items:
        if pathlib.Path(str(item.fspath)).name in _QUICK_MODULES:
            item.add_marker("quick")
