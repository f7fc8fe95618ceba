"""Test configuration: force 8 virtual CPU devices BEFORE jax initializes.

SURVEY.md §4: multi-chip sharding logic is tested without a real v5e-8 by running
JAX's CPU backend with xla_force_host_platform_device_count=8. This must happen
before any `import jax` in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
