"""Test config: run everything on the CPU backend with 8 virtual devices.

Mirrors the reference's csim-vs-golden strategy (SURVEY.md §4): every kernel is
checked bit-exactly against a scalar NumPy golden model, and multi-chip
sharding is validated on a virtual 8-device CPU mesh without real hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The axon TPU plugin (when present) registers itself at interpreter start
# and overrides the env var; force the CPU backend through the config API.
jax.config.update("jax_platforms", "cpu")

# XLA CPU compiles of int8 convs dominate test wall-clock; cache them.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
