"""Test configuration: force an 8-device virtual CPU mesh so pjit/shard_map
logic is exercised without TPU hardware (the standard JAX multi-host test
pattern). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the env var alone is not enough when a TPU plugin registers itself at
# interpreter startup (sitecustomize): the explicit config update wins
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: the suite compiles hundreds of CPU programs
# (2-core machine); repeat runs hit the cache instead of recompiling
jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
