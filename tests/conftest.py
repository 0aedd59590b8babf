"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__).

Note: the session environment preloads jax and pins JAX_PLATFORMS=axon (the
real TPU) via a sitecustomize hook, so plain env vars are too late — the
platform must be overridden through jax.config before first backend use.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the dense sweeps compile in tens of
# seconds on CPU and dominate suite time; cached executables survive
# across test processes and runs
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("HCMVS_TEST_CACHE",
                                 "/tmp/hcmvs_test_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules: a single pytest
    process accumulates every module's jit programs (hundreds of MB of
    CPU executables + 8-device arrays) and starts thrashing; with the
    persistent compilation cache, re-loading is cheap."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running scale/integration gates")
