"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU pods (SURVEY.md §4).

The environment's sitecustomize force-registers a TPU PJRT plugin and pins
JAX_PLATFORMS — so we must override via jax.config *before* any backend
initializes (backends are lazy; conftest import runs before test imports).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# session-persistent compile cache: CPU jit results survive across pytest
# runs, cutting the compile-dominated suite time severely on re-runs
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")


@pytest.fixture
def rng():
    return np.random.default_rng(12345)  # reference's iForest seed (src/Object.cc:1214)
