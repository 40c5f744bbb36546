"""Test configuration: force a CPU backend with 8 virtual devices so
multi-device sharding tests run without TPU hardware (SURVEY.md §4), and so
Pallas kernels run in interpret mode deterministically.

The environment's sitecustomize registers a TPU PJRT plugin at interpreter
startup (before conftest runs), so env vars alone are not enough —
jax.config.update is required, and works as long as no backend has been
initialized yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU test jits: the fast gating tier
# (`-m "not slow"`) is compile-dominated on one core, so a warm
# `.jax_cache_tests/` is what makes it fit its ~3-minute budget. Cold
# bootstrap (first run, or after a JAX upgrade) recompiles everything —
# see ROADMAP "CI timing note".
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    # Mirrors the reference's pre-run data-validation gate
    # (reference conftest.py:4-15, unit_tests/test_prerun.py)
    parser.addoption("--yaml-path", action="store", default=None,
                     help="training data YAML to validate (prerun gate)")


@pytest.fixture
def yaml_path(request):
    return request.config.getoption("--yaml-path")
