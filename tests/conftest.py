"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware (SURVEY.md §4 implication). We emulate an
8-chip slice on CPU so sharding/mesh tests exercise real multi-device code
paths. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize registers a TPU PJRT plugin and pins
# JAX_PLATFORMS before conftest runs; the config.update below wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long multi-process tests (always run in CI; "
        "deselect locally with -m 'not slow')")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
