"""Test configuration: run everything on CPU with 8 virtual devices.

The reference has no test suite at all (SURVEY.md §4); this framework tests
partitioned SpMV / halo / distributed CG on a host-simulated 8-device mesh
against scipy oracles — which requires forcing the CPU platform *before*
JAX initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers a TPU PJRT plugin and forces
# JAX_PLATFORMS=axon at interpreter start; the config update below wins as
# long as it runs before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
