"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding is validated on CPU (per SURVEY.md §4d) since real
multi-chip TPU hardware is not available in CI.

NOTE: under the axon TPU plugin the ``JAX_PLATFORMS`` env var alone is NOT
honoured — ``jax.config.update('jax_platforms', ...)`` must be called before
the backend initialises, which is why this happens here at conftest import
time (before any test imports jax-dependent code).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
