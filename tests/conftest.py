"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware, per SURVEY.md §4) with x64 enabled so fp64 parity
paths work. Environment must be set before the first jax import.
"""
import os

# Force CPU (the environment may pin JAX_PLATFORMS to a TPU plugin, and
# sitecustomize may have imported jax already, so set both the env var and
# the live config). Set RELUQP_TEST_PLATFORM to override (e.g. to run the
# suite on real TPU).
_platform = os.environ.get("RELUQP_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def canonical():
    from reluqp_tpu.utils.problems import canonical_qp
    return canonical_qp()


@pytest.fixture(autouse=True)
def _seeded():
    np.random.seed(0)
