"""Test configuration.

Default run: a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware, per SURVEY.md §4) with x64 enabled so fp64 parity
paths work. Environment must be set before the first jax import.

Real-hardware run: ``RELUQP_TEST_PLATFORM=axon`` (the tunneled-TPU PJRT
platform of this environment; ``tpu`` on a machine with native TPUs)
switches the session onto the chip and restricts collection to the
``tpu_smoke`` marker — the hardware acceptance subset that exercises the
assertion-rich solver paths (both backends, warm start, update, batching,
the whole-solve kernel) through the real Mosaic compiler, which interpret
mode never reaches. One-liner for this environment:

    RELUQP_TEST_PLATFORM=axon PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/ -q

The rest of the suite is skipped on hardware because it needs what one
remote chip cannot give: 8 local devices (sharding/TP/multiprocess) or
fp64 linalg on device (the axon TPU backend cannot compile fp64 — the
fp64 regime is validated on CPU by design, docs/perf_notes.md).
"""
import os

# Force CPU by default (the environment may pin JAX_PLATFORMS to a TPU
# plugin, and sitecustomize may have imported jax already, so set both
# the env var and the live config). RELUQP_TEST_PLATFORM overrides.
_platform = os.environ.get("RELUQP_TEST_PLATFORM", "cpu")
ON_HARDWARE = _platform != "cpu"
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if not ON_HARDWARE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
if not ON_HARDWARE:
    jax.config.update("jax_num_cpu_devices", 8)
# x64 stays on even on hardware: fp64 math runs on host numpy, and the
# Pallas kernels are x64-proof (test_x64_kernels.py regression).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu_smoke: hardware acceptance subset — the only tests collected "
        "when RELUQP_TEST_PLATFORM selects a real accelerator")


def pytest_collection_modifyitems(config, items):
    if not ON_HARDWARE:
        return
    skip = pytest.mark.skip(
        reason=f"only the tpu_smoke subset runs on RELUQP_TEST_PLATFORM="
               f"{_platform} (needs 8 CPU devices or fp64-on-device)")
    for item in items:
        if "tpu_smoke" not in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def canonical():
    from reluqp_tpu.utils.problems import canonical_qp
    return canonical_qp()


@pytest.fixture(autouse=True)
def _seeded():
    np.random.seed(0)
