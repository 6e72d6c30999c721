"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host CPU via
``xla_force_host_platform_device_count`` (the driver separately dry-runs
``__graft_entry__.dryrun_multichip``); numerical tests use f64 on CPU.

Note: this environment's sitecustomize registers a remote TPU ("axon") PJRT
backend at interpreter start, so env vars alone don't select CPU — we must
override through jax.config before the backend is first initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end sequence replays")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
