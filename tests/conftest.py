"""Test harness: run everything on a virtual 8-device CPU mesh.

The ambient environment force-registers the remote-TPU (axon) PJRT plugin in
every interpreter and pins jax to it — env vars alone cannot override it, so
we must ALSO flip the config after importing jax. Tests never touch the real
chip (set LOG_TPU_TEST_PLATFORM to override).
"""
import os

_platform = os.environ.get("LOG_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
