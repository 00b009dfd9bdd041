# SPDX-License-Identifier: Apache-2.0
"""Test configuration: run the whole suite clusterless on a virtual 8-device
CPU mesh (mirrors how the reference suite runs model-free on any box)."""

import os

# Must be set before jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture
def anyio_backend():
    return "asyncio"
