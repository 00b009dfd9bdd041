# SPDX-License-Identifier: Apache-2.0
"""Test configuration: run the whole suite clusterless on a virtual 8-device
CPU mesh (mirrors how the reference suite runs model-free on any box).

IMPORTANT (axon environment): ``/root/.axon_site/sitecustomize.py`` imports
jax and registers the real-TPU axon backend at interpreter startup, and the
environment pins ``JAX_PLATFORMS=axon`` — so mutating ``os.environ`` here is
too late. The backend *client* is created lazily though, so
``jax.config.update`` still wins if no computation has run yet. Without this,
tests silently compile over the TPU tunnel (20-40 s per shape) and concurrent
test processes hang each other on the single tunnel.
"""

import os

# XLA_FLAGS is read when the CPU client is instantiated (lazily) — still in time.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize; harmless)

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend; axon TPU leaked through "
        f"(got {jax.default_backend()})"
    )
    assert jax.device_count() == 8, "expected 8 virtual CPU devices for mesh tests"
    yield


@pytest.fixture
def anyio_backend():
    return "asyncio"


@pytest.fixture(scope="module", autouse=True)
def _fresh_process_tables():
    """Reset the process-wide serving state between test MODULES.

    The stream tables and audio ring are deliberately process-wide in
    production (one table per model, shared by every session). Across the
    test suite that sharing leaks state: a module that sizes the table
    small (engine capacity) or reshards it onto a mesh changes what a later
    module's engine gets back from ``get_stream_table`` — the first creator
    wins. Fresh tables per module keep each module's sizing/sharding local
    and cap suite-wide HBM/RAM growth from leaked slots."""
    yield
    from streamkit_tpu.models.whisper import streaming
    from streamkit_tpu.nodes.ml import whisper_node

    with streaming._TABLES_LOCK:
        streaming._TABLES.clear()
    whisper_node._AUDIO_RING = None
