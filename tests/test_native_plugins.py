# SPDX-License-Identifier: Apache-2.0
"""Native C++ plugin host tests: build the example gain plugin with g++,
dlopen it, run it inside a real pipeline (parity: plugin-native/src/lib.rs
load + wrapper.rs FFI processing + plugin_integration_test.rs)."""

import asyncio
import io
import shutil
import struct
import subprocess
import wave

import numpy as np
import pytest

from streamkit_tpu.api import compile_yaml
from streamkit_tpu.core import NodeRegistry, PluginError
from streamkit_tpu.engine import run_oneshot_pipeline
from streamkit_tpu.nodes import register_nodes
from streamkit_tpu.plugins.native import load_native_plugin

NATIVE_DIR = "/root/repo/native"
SO_PATH = f"{NATIVE_DIR}/build/gain_cpp.so"


@pytest.fixture(scope="module")
def plugin_so():
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)
    return SO_PATH


@pytest.fixture(scope="module")
def registry(plugin_so):
    reg = NodeRegistry()
    register_nodes(reg)
    load_native_plugin(reg, plugin_so)
    return reg


def test_load_and_metadata(plugin_so):
    reg = NodeRegistry()
    plugin = load_native_plugin(reg, plugin_so)
    assert plugin.kind == "plugin::native::gain_cpp"
    assert reg.contains("plugin::native::gain_cpp")


def test_missing_library_raises():
    with pytest.raises(PluginError, match="not found"):
        load_native_plugin(NodeRegistry(), "/nonexistent/lib.so")


def test_native_gain_in_pipeline(registry):
    """WAV → native C++ gain ×2 → WAV, through the oneshot engine."""
    x = (np.ones(9600) * 0.25).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes((x * 32767).astype("<i2").tobytes())

    yaml_text = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: containers::wav::demuxer
  - kind: plugin::native::gain_cpp
    params: {gain: 2.0}
  - kind: containers::wav::muxer
  - kind: streamkit::http_output
"""
    pipeline = compile_yaml(yaml_text)

    async def main():
        async def stream():
            yield buf.getvalue()

        res = await run_oneshot_pipeline(registry, pipeline, input_stream=stream())
        return await res.read_all()

    data = asyncio.run(main())
    y = np.frombuffer(data[44:], dtype="<i2").astype(np.float32) / 32768.0
    np.testing.assert_allclose(y[:9600], 0.5, atol=2e-3)


def test_native_plugin_rejects_bad_params(plugin_so):
    reg = NodeRegistry()
    plugin = load_native_plugin(reg, plugin_so)
    node = reg.create_node("plugin::native::gain_cpp", {"gain": 9.0})
    # creation happens lazily in run(); the C create() rejects gain 9
    from streamkit_tpu.core import Channel, NodeContext, OutputSender

    async def main():
        ctx = NodeContext(
            node_name="g",
            inputs={"in": Channel(4)},
            output=OutputSender("g", direct={"out": Channel(4)}),
        )
        with pytest.raises(PluginError, match="gain must be in"):
            await node.run(ctx)

    asyncio.run(main())
