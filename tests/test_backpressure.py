# SPDX-License-Identifier: Apache-2.0
"""Dynamic-engine backpressure integration tests with real media
(parity: crates/engine/tests/backpressure.rs:21,196,235 — no deadlock under
bounded channels; live connect/remove under load)."""

import asyncio
import os

import numpy as np
import pytest

from streamkit_tpu.core import NodeRegistry
from streamkit_tpu.engine.dynamic import DynamicEngineConfig, start_dynamic_engine
from streamkit_tpu.nodes import register_nodes

SPEECH = "/root/reference/samples/audio/system/speech_2m.opus"


@pytest.fixture(scope="module")
def registry():
    reg = NodeRegistry()
    register_nodes(reg)
    return reg


@pytest.mark.skipif(not os.path.exists(SPEECH), reason="reference media not mounted")
def test_no_deadlock_with_tiny_capacities(registry, tmp_path):
    """Full transcode graph with tiny channel capacities drains without
    deadlock (reference backpressure.rs:21)."""
    out = str(tmp_path / "out.ogg")

    async def main():
        handle = start_dynamic_engine(
            registry,
            DynamicEngineConfig(
                session_id="bp", node_input_capacity=4, pin_distributor_capacity=2
            ),
        )
        await handle.add_node("reader", "core::file_reader", {"path": SPEECH, "chunk_size": 4096})
        await handle.add_node("demux", "containers::ogg::demuxer")
        await handle.add_node("dec", "audio::opus::decoder", {"channels": 1})
        await handle.add_node("enc", "audio::opus::encoder")
        await handle.add_node("mux", "containers::ogg::muxer")
        await handle.add_node("writer", "core::file_writer", {"path": out})
        for a, b in [("reader", "demux"), ("demux", "dec"), ("dec", "enc"), ("enc", "mux"), ("mux", "writer")]:
            await handle.connect(a, "out", b, "in")

        # drain ~the whole 2min file; poll for completion with a hard deadline
        for _ in range(1200):
            await asyncio.sleep(0.1)
            states = await handle.get_node_states()
            if states and all(s.kind.value == "stopped" for s in states.values()):
                break
        else:
            stats = await handle.get_node_stats()
            raise AssertionError(f"pipeline did not drain (deadlock?): {stats}")
        stats = await handle.get_node_stats()
        await handle.shutdown_and_wait()
        return stats

    stats = asyncio.run(main())
    assert stats["writer"].received > 50  # ogg pages made it through
    data = open(out, "rb").read()
    assert data[:4] == b"OggS"
    assert len(data) > 100_000  # ~2 minutes of re-encoded opus


@pytest.mark.skipif(not os.path.exists(SPEECH), reason="reference media not mounted")
def test_live_disconnect_reconnect_under_load(registry, tmp_path):
    """Disconnect and reconnect an edge while the stream is flowing
    (reference backpressure.rs:196,235 live-mutation shapes)."""

    async def main():
        handle = start_dynamic_engine(registry, DynamicEngineConfig(session_id="bp2"))
        await handle.add_node("reader", "core::file_reader", {"path": SPEECH, "chunk_size": 2048})
        await handle.add_node("demux", "containers::ogg::demuxer")
        await handle.add_node("pacer", "core::pacer", {"speed": 10.0})  # keep it streaming
        await handle.add_node("pass", "core::passthrough")
        await handle.add_node("sink", "core::sink")
        await handle.connect("reader", "out", "demux", "in")
        await handle.connect("demux", "out", "pacer", "in")
        await handle.connect("pacer", "out", "pass", "in")
        await handle.connect("pass", "out", "sink", "in")
        await asyncio.sleep(2.5)  # stream under way + stats flush (2s throttle)
        await handle.disconnect("pacer", "out", "pass", "in")
        await asyncio.sleep(0.2)
        stats_mid = await handle.get_node_stats()
        await handle.connect("pacer", "out", "pass", "in")
        await asyncio.sleep(2.5)  # resume + next stats flush
        stats_after = await handle.get_node_stats()
        await handle.shutdown_and_wait()
        return stats_mid, stats_after

    stats_mid, stats_after = asyncio.run(main())
    # traffic resumed after reconnect
    assert stats_after["pass"].received > stats_mid["pass"].received
