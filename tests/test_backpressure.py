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

# our own synthesized long-speech fixture (tools/make_fixtures.py --long)
SPEECH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "samples", "media", "speech_10m.ogg",
)


@pytest.fixture(scope="module")
def registry():
    reg = NodeRegistry()
    register_nodes(reg)
    return reg


@pytest.mark.skipif(not os.path.exists(SPEECH), reason="run tools/make_fixtures.py --long")
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
    assert len(data) > 400_000  # ~10 minutes of re-encoded opus


@pytest.mark.skipif(not os.path.exists(SPEECH), reason="run tools/make_fixtures.py --long")
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


@pytest.mark.skipif(not os.path.exists(SPEECH), reason="run tools/make_fixtures.py --long")
def test_node_removal_under_backpressure(registry):
    """Remove a mid-pipeline node while the stream is flowing; the engine
    stays responsive and the rest of the graph keeps running (reference
    backpressure.rs:235)."""

    async def main():
        handle = start_dynamic_engine(
            registry,
            DynamicEngineConfig(session_id="bp3", node_input_capacity=4),
        )
        await handle.add_node("reader", "core::file_reader", {"path": SPEECH, "chunk_size": 2048})
        await handle.add_node("demux", "containers::ogg::demuxer")
        await handle.add_node("gain_path", "core::passthrough")
        await handle.add_node("sink", "core::sink")
        await handle.connect("reader", "out", "demux", "in")
        await handle.connect("demux", "out", "gain_path", "in")
        await handle.connect("gain_path", "out", "sink", "in")
        await asyncio.sleep(1.0)  # under way (full-speed, channels saturated)
        await handle.remove_node("gain_path")
        # engine must still answer control queries promptly post-removal
        t0 = asyncio.get_running_loop().time()
        pipeline = await handle.get_pipeline()
        assert asyncio.get_running_loop().time() - t0 < 2.0
        assert "gain_path" not in pipeline["nodes"]
        # rewire around the removed node: traffic resumes
        await handle.connect("demux", "out", "sink", "in")
        await asyncio.sleep(2.5)
        stats = await handle.get_node_stats()
        await handle.shutdown_and_wait()
        return stats

    stats = asyncio.run(main())
    assert stats["sink"].received > 0


@pytest.mark.skipif(not os.path.exists(SPEECH), reason="run tools/make_fixtures.py --long")
def test_dynamic_connection_into_mixer_under_load(registry):
    """Connect a second source branch into a running mixer (reference
    backpressure.rs:196 dynamic-connection-under-backpressure)."""

    async def main():
        handle = start_dynamic_engine(registry, DynamicEngineConfig(session_id="bp4"))
        await handle.add_node("reader", "core::file_reader", {"path": SPEECH, "chunk_size": 2048})
        await handle.add_node("demux", "containers::ogg::demuxer")
        await handle.add_node("dec", "audio::opus::decoder", {"channels": 1})
        await handle.add_node("mixer", "audio::mixer", {"num_inputs": 2})
        await handle.add_node("sink", "core::sink")
        await handle.connect("reader", "out", "demux", "in")
        await handle.connect("demux", "out", "dec", "in")
        await handle.connect("dec", "out", "mixer", "in_0")
        await handle.connect("mixer", "out", "sink", "in")
        await asyncio.sleep(1.5)
        # live-add the second branch while the first is flowing
        music = SPEECH.replace("speech_10m.ogg", "music_30s.ogg")
        await handle.add_node("reader2", "core::file_reader", {"path": music, "chunk_size": 2048})
        await handle.add_node("demux2", "containers::ogg::demuxer")
        await handle.add_node("dec2", "audio::opus::decoder", {"channels": 1})
        await handle.connect("reader2", "out", "demux2", "in")
        await handle.connect("demux2", "out", "dec2", "in")
        await handle.connect("dec2", "out", "mixer", "in_1")
        await asyncio.sleep(3.0)
        stats = await handle.get_node_stats()
        await handle.shutdown_and_wait()
        return stats

    stats = asyncio.run(main())
    assert stats["dec2"].sent > 0, "second branch never flowed"
    assert stats["mixer"].sent > 0
