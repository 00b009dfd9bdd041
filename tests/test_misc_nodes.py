# SPDX-License-Identifier: Apache-2.0
"""Tests for telemetry tap/out, script node, pacers, text chunker (parity:
telemetry_tap.rs, telemetry_out.rs, script.rs, pacer.rs, text_chunker.rs)."""

import asyncio
import time

import numpy as np
import pytest

from streamkit_tpu.core import (
    AudioFormat,
    AudioFrame,
    Channel,
    ConfigurationError,
    CustomPacketData,
    NodeContext,
    OutputSender,
    Packet,
    PacketMetadata,
)
from streamkit_tpu.nodes.core_nodes.pacer import PacerNode
from streamkit_tpu.nodes.core_nodes.script import ScriptNode
from streamkit_tpu.nodes.core_nodes.telemetry_nodes import TelemetryOutNode, TelemetryTapNode
from streamkit_tpu.nodes.core_nodes.text import TextChunkerNode


def make_ctx(node, name="n", telemetry=True):
    """Mock NodeContext fixture (parity: crates/nodes/src/test_utils.rs)."""
    inputs = {p.name: Channel(64) for p in node.input_pins()}
    out_ch = Channel(256)
    tel_ch = Channel(256) if telemetry else None
    ctx = NodeContext(
        node_name=name,
        inputs=inputs,
        output=OutputSender(name, direct={p.name: out_ch for p in node.output_pins()} or {"out": out_ch}),
        telemetry_tx=tel_ch,
    )
    return ctx, inputs.get("in"), out_ch, tel_ch


async def drain(ch):
    out = []
    while True:
        item = await ch.recv_optional()
        if item is None:
            return out
        out.append(item)


def test_telemetry_tap_passthrough_and_events():
    node = TelemetryTapNode({"max_events_per_sec": 100000.0})
    ctx, in_ch, out_ch, tel_ch = make_ctx(node)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        frame = AudioFrame(np.full(480, 0.5, np.float32), AudioFormat(48000, 1))
        in_ch.try_send(Packet.new_audio(frame))
        in_ch.try_send(Packet.new_text("hello"))
        in_ch.close()
        await task
        ctx.output.close()
        return await drain(out_ch), tel_ch

    packets, tel_ch = asyncio.run(main())
    assert len(packets) == 2  # passthrough intact
    events = []
    while not tel_ch.is_empty:
        events.append(tel_ch.try_recv())
    assert len(events) == 2
    audio_ev = events[0].data
    assert audio_ev["sample_rate"] == 48000
    assert abs(audio_ev["rms"] - 0.5) < 1e-5


def test_telemetry_out_custom_payload():
    node = TelemetryOutNode({"max_events_per_sec": 1000.0})
    ctx, in_ch, out_ch, tel_ch = make_ctx(node)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        in_ch.try_send(Packet.new_custom(CustomPacketData("x/y@1", {"a": 1})))
        in_ch.close()
        await task

    asyncio.run(main())
    ev = tel_ch.try_recv()
    assert ev.data["type_id"] == "x/y@1"
    assert ev.data["data"] == {"a": 1}


# ------------------------------------------------------------------ script
def test_script_text_transform():
    node = ScriptNode(
        {
            "script": """
def process(packet):
    if packet.text is not None:
        return packet.text.upper()
    return packet
"""
        }
    )
    ctx, in_ch, out_ch, tel_ch = make_ctx(node)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        in_ch.try_send(Packet.new_text("hello world"))
        in_ch.close()
        await task
        ctx.output.close()
        return await drain(out_ch)

    (pkt,) = asyncio.run(main())
    assert pkt.text == "HELLO WORLD"


def test_script_drop_and_emit():
    node = ScriptNode(
        {
            "script": """
def process(packet):
    state['count'] = state.get('count', 0) + 1
    emit('script.seen', {'n': state['count']})
    if packet.text == 'drop-me':
        return None
    return packet
""",
            "max_events_per_sec": 100000.0,
        }
    )
    ctx, in_ch, out_ch, tel_ch = make_ctx(node)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        in_ch.try_send(Packet.new_text("keep"))
        in_ch.try_send(Packet.new_text("drop-me"))
        in_ch.close()
        await task
        ctx.output.close()
        return await drain(out_ch)

    packets = asyncio.run(main())
    assert [p.text for p in packets] == ["keep"]
    events = []
    while not tel_ch.is_empty:
        events.append(tel_ch.try_recv())
    assert [e.data["n"] for e in events if e.event_type == "script.seen"] == [1, 2]


def test_script_sandbox_rejects_dangerous_syntax():
    for bad in [
        "import os\ndef process(p): return p",
        "def process(p): return p.__class__",
        "def process(p): open('/etc/passwd')",
    ]:
        with pytest.raises((ConfigurationError, Exception)):
            node = ScriptNode({"script": bad})
            # 'open' parses fine but isn't in safe builtins — executing raises
            if "open" in bad:
                ctx, in_ch, out_ch, tel_ch = make_ctx(node)

                async def main():
                    task = asyncio.ensure_future(node.run(ctx))
                    in_ch.try_send(Packet.new_text("x"))
                    in_ch.close()
                    await task
                    assert tel_ch.try_recv().event_type == "script.error"
                    raise ConfigurationError("script error surfaced")

                asyncio.run(main())


def test_script_error_does_not_kill_node():
    node = ScriptNode({"script": "def process(p):\n    return 1 / 0\n"})
    ctx, in_ch, out_ch, tel_ch = make_ctx(node)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        in_ch.try_send(Packet.new_text("a"))
        in_ch.try_send(Packet.new_text("b"))
        in_ch.close()
        await task

    asyncio.run(main())
    errors = []
    while not tel_ch.is_empty:
        errors.append(tel_ch.try_recv())
    assert all(e.event_type == "script.error" for e in errors)
    assert len(errors) >= 1  # rate-limited but at least one surfaced


# ------------------------------------------------------------------ pacer
def test_pacer_timing_and_speed():
    node = PacerNode({"speed": 4.0})
    ctx, in_ch, out_ch, _ = make_ctx(node, telemetry=False)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        # 10 packets of 40ms each → at 4x speed ≈ 100ms total
        for i in range(10):
            in_ch.try_send(
                Packet.new_text("x").with_metadata(PacketMetadata(duration_us=40_000))
            )
        in_ch.close()
        t0 = time.monotonic()
        await task
        ctx.output.close()
        out = await drain(out_ch)
        return len(out), time.monotonic() - t0

    n, elapsed = asyncio.run(main())
    assert n == 10
    assert 0.05 < elapsed < 0.35  # ~0.1s ideal; generous CI bounds


# ------------------------------------------------------------------ chunker
def test_text_chunker_sentences():
    node = TextChunkerNode(None)
    ctx, in_ch, out_ch, _ = make_ctx(node, telemetry=False)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        in_ch.try_send(Packet.new_text("Hello there. How are"))
        in_ch.try_send(Packet.new_text(" you today? I am fi"))
        in_ch.try_send(Packet.new_text("ne"))
        in_ch.close()
        await task
        ctx.output.close()
        return await drain(out_ch)

    packets = asyncio.run(main())
    texts = [p.text for p in packets]
    assert texts == ["Hello there.", "How are you today?", "I am fine"]


# ------------------------------------------------------------------ clocked mixer
def test_clocked_mixer_ticks_and_silence():
    """Clocked mode emits on a steady cadence, fills silence when inputs
    starve, and mixes when frames arrive (reference mixer.rs clocked mode)."""
    from streamkit_tpu.nodes.audio.filters import MixerNode

    node = MixerNode(
        {
            "clocked": True,
            "sample_rate": 48000,
            "frame_samples_per_channel": 480,  # 10ms ticks
            "jitter_buffer_frames": 3,
            "num_inputs": 1,
        }
    )
    ctx, in_ch, out_ch, _ = make_ctx(node, telemetry=False)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        fmt = AudioFormat(48000, 1)
        # feed 5 frames, then starve for a while, then close
        for i in range(5):
            in_ch.try_send(Packet.new_audio(AudioFrame(np.full(480, 0.25, np.float32), fmt)))
        await asyncio.sleep(0.5)  # generous: first mix pays jit compile
        in_ch.close()
        await asyncio.wait_for(task, timeout=5)
        ctx.output.close()
        return await drain(out_ch)

    packets = asyncio.run(main())
    assert len(packets) >= 8  # ~50 ticks in 500ms at 10ms cadence
    peaks = [float(np.abs(p.audio.samples).max()) for p in packets]
    assert any(abs(p - 0.25) < 1e-5 for p in peaks)  # real frames mixed
    assert any(p == 0.0 for p in peaks)  # silence ticks while starved
    # steady sequence numbering
    seqs = [p.metadata.sequence for p in packets]
    assert seqs == sorted(seqs)


def test_clocked_mixer_jitter_overflow_drops_oldest():
    from streamkit_tpu.nodes.audio.filters import MixerNode

    node = MixerNode(
        {
            "clocked": True,
            "frame_samples_per_channel": 480,
            "jitter_buffer_frames": 2,
            "generate_silence": False,
            "num_inputs": 1,
        }
    )
    ctx, in_ch, out_ch, _ = make_ctx(node, telemetry=False)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        fmt = AudioFormat(48000, 1)
        # burst 10 frames with increasing amplitude: ring keeps only newest 2
        # of whatever is pending at each tick
        for i in range(10):
            in_ch.try_send(
                Packet.new_audio(AudioFrame(np.full(480, (i + 1) / 10, np.float32), fmt))
            )
        await asyncio.sleep(0.05)
        in_ch.close()
        await asyncio.wait_for(task, timeout=5)
        ctx.output.close()
        return await drain(out_ch)

    packets = asyncio.run(main())
    peaks = [round(float(np.abs(p.audio.samples).max()), 2) for p in packets]
    assert len(peaks) <= 6  # burst of 10 collapsed by overwrite-oldest
    assert peaks[-1] == 1.0  # newest survived


def test_script_infinite_loop_aborted():
    """A runaway script hits the tracing deadline instead of freezing the
    event loop (review finding: timeout was post-hoc only)."""
    node = ScriptNode({"script": "def process(p):\n    while True:\n        pass\n", "timeout_ms": 100})
    ctx, in_ch, out_ch, tel_ch = make_ctx(node)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        in_ch.try_send(Packet.new_text("x"))
        in_ch.close()
        await asyncio.wait_for(task, timeout=10)

    asyncio.run(main())
    events = []
    while not tel_ch.is_empty:
        events.append(tel_ch.try_recv())
    assert any(e.event_type == "script.timeout" for e in events)


def test_script_sandbox_escape_vectors_rejected():
    """Frame/generator introspection escapes must be rejected at parse time."""
    vectors = [
        # generator expressions expose gi_frame/send
        "def process(p):\n    g = (x for x in [1])\n    return p",
        # frame-walk attributes
        "def process(p):\n    return p.gi_frame",
        "def process(p):\n    return p.f_back",
        "def process(p):\n    return p.f_globals",
        "def process(p):\n    return p.send",
        "def process(p):\n    return p.throw",
        # str.format can traverse attributes ("{0.__class__}")
        "def process(p):\n    return '{0.__class__}'.format(p)",
        "def process(p):\n    return ''.format_map({})",
    ]
    for bad in vectors:
        with pytest.raises(ConfigurationError):
            ScriptNode({"script": bad})


def test_script_source_limits():
    # 256 KiB size cap
    big = "def process(p):\n    return p\n" + "# " + "x" * (256 * 1024)
    with pytest.raises(ConfigurationError, match="256 KiB"):
        ScriptNode({"script": big})
    # bracket-nesting depth cap (parser stack exhaustion guard)
    nested = "def process(p):\n    return " + "(" * 200 + "1" + ")" * 200
    with pytest.raises(ConfigurationError, match="nesting"):
        ScriptNode({"script": nested})


def test_script_allowed_attrs_still_work():
    node = ScriptNode(
        {
            "script": (
                "def process(p):\n"
                "    parts = p.text.split(',')\n"
                "    out = []\n"
                "    for s in parts:\n"
                "        out.append(s.strip().upper())\n"
                "    return ' '.join(sorted(out))\n"
            )
        }
    )
    ctx, in_ch, out_ch, tel_ch = make_ctx(node)

    async def main():
        task = asyncio.ensure_future(node.run(ctx))
        in_ch.try_send(Packet.new_text(" b, a ,c"))
        in_ch.close()
        await task
        ctx.output.close()
        return await drain(out_ch)

    packets = asyncio.run(main())
    assert packets[0].text == "A B C"
