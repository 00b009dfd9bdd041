# SPDX-License-Identifier: Apache-2.0
"""JavaScript script-node tests: the reference's QuickJS dialect running on
the mjs engine (utils/mjs.py) behind core::script — packet marshalling per
script.rs:453-693, telemetry span API, fetch bridge, and the reference's
shipped script YAML executing UNMODIFIED."""

import asyncio
import os

import pytest

from streamkit_tpu.core import (
    Channel,
    ConfigurationError,
    NodeContext,
    OutputSender,
    Packet,
    TranscriptionData,
    TranscriptionSegment,
)
from streamkit_tpu.nodes.core_nodes.script import ScriptNode


async def _drive(node, packets):
    in_ch = Channel(32)
    out_ch = Channel(256)
    tel_ch = Channel(256)
    ctx = NodeContext(
        node_name="js",
        inputs={"in": in_ch},
        output=OutputSender("js", direct={"out": out_ch}),
        telemetry_tx=tel_ch,
    )
    task = asyncio.ensure_future(node.run(ctx))
    for p in packets:
        await in_ch.send(p)
    in_ch.close()
    await task
    ctx.output.close()
    out = []
    while True:
        pkt = await out_ch.recv_optional()
        if pkt is None:
            break
        out.append(pkt)
    tel = []
    while tel_ch.qsize() > 0:
        tel.append(tel_ch.try_recv())
    return out, tel


def test_js_autodetected_and_text_transform():
    node = ScriptNode(
        {
            "script": """
            function process(packet) {
              if (packet.type !== 'Text') return packet;
              return { type: 'Text', data: packet.data.toUpperCase() + '!' };
            }
            """,
            "timeout_ms": 2000,
        }
    )
    assert node.language == "javascript"
    out, _ = asyncio.run(_drive(node, [Packet.new_text("hello")]))
    assert len(out) == 1 and out[0].text == "HELLO!"


def test_js_transcription_shape_and_drop():
    """Transcription packets arrive as {type, data:{text, segments[]}}
    (script.rs:499-553); returning null drops."""
    node = ScriptNode(
        {
            "language": "javascript",
            "script": """
            function process(packet) {
              if (packet.type !== 'Transcription') return null;
              const seg = packet.data.segments[0];
              return {
                type: 'Text',
                data: `${packet.data.text} [${seg.start_time_ms}-${seg.end_time_ms}]`,
              };
            }
            """,
            "timeout_ms": 2000,
        }
    )
    tr = Packet.new_transcription(
        TranscriptionData(
            text="hi there",
            segments=(TranscriptionSegment("hi there", 100, 900),),
            language="en",
            is_final=True,
        )
    )
    out, _ = asyncio.run(_drive(node, [Packet.new_text("dropme"), tr]))
    assert len(out) == 1
    assert out[0].text == "hi there [100-900]"


def test_js_state_persists_across_packets():
    node = ScriptNode(
        {
            "language": "javascript",
            "script": """
            let count = 0;
            function process(packet) {
              count++;
              return { type: 'Text', data: 'n=' + count };
            }
            """,
            "timeout_ms": 2000,
        }
    )
    out, _ = asyncio.run(
        _drive(node, [Packet.new_text("a"), Packet.new_text("b"), Packet.new_text("c")])
    )
    assert [p.text for p in out] == ["n=1", "n=2", "n=3"]


def test_js_telemetry_spans():
    node = ScriptNode(
        {
            "language": "javascript",
            "script": """
            function process(packet) {
              const sid = telemetry.startSpan('llm.request', { model: 'x' });
              telemetry.emit('custom.event', { k: 1 });
              telemetry.endSpan(sid, { status: 'ok' });
              return packet;
            }
            """,
            "timeout_ms": 2000,
        }
    )
    out, tel = asyncio.run(_drive(node, [Packet.new_text("x")]))
    events = [t.event_type for t in tel]
    assert "custom.event" in events
    assert "llm.request" in events
    span = next(t.data for t in tel if t.event_type == "llm.request")
    assert "duration_ms" in span and span["status"] == "ok"


def test_js_error_does_not_kill_node():
    node = ScriptNode(
        {
            "language": "javascript",
            "script": """
            function process(packet) {
              if (packet.data === 'boom') throw new Error('kaput');
              return packet;
            }
            """,
            "timeout_ms": 2000,
        }
    )
    out, tel = asyncio.run(
        _drive(node, [Packet.new_text("ok1"), Packet.new_text("boom"), Packet.new_text("ok2")])
    )
    assert [p.text for p in out] == ["ok1", "ok2"]


def test_js_syntax_error_is_config_error():
    with pytest.raises(ConfigurationError, match="javascript syntax"):
        ScriptNode({"language": "javascript", "script": "function process( {"})


def test_js_timeout_passes_packet_through():
    node = ScriptNode(
        {
            "language": "javascript",
            "script": "function process(p) { while (true) {} }",
            "timeout_ms": 100,
        }
    )
    out, tel = asyncio.run(_drive(node, [Packet.new_text("x")]))
    assert len(out) == 1 and out[0].text == "x"  # reference passthrough on timeout


REF_YAML = "/root/reference/samples/pipelines/oneshot/useless-facts-tts.yml"
REF_JS = "/root/reference/samples/pipelines/dynamic/voice-weather-open-meteo.js"


@pytest.mark.skipif(not os.path.exists(REF_JS), reason="reference samples unavailable")
def test_reference_weather_script_runs_unmodified_via_script_path():
    """The reference's 534-line QuickJS script loads via script_path and
    processes a Transcription packet end-to-end (fetch allowlist empty →
    the script's own error handling produces the fallback reply)."""
    node = ScriptNode({"script_path": REF_JS, "timeout_ms": 10_000})
    assert node.language == "javascript"
    tr = Packet.new_transcription(
        TranscriptionData(
            text="what is the weather in berlin",
            segments=(TranscriptionSegment("what is the weather in berlin", 0, 2000),),
            language="en",
            is_final=True,
        )
    )
    out, _ = asyncio.run(_drive(node, [tr]))
    assert len(out) == 1
    assert out[0].text  # a spoken fallback/error reply — non-empty Text
    assert out[0].text.strip() != ""


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference samples unavailable")
def test_reference_useless_facts_yaml_script_compiles():
    """The oneshot sample's inline JS (fetch + JSON.parse + fallback)
    compiles and runs through the YAML compiler's node params unmodified
    (fetch blocked by the default-empty allowlist → catch path)."""
    import yaml as _yaml

    doc = _yaml.safe_load(open(REF_YAML))
    script = next(
        s["params"]["script"] for s in doc["steps"] if s["kind"] == "core::script"
    )
    node = ScriptNode({"script": script, "timeout_ms": 8000})
    assert node.language == "javascript"
    out, _ = asyncio.run(_drive(node, [Packet.new_text("go")]))
    assert len(out) == 1
    assert "fact" in out[0].text.lower() or out[0].text
