# SPDX-License-Identifier: Apache-2.0
"""Oneshot engine end-to-end tests (parity: engine/src/oneshot.rs +
graph_builder.rs + apps/skit end_to_end_test.rs double-volume round trip)."""

import asyncio
import io
import struct
import wave

import numpy as np
import pytest

from streamkit_tpu.api import compile_yaml
from streamkit_tpu.core import NodeRegistry, ValidationFailure
from streamkit_tpu.engine import run_oneshot_pipeline
from streamkit_tpu.nodes import register_nodes


@pytest.fixture(scope="module")
def registry():
    reg = NodeRegistry()
    register_nodes(reg)
    return reg


def make_wav(samples: np.ndarray, rate=48000, channels=1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(samples * 32768.0, -32768, 32767).astype("<i2")).tobytes())
    return buf.getvalue()


def parse_streamed_wav(data: bytes) -> tuple:
    """Parse our streaming WAV (0xFFFFFFFF sizes)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert data[12:16] == b"fmt "
    code, ch, rate = struct.unpack("<HHI", data[20:28])
    bits = struct.unpack("<H", data[34:36])[0]
    assert data[36:40] == b"data"
    pcm = data[44:]
    samples = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    return samples, rate, ch


async def run_pipeline_bytes(registry, yaml_text, body: bytes) -> tuple:
    pipeline = compile_yaml(yaml_text)

    async def stream():
        for i in range(0, len(body), 4096):
            yield body[i : i + 4096]

    result = await run_oneshot_pipeline(registry, pipeline, input_stream=stream())
    data = await result.read_all()
    return data, result.content_type


DOUBLE_VOLUME_YAML = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: containers::wav::demuxer
  - kind: audio::gain
    params: {gain: 2.0}
  - kind: containers::wav::muxer
  - kind: streamkit::http_output
"""


def test_double_volume_roundtrip(registry):
    """The reference server's flagship integration test, WAV edition."""
    x = (np.sin(2 * np.pi * 440 * np.arange(48000) / 48000) * 0.25).astype(np.float32)
    wav = make_wav(x)

    data, ctype = asyncio.run(run_pipeline_bytes(registry, DOUBLE_VOLUME_YAML, wav))
    assert ctype == "audio/wav"
    y, rate, ch = parse_streamed_wav(data)
    assert rate == 48000 and ch == 1
    assert len(y) == len(x)
    # doubled volume (within s16 quantization)
    np.testing.assert_allclose(y, np.clip(x * 2.0, -1, 1), atol=2e-4)


RESAMPLE_YAML = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: containers::wav::demuxer
  - kind: audio::resampler
    params: {target_sample_rate: 16000, chunk_frames: 960, output_frame_size: 960}
  - kind: containers::wav::muxer
  - kind: streamkit::http_output
"""


def test_resample_pipeline_48k_to_16k(registry):
    x = (np.sin(2 * np.pi * 440 * np.arange(96000) / 48000) * 0.5).astype(np.float32)
    wav = make_wav(x, rate=48000)
    data, _ = asyncio.run(run_pipeline_bytes(registry, RESAMPLE_YAML, wav))
    y, rate, ch = parse_streamed_wav(data)
    assert rate == 16000
    # 2 s → ~32000 samples, padded to a full 960 frame
    assert abs(len(y) - 32000) <= 960
    # default compat=rubato: output k sits at source position 3k-1 (the
    # accumulator starts at -PLM/2 and increments before the emit), i.e. a
    # fixed 1-input-sample lead vs the naive k*3 grid
    n = min(len(y), 31900)
    pos = (np.arange(n) * 3 - 1) / 48000.0
    ideal = np.sin(2 * np.pi * 440 * pos) * 0.5
    assert np.abs(y[100:n] - ideal[100:n]).max() < 0.02


MIX_YAML = """
mode: oneshot
nodes:
  http_input: {kind: streamkit::http_input}
  demux: {kind: "containers::wav::demuxer", needs: http_input}
  gain_a: {kind: "audio::gain", params: {gain: 0.5}, needs: demux}
  mixer:
    kind: audio::mixer
    needs: [gain_a]
  mux: {kind: "containers::wav::muxer", needs: mixer}
  http_output: {kind: streamkit::http_output, needs: mux}
"""


def test_dag_pipeline_with_mixer(registry):
    x = (np.ones(9600) * 0.5).astype(np.float32)
    data, _ = asyncio.run(run_pipeline_bytes(registry, MIX_YAML, make_wav(x)))
    y, rate, ch = parse_streamed_wav(data)
    np.testing.assert_allclose(y[:9600], 0.25, atol=1e-3)


FANOUT_YAML = """
mode: oneshot
nodes:
  http_input: {kind: streamkit::http_input}
  demux: {kind: "containers::wav::demuxer", needs: http_input}
  gain_a: {kind: "audio::gain", params: {gain: 0.5}, needs: demux}
  gain_b: {kind: "audio::gain", params: {gain: 2.0}, needs: demux}
  mixer:
    kind: audio::mixer
    needs: [gain_a, gain_b]
  mux: {kind: "containers::wav::muxer", needs: mixer}
  http_output: {kind: streamkit::http_output, needs: mux}
"""


def test_fanout_dag_pipeline(registry):
    """Oneshot fan-out (one demux output feeding two gain branches) then
    fan-in through the mixer. EXCEEDS the reference: its oneshot engine
    fails fast on fan-out (graph_builder.rs:71-85)."""
    x = (np.ones(9600) * 0.2).astype(np.float32)
    data, _ = asyncio.run(run_pipeline_bytes(registry, FANOUT_YAML, make_wav(x)))
    y, rate, ch = parse_streamed_wav(data)
    assert rate == 48000 and ch == 1
    # mixer sums the branches: 0.2*0.5 + 0.2*2.0 = 0.5
    np.testing.assert_allclose(y[:9600], 0.5, atol=1e-3)


def test_fanout_branch_isolation(registry):
    """Each fan-out branch gets its own packet (COW clone): a gain node
    mutating samples in place must not corrupt the sibling branch."""
    x = (np.ones(4800) * 0.25).astype(np.float32)
    yaml_text = """
mode: oneshot
nodes:
  http_input: {kind: streamkit::http_input}
  demux: {kind: "containers::wav::demuxer", needs: http_input}
  loud: {kind: "audio::gain", params: {gain: 3.0}, needs: demux}
  quiet: {kind: "audio::gain", params: {gain: 1.0}, needs: demux}
  mixer: {kind: audio::mixer, needs: [loud, quiet]}
  mux: {kind: "containers::wav::muxer", needs: mixer}
  http_output: {kind: streamkit::http_output, needs: mux}
"""
    data, _ = asyncio.run(run_pipeline_bytes(registry, yaml_text, make_wav(x)))
    y, _, _ = parse_streamed_wav(data)
    # 0.25*3 + 0.25*1 = 1.0 exactly iff the quiet branch saw unmutated
    # samples; a shared-buffer bug would give 0.25*3*2 = 1.5 (clipped)
    np.testing.assert_allclose(y[:4800], 1.0, atol=1e-3)


class NodeRegistryFixture(NodeRegistry):
    def __init__(self):
        super().__init__()
        register_nodes(self)


def test_type_mismatch_rejected(registry):
    yaml_text = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: audio::gain
  - kind: streamkit::http_output
"""
    pipeline = compile_yaml(yaml_text)
    with pytest.raises(ValidationFailure, match="type mismatch"):
        asyncio.run(run_oneshot_pipeline(registry, pipeline))


def test_missing_http_output_rejected(registry):
    pipeline = compile_yaml("mode: oneshot\nsteps:\n  - kind: streamkit::http_input\n")
    with pytest.raises(ValidationFailure, match="http_output"):
        asyncio.run(run_oneshot_pipeline(registry, pipeline))


def test_json_serialize_pipeline(registry):
    yaml_text = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: containers::wav::demuxer
  - kind: plugin::native::vad
    params: {threshold: 0.5}
  - kind: core::json_serialize
    params: {newline_delimited: true}
  - kind: streamkit::http_output
    params: {content_type: application/json}
"""
    import json

    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    sr = 16000
    speech, _ = synth_speech_with_plan(
        1.0, sr, seed=9, pause_range=(0.01, 0.02), utt_range=(0.95, 1.0), lead_silence_s=0.0
    )
    speech = speech[:sr]
    silence = np.zeros(sr, dtype=np.float32)
    x = np.concatenate([silence, speech, silence])
    wav = make_wav(x, rate=16000)
    data, ctype = asyncio.run(run_pipeline_bytes(registry, yaml_text, wav))
    assert ctype == "application/json"
    lines = [json.loads(line) for line in data.decode().strip().splitlines()]
    assert len(lines) >= 1
    seg = lines[0]["Custom"]
    assert seg["type_id"] == "plugin::native::vad/vad-event@1"
    assert seg["data"]["event"] == "segment"
    # the speech segment should start near t=1s
    assert 500 <= seg["data"]["start_ms"] <= 1500


def test_file_reader_source(registry, tmp_path):
    x = (np.ones(4800) * 0.25).astype(np.float32)
    p = tmp_path / "in.wav"
    p.write_bytes(make_wav(x))
    yaml_text = f"""
mode: oneshot
nodes:
  reader:
    kind: core::file_reader
    params: {{path: "{p}"}}
  demux: {{kind: "containers::wav::demuxer", needs: reader}}
  mux: {{kind: "containers::wav::muxer", needs: demux}}
  http_output: {{kind: streamkit::http_output, needs: mux}}
"""
    pipeline = compile_yaml(yaml_text)

    async def main():
        result = await run_oneshot_pipeline(registry, pipeline)
        return await result.read_all()

    data = asyncio.run(main())
    y, rate, _ = parse_streamed_wav(data)
    np.testing.assert_allclose(y[:4800], 0.25, atol=1e-3)
