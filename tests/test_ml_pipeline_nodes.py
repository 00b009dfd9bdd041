# SPDX-License-Identifier: Apache-2.0
"""TTS + translation node pipeline tests (parity: kokoro-tts.yml and
speech_to_text_translate.yml pipeline shapes, offline random weights)."""

import asyncio
import struct

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from streamkit_tpu.api import compile_yaml
from streamkit_tpu.core import NodeRegistry, ResourceManager
from streamkit_tpu.engine import run_oneshot_pipeline
from streamkit_tpu.nodes import register_nodes


@pytest.fixture(scope="module")
def registry():
    reg = NodeRegistry()
    register_nodes(reg)
    return reg


def run_text_pipeline(registry, yaml_text, body: bytes):
    pipeline = compile_yaml(yaml_text)

    async def main():
        async def stream():
            yield body

        res = await run_oneshot_pipeline(
            registry, pipeline, input_stream=stream(), resources=ResourceManager()
        )
        data = await res.read_all()
        return data, res.content_type

    return asyncio.run(main())


TTS_YAML = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: core::script
    params:
      script: |
        def process(packet):
          return packet
  - kind: plugin::native::kokoro
    params: {sample_rate: 24000}
  - kind: containers::wav::muxer
  - kind: streamkit::http_output
"""


def test_tts_pipeline_text_to_wav(registry):
    """kokoro-tts.yml shape: text in → synthesized WAV out."""
    # http_input produces Binary; script passes through; tts accepts text —
    # use a text-producing front instead: feed text via script conversion
    yaml_text = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: core::text_chunker
    params: {min_length: 10}
  - kind: plugin::native::kokoro
    params: {sample_rate: 24000}
  - kind: containers::wav::muxer
  - kind: streamkit::http_output
"""
    data, ctype = run_text_pipeline(registry, yaml_text, b"Hello world. This is a test.")
    assert ctype == "audio/wav"
    code, ch, rate = struct.unpack("<HHI", data[20:28])
    assert rate == 24000 and ch == 1
    y = np.frombuffer(data[44:], dtype="<i2")
    assert len(y) > 24000 // 10  # at least 100ms of audio synthesized
    assert np.abs(y.astype(np.float32) / 32768).max() <= 1.0


def test_translate_pipeline(registry):
    yaml_text = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: core::text_chunker
  - kind: plugin::native::nllb
    params: {target_lang: spa_Latn, max_tokens: 4}
  - kind: core::json_serialize
    params: {newline_delimited: true}
  - kind: streamkit::http_output
"""
    data, ctype = run_text_pipeline(registry, yaml_text, b"x")
    import json

    lines = [json.loads(l) for l in data.decode().strip().splitlines()]
    assert len(lines) == 1
    assert "Text" in lines[0]  # translated text packet made it through


def test_tts_pipeline_vits_backend(registry):
    """piper/MMS-class VITS backend: text in → synthesized WAV out (random
    weights, tiny config via the demo init path)."""
    yaml_text = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: core::text_chunker
    params: {min_length: 10}
  - kind: plugin::native::kokoro
    params: {backend: vits, sample_rate: 16000}
  - kind: containers::wav::muxer
  - kind: streamkit::http_output
"""
    data, ctype = run_text_pipeline(registry, yaml_text, b"Hello world. Ok.")
    assert ctype == "audio/wav"
    code, ch, rate = struct.unpack("<HHI", data[20:28])
    assert rate == 16000 and ch == 1
    y = np.frombuffer(data[44:], dtype="<i2")
    assert len(y) > 1600  # at least 100ms synthesized
