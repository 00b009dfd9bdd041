# SPDX-License-Identifier: Apache-2.0
"""Whisper node tests: the reference speech_to_text.yml pipeline shape runs
end-to-end with a (random-weight) tiny model and produces Transcription JSON."""

import asyncio
import io
import json
import wave

import numpy as np
import pytest

from streamkit_tpu.api import compile_yaml
from streamkit_tpu.core import NodeRegistry, ResourceManager
from streamkit_tpu.engine import run_oneshot_pipeline
from streamkit_tpu.nodes import register_nodes


@pytest.fixture(scope="module")
def registry():
    reg = NodeRegistry()
    register_nodes(reg)
    return reg


def speech_wav(rate=16000, secs=3) -> bytes:
    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    x = np.zeros(rate * secs, dtype=np.float32)
    # 1s silence, ~1s speech-like utterance, trailing silence
    utt, _ = synth_speech_with_plan(
        1.1, rate, seed=9, pause_range=(0.01, 0.02), utt_range=(1.0, 1.05), lead_silence_s=0.0
    )
    n = min(len(utt), rate)
    x[rate : rate + n] = utt[:n]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    return buf.getvalue()


STT_YAML = """
name: Speech-to-Text (Whisper)
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: containers::wav::demuxer
  - kind: plugin::native::whisper
    params:
      model_size: test-tiny
      language: en
      vad_threshold: 0.5
      min_silence_duration_ms: 700
      max_segment_duration_secs: 30.0
      max_tokens: 8
  - kind: core::json_serialize
    params: {newline_delimited: true}
  - kind: streamkit::http_output
    params: {content_type: application/json}
"""


@pytest.fixture(scope="module", autouse=True)
def tiny_test_config():
    """Register a fast test config so the node runs in seconds."""
    from streamkit_tpu.models.whisper import WHISPER_CONFIGS, WhisperConfig

    WHISPER_CONFIGS["test-tiny"] = WhisperConfig(
        n_audio_ctx=1500,
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
    )
    yield
    WHISPER_CONFIGS.pop("test-tiny", None)


def test_speech_to_text_pipeline(registry):
    """Mirror of reference samples/pipelines/oneshot/speech_to_text.yml."""
    pipeline = compile_yaml(STT_YAML)
    body = speech_wav()
    resources = ResourceManager()

    async def main():
        async def stream():
            yield body

        result = await run_oneshot_pipeline(
            registry, pipeline, input_stream=stream(), resources=resources
        )
        return (await result.read_all()).decode()

    out = asyncio.run(main())
    lines = [json.loads(l) for l in out.strip().splitlines() if l]
    assert len(lines) >= 1
    tr = lines[0]["Transcription"]
    assert tr["language"] == "en"
    assert isinstance(tr["text"], str)
    seg = tr["segments"][0]
    # segment must cover the speech burst (1s..2s)
    assert seg["start_time_ms"] <= 1100
    assert seg["end_time_ms"] >= 1800
    assert resources.stats()["entries"] == 1  # model cached


def test_model_cache_shared_across_pipelines(registry):
    """Two runs share one model load (reference process-wide cache)."""
    pipeline = compile_yaml(STT_YAML)
    body = speech_wav()
    resources = ResourceManager()

    async def run_once():
        async def stream():
            yield body

        result = await run_oneshot_pipeline(
            registry, pipeline, input_stream=stream(), resources=resources
        )
        await result.read_all()

    async def main():
        await run_once()
        await run_once()

    asyncio.run(main())
    assert resources.misses == 1
    assert resources.hits >= 1


def test_language_auto_detects_and_resolves(registry):
    """language=auto (whisper.cpp semantics): the node detects the language
    from the first segment and reports a resolved code, both on the direct
    path and through the batched ring-decode path (per-row language)."""
    from streamkit_tpu.engine.batcher import DeviceBatcher
    from streamkit_tpu.models.whisper.config import WHISPER_LANGUAGES

    yaml_auto = STT_YAML.replace("language: en", "language: auto")
    pipeline = compile_yaml(yaml_auto)
    body = speech_wav()

    async def main(batcher):
        resources = ResourceManager()

        async def stream():
            yield body

        result = await run_oneshot_pipeline(
            registry, pipeline, input_stream=stream(),
            resources=resources, batcher=batcher,
        )
        return (await result.read_all()).decode()

    # direct (non-batched) path
    out = asyncio.run(main(None))
    lines = [json.loads(l) for l in out.strip().splitlines() if l]
    assert lines, out
    lang = lines[0]["Transcription"]["language"]
    assert lang in WHISPER_LANGUAGES, lang  # resolved, never "auto"

    # batched path: detect kind + per-row lang rows through the ring decode
    async def run_batched():
        b = DeviceBatcher(tick_ms=5.0)
        b.start()
        out = await main(b)
        stats = b.stats()
        b.stop()
        return out, stats

    out, stats = asyncio.run(run_batched())
    lines = [json.loads(l) for l in out.strip().splitlines() if l]
    assert lines, out
    lang = lines[0]["Transcription"]["language"]
    assert lang in WHISPER_LANGUAGES, lang
    assert any(k.startswith("whisper_detect:") for k in stats["kinds"]), stats


def test_final_confidence_reported_on_batched_path(registry):
    """Finals carry a mean-token-probability confidence (the reference's
    whisper.cpp wrapper reports None — this exceeds it)."""
    from streamkit_tpu.engine.batcher import DeviceBatcher

    pipeline = compile_yaml(STT_YAML)
    body = speech_wav()

    async def main():
        b = DeviceBatcher(tick_ms=5.0)
        b.start()
        resources = ResourceManager()

        async def stream():
            yield body

        result = await run_oneshot_pipeline(
            registry, pipeline, input_stream=stream(),
            resources=resources, batcher=b,
        )
        out = (await result.read_all()).decode()
        b.stop()
        return out

    out = asyncio.run(main())
    lines = [json.loads(l) for l in out.strip().splitlines() if l]
    assert lines, out
    seg = lines[0]["Transcription"]["segments"][0]
    assert seg["confidence"] is not None
    assert 0.0 < seg["confidence"] <= 1.0
