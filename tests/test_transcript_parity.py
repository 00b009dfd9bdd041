# SPDX-License-Identifier: Apache-2.0
"""Transcript-parity scaffold (BASELINE.md target: oneshot transcript parity
on ``samples/pipelines/speech_to_text.yml``).

This environment is zero-egress, so trained Whisper weights cannot be
fetched; the test is keyed on ``SK_WHISPER_WEIGHTS`` (an HF whisper model
directory). When a weights dir is provisioned, it runs the full oneshot STT
pipeline on real recorded speech (or our synthesized fixture) and checks
the transcript against the HF reference implementation on the same audio.
"""

import asyncio
import io
import os
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WEIGHTS = os.environ.get("SK_WHISPER_WEIGHTS", "")
AUDIO = os.environ.get(
    "SK_PARITY_AUDIO",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "samples",
        "media",
        "speech_8s.wav",
    ),
)

needs_weights = pytest.mark.skipif(
    not (WEIGHTS and os.path.isdir(WEIGHTS)),
    reason="set SK_WHISPER_WEIGHTS to an HF whisper checkpoint dir",
)

STT_YAML = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: containers::wav::demuxer
  - kind: plugin::native::whisper
    params: {{model_path: "{weights}", language: en, allow_random_init: false}}
  - kind: core::json_serialize
    params: {{newline_delimited: true}}
  - kind: streamkit::http_output
"""


def _normalize(text: str) -> str:
    import re

    return re.sub(r"[^a-z0-9 ]", "", text.lower()).strip()


@needs_weights
def test_oneshot_transcript_parity_vs_hf():
    """Our pipeline's transcript must match transformers' WhisperForConditionalGeneration
    greedy transcript on the same audio (normalized word overlap ≥ 0.8)."""
    import json

    import transformers

    from streamkit_tpu.api import compile_yaml
    from streamkit_tpu.core import NodeRegistry
    from streamkit_tpu.engine.oneshot import run_oneshot_pipeline
    from streamkit_tpu.nodes import register_nodes

    with wave.open(AUDIO, "rb") as w:
        sr = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2").astype(np.float32) / 32768.0
    assert sr == 16000

    # reference transcript via HF
    proc = transformers.WhisperProcessor.from_pretrained(WEIGHTS)
    model = transformers.WhisperForConditionalGeneration.from_pretrained(WEIGHTS)
    feats = proc(pcm, sampling_rate=sr, return_tensors="pt").input_features
    ref_ids = model.generate(feats, num_beams=1, do_sample=False)
    ref_text = proc.batch_decode(ref_ids, skip_special_tokens=True)[0]

    # our pipeline transcript
    reg = NodeRegistry()
    register_nodes(reg)
    wav_bytes = open(AUDIO, "rb").read()

    async def main():
        async def stream():
            yield wav_bytes

        res = await run_oneshot_pipeline(
            reg, compile_yaml(STT_YAML.format(weights=WEIGHTS)), input_stream=stream()
        )
        return await res.read_all()

    lines = asyncio.run(main()).decode().strip().splitlines()
    ours = " ".join(
        json.loads(line)["Transcription"]["text"] for line in lines if line.strip()
    )

    ref_words = set(_normalize(ref_text).split())
    our_words = set(_normalize(ours).split())
    assert ref_words, f"HF produced an empty transcript: {ref_text!r}"
    overlap = len(ref_words & our_words) / len(ref_words)
    assert overlap >= 0.8, (
        f"transcript overlap {overlap:.2f} < 0.8\nref:  {ref_text!r}\nours: {ours!r}"
    )


def test_parity_scaffold_is_wired():
    """Always-on guard: the fixture exists and the YAML template compiles, so
    the parity test is one env var away from running."""
    from streamkit_tpu.api import compile_yaml

    assert os.path.exists(AUDIO), AUDIO
    pipeline = compile_yaml(STT_YAML.format(weights="/tmp/nonexistent"))
    kinds = [n.kind for n in pipeline.nodes.values()]
    assert "plugin::native::whisper" in kinds
