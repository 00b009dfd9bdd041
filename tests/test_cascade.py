# SPDX-License-Identifier: Apache-2.0
"""Full voice-translation cascade: STT -> MT -> TTS in ONE pipeline.

The reference's flagship composition (speech_to_text_translate samples +
kokoro): here the whole cascade runs through the shared DeviceBatcher and
ResourceManager — three ML stacks (whisper ring kinds, nllb bucketed
decode, VITS TTS synthesis) sharing one dispatcher, audio in -> audio out.
Random-init weights: transcripts/translations are garbage tokens, but the
mechanics under test are typed wiring, segmentation, batched dispatch of
every stack, and audio synthesis at the far end.
"""

import asyncio
import io
import wave

import numpy as np

from streamkit_tpu.api.yaml_compiler import compile_yaml
from streamkit_tpu.core import NodeRegistry, ResourceManager
from streamkit_tpu.engine.batcher import DeviceBatcher
from streamkit_tpu.engine.oneshot import run_oneshot_pipeline
from streamkit_tpu.nodes import register_nodes

CASCADE_YAML = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: containers::wav::demuxer
  - kind: plugin::native::whisper
    params: {model_size: tiny, language: en, min_silence_duration_ms: 400}
  - kind: plugin::native::nllb
    params: {source_lang: eng_Latn, target_lang: spa_Latn, max_tokens: 16}
  - kind: plugin::native::kokoro
    params: {backend: vits, sample_rate: 24000}
  - kind: containers::wav::muxer
  - kind: streamkit::http_output
    params: {content_type: audio/wav}
"""


def _speech_wav(seconds: float = 3.0) -> bytes:
    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    audio, _ = synth_speech_with_plan(
        seconds, 16000, seed=7, pause_range=(0.8, 0.9), utt_range=(1.0, 1.2)
    )
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes())
    w.close()
    return buf.getvalue()


def test_stt_translate_tts_cascade_through_shared_batcher():
    reg = NodeRegistry()
    register_nodes(reg)
    body = _speech_wav()

    async def main():
        batcher = DeviceBatcher(tick_ms=10.0)
        batcher.start()
        resources = ResourceManager()

        async def stream():
            yield body

        res = await run_oneshot_pipeline(
            reg,
            compile_yaml(CASCADE_YAML),
            input_stream=stream(),
            batcher=batcher,
            resources=resources,
        )
        out = await res.read_all()
        stats = batcher.stats()
        batcher.stop()
        return out, stats

    out, stats = asyncio.run(main())
    # audio came out the far end (random-init weights produce short garbage
    # utterances — the assertion is mechanics, not speech quality)
    assert out[:4] == b"RIFF", out[:16]
    pcm = out[44:]
    assert len(pcm) >= int(0.02 * 24000) * 2, f"only {len(pcm)} PCM bytes"
    # every stack in the cascade dispatched through the SHARED batcher
    kinds = set(stats["kinds"])
    assert any(k.startswith(("vad_ring", "whisper_ring", "stream_step")) for k in kinds), kinds
    assert any(k.startswith("nllb:") for k in kinds), kinds
    assert any(k.startswith("tts_vits:") for k in kinds), kinds
