# SPDX-License-Identifier: Apache-2.0
"""ML nodes (Whisper STT, VAD, translation, TTS) — device models."""


def register_ml_nodes(registry) -> None:
    from .vad_node import VadNode

    registry.register(VadNode.KIND, lambda p: VadNode(p), "Voice activity detection (device kernel)")
    from .whisper_node import WhisperNode

    registry.register(
        WhisperNode.KIND, lambda p: WhisperNode(p), "Whisper speech-to-text (device model)"
    )
    from .translate_node import TranslateNode

    registry.register(
        TranslateNode.KIND, lambda p: TranslateNode(p), "NLLB text translation (device model)"
    )
    # helsinki role: same node class, separate kind for reference-yaml compat
    registry.register(
        "plugin::native::helsinki",
        lambda p: TranslateNode(p),
        "Opus-MT style translation (device model)",
    )
    from .tts_node import TtsNode

    registry.register(TtsNode.KIND, lambda p: TtsNode(p), "Kokoro-class streaming TTS (device model)")
    for kind, desc in [
        ("plugin::native::piper", "Piper-class streaming TTS (device model)"),
        ("plugin::native::matcha", "Matcha-class streaming TTS (device model)"),
    ]:
        registry.register(kind, lambda p: TtsNode(p), desc)
    # sensevoice: alternative STT role backed by the whisper stack
    registry.register(
        "plugin::native::sensevoice",
        lambda p: WhisperNode(p),
        "SenseVoice-class speech-to-text (device model)",
    )
