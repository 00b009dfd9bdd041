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
    from .marian_node import MarianTranslateNode

    registry.register(
        MarianTranslateNode.KIND,
        lambda p: MarianTranslateNode(p),
        "Helsinki opus-mt (Marian) translation (device model)",
    )
    from .tts_node import TtsNode

    registry.register(TtsNode.KIND, lambda p: TtsNode(p), "Kokoro-class streaming TTS (device model)")
    # piper: the VITS stack IS piper's architecture (TtsNode vits backend)
    registry.register(
        "plugin::native::piper",
        lambda p: TtsNode(p),
        "Piper (VITS) streaming TTS (device model)",
    )
    from .matcha_node import MatchaTtsNode

    registry.register(
        MatchaTtsNode.KIND,
        lambda p: MatchaTtsNode(p),
        "Matcha-TTS flow-matching TTS (device model)",
    )
    from .sensevoice_node import SenseVoiceNode

    registry.register(
        SenseVoiceNode.KIND,
        lambda p: SenseVoiceNode(p),
        "SenseVoice non-autoregressive STT (device model)",
    )
