# SPDX-License-Identifier: Apache-2.0
"""ML nodes (Whisper STT, VAD, translation, TTS) — device models."""


def register_ml_nodes(registry) -> None:
    from .vad_node import VadNode

    registry.register(VadNode.KIND, lambda p: VadNode(p), "Voice activity detection (device kernel)")
    try:
        from .whisper_node import WhisperNode

        registry.register(
            WhisperNode.KIND, lambda p: WhisperNode(p), "Whisper speech-to-text (device model)"
        )
    except ImportError:
        pass  # whisper model stack not yet available
