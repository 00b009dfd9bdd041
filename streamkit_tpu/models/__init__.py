# SPDX-License-Identifier: Apache-2.0
"""Device model families: Whisper STT, translation, TTS."""
