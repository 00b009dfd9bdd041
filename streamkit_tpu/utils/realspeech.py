# SPDX-License-Identifier: Apache-2.0
"""Real-speech fixture loader for benches and quality tests.

Decodes the reference checkout's OpenSpeech corpus excerpts
(``samples/audio/system/speech_10m.opus`` — freely usable telephony test
speech) through this framework's OWN media stack (Ogg page reader +
libopus binding + 3:1 decimation to 16 kHz), so benches exercising it also
exercise the container/codec path. Falls back to ``None`` when the fixture
or libopus is unavailable; callers then use the formant synthesizer.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = [
    "real_speech_16k",
    "real_speech_available",
    "load_opus_16k",
    "DEFAULT_SAMPLE",
]

DEFAULT_SAMPLE = os.environ.get(
    "SK_REAL_SPEECH", "/root/reference/samples/audio/system/speech_10m.opus"
)

_CACHE: dict = {}


def real_speech_available(path: str = None) -> bool:
    path = path or DEFAULT_SAMPLE
    if not os.path.exists(path):
        return False
    try:
        from ..nodes.codecs.opus import OpusLib

        OpusLib.get()
        return True
    except Exception:
        return False


def load_opus_16k(path: str, secs: Optional[float] = None) -> Optional[np.ndarray]:
    """Decode an Ogg/Opus file to 16 kHz mono f32 (3:1 box decimation from
    libopus's 48 kHz output), optionally capped at ``secs``. Returns ``None``
    when the file or libopus is unavailable. The single shared decode path
    for benches, VAD training, and quality tests."""
    if not real_speech_available(path):
        return None
    from ..nodes.codecs.opus import OpusDecoder
    from ..nodes.containers.ogg import OggPageReader

    reader = OggPageReader()
    with open(path, "rb") as f:
        packets = [p for p, _ in reader.feed(f.read())]
    dec = OpusDecoder(48000, 2)
    pcm, total = [], 0
    cap48 = int(secs * 48000) if secs else None
    for pkt in packets[2:]:  # skip OpusHead/OpusTags
        frame = dec.decode(pkt)
        pcm.append(frame.mean(axis=1) if frame.ndim == 2 else frame)
        total += len(pcm[-1])
        if cap48 is not None and total >= cap48:
            break
    a48 = np.concatenate(pcm)
    n = len(a48) // 3 * 3
    return a48[:n].reshape(-1, 3).mean(axis=1).astype(np.float32)


def _load(path: str) -> Optional[np.ndarray]:
    if path not in _CACHE:
        _CACHE[path] = load_opus_16k(path)
    return _CACHE[path]


def real_speech_16k(
    seconds: float, seed: int = 0, path: str = None
) -> Optional[np.ndarray]:
    """``seconds`` of real speech @16 kHz mono, sliced at a seed-dependent
    offset (sessions get different content), or ``None`` when unavailable.
    Slices wrap around the recording when seconds exceed what remains."""
    audio = _load(path or DEFAULT_SAMPLE)
    if audio is None:
        return None
    n = int(seconds * 16000)
    if n >= len(audio):
        reps = n // len(audio) + 1
        audio = np.tile(audio, reps)
        return audio[:n].copy()
    rng = np.random.RandomState(seed)
    off = int(rng.randint(0, len(audio) - n))
    return audio[off : off + n].copy()
