# SPDX-License-Identifier: Apache-2.0
"""Generate sample media fixtures offline (zero-egress substitute for the
reference's licensed recordings in ``samples/audio/system/``).

Usage: python tools/make_fixtures.py [--out samples/media] [--long]

Writes (deterministic, seeded):
  speech_8s.wav     8 s speech-like audio, 16 kHz mono s16 (VAD / STT tests)
  speech_30s.ogg    30 s speech-like audio, Opus-in-Ogg 48 kHz stereo
  music_30s.ogg     30 s arpeggio synth, Opus-in-Ogg
  speech_10m.ogg    10 min speech-like audio (--long; loadtest fixture,
                    mirrors reference samples/audio/system/speech_10m.opus)
"""

from __future__ import annotations

import argparse
import os
import struct
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamkit_tpu.nodes.codecs.opus import OpusEncoder  # noqa: E402
from streamkit_tpu.nodes.containers.ogg import (  # noqa: E402
    OggPageWriter,
    opus_head,
    opus_tags,
)
from streamkit_tpu.utils.speechsynth import synth_music, synth_speech  # noqa: E402


def write_wav(path: str, audio: np.ndarray, sr: int) -> None:
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def write_opus_ogg(path: str, audio: np.ndarray, sr_in: int, bitrate: int = 32000) -> None:
    """Encode mono float audio to Opus-in-Ogg at 48 kHz stereo."""
    # naive linear resample to 48k (fixture quality is fine)
    sr = 48000
    if sr_in != sr:
        n_out = int(len(audio) * sr / sr_in)
        x_old = np.linspace(0.0, 1.0, len(audio), dtype=np.float64)
        x_new = np.linspace(0.0, 1.0, n_out, dtype=np.float64)
        audio = np.interp(x_new, x_old, audio.astype(np.float64)).astype(np.float32)
    stereo = np.stack([audio, audio], axis=-1)
    enc = OpusEncoder(sr, 2, bitrate=bitrate)
    frame = 960  # 20 ms
    preskip = 312
    writer = OggPageWriter()
    out = bytearray()
    out += writer.page([opus_head(2, preskip=preskip)], 0, header_type=2)  # BOS
    out += writer.page([opus_tags()], 0)
    pending: list[bytes] = []
    granule = preskip
    n_frames = len(stereo) // frame
    for i in range(n_frames):
        chunk = stereo[i * frame : (i + 1) * frame]
        pending.append(enc.encode(chunk))
        granule += frame
        if len(pending) >= 50:  # ~1 s per page
            out += writer.page(pending, granule)
            pending = []
    if pending:
        out += writer.page(pending, granule, header_type=4)  # EOS
    else:
        out += writer.page([], granule, header_type=4)
    with open(path, "wb") as f:
        f.write(bytes(out))



def make_kokoro_golden(outdir: str, n_voices: int = 3, seed: int = 7) -> None:
    """Synthetic kokoro golden pack with the reference model-dir layout
    (kokoro_node.rs:705-709): tokens.txt, voices.bin, espeak-ng-data/,
    dict/. Voice styles are deterministic pseudo-random vectors so the
    converter and speaker selection are testable without real weights."""
    from streamkit_tpu.models.kokoro import STYLE_DIM, STYLE_ROWS

    os.makedirs(outdir, exist_ok=True)
    chars = list("abcdefghijklmnopqrstuvwxyz") + [" ", ".", ",", "?", "!", "'"]
    with open(os.path.join(outdir, "tokens.txt"), "w", encoding="utf-8") as f:
        for i, c in enumerate(chars):
            f.write(f"{c} {i}\n")
    rng = np.random.RandomState(seed)
    voices = rng.randn(n_voices, STYLE_ROWS, STYLE_DIM).astype("<f4") * 0.1
    # make voices clearly distinct for tests
    for v in range(n_voices):
        voices[v] += v * 0.5
    voices.tofile(os.path.join(outdir, "voices.bin"))
    for sub in ("espeak-ng-data", "dict"):
        os.makedirs(os.path.join(outdir, sub), exist_ok=True)
        with open(os.path.join(outdir, sub, ".gitkeep"), "w") as f:
            f.write("")
    with open(os.path.join(outdir, "README.md"), "w") as f:
        f.write(
            "Synthetic kokoro golden pack (tools/make_fixtures.py make_kokoro_golden):\n"
            "reference model-dir layout for converter/node tests; model.onnx is\n"
            "intentionally absent (graph weights are provisioned separately).\n"
        )
    print(f"wrote kokoro golden pack: {outdir} ({n_voices} voices)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="samples/media")
    ap.add_argument("--long", action="store_true", help="also write speech_10m.ogg")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    speech8 = synth_speech(8.0, 16000, seed=7)
    write_wav(os.path.join(args.out, "speech_8s.wav"), speech8, 16000)
    print("wrote speech_8s.wav")

    speech30 = synth_speech(30.0, 16000, seed=11)
    write_opus_ogg(os.path.join(args.out, "speech_30s.ogg"), speech30, 16000)
    print("wrote speech_30s.ogg")

    music30 = synth_music(30.0, 48000, seed=3)
    write_opus_ogg(os.path.join(args.out, "music_30s.ogg"), music30, 48000)
    print("wrote music_30s.ogg")

    if args.long:
        # synthesize in 60 s blocks to bound memory
        parts = [synth_speech(60.0, 16000, seed=100 + i) for i in range(10)]
        speech = np.concatenate(parts)
        write_opus_ogg(os.path.join(args.out, "speech_10m.ogg"), speech, 16000, bitrate=24000)
        print("wrote speech_10m.ogg")


if __name__ == "__main__":
    main()
