# SPDX-License-Identifier: Apache-2.0
"""Evaluate VAD backends on the real-speech eval fixture.

Decodes the reference checkout's OpenSpeech excerpt (``speech_2m.opus`` —
held out from training, which uses ``speech_10m.opus``; measured
cross-correlation between the two ≈ 0.14, i.e. different recordings) and
prints, per backend: mean prob over the loudest/quietest energy deciles,
fraction of frames above threshold, and segment statistics through
``SpeechSegmenter``. The energy-decile separation is the distribution-free
sanity any VAD must pass on real speech; tests/test_vad_real_speech.py
asserts the same properties.

Run: JAX_PLATFORM_NAME=cpu python tools/eval_vad.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SAMPLE = os.environ.get(
    "SK_VAD_EVAL_SPEECH", "/root/reference/samples/audio/system/speech_2m.opus"
)


def load_16k(path: str, secs: float = 110.0) -> np.ndarray:
    from streamkit_tpu.utils.realspeech import load_opus_16k

    audio = load_opus_16k(path, secs=secs)
    if audio is None:
        raise FileNotFoundError(f"fixture or libopus unavailable: {path}")
    return audio


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from streamkit_tpu.nodes.ml.vad_node import SpeechSegmenter
    from streamkit_tpu.ops import vad as V
    from streamkit_tpu.ops.vad import VAD_FRAME, vad_init_state

    audio = load_16k(SAMPLE)
    n = len(audio) // VAD_FRAME
    frames = audio[: n * VAD_FRAME].reshape(n, VAD_FRAME)
    rms = np.sqrt((frames**2).mean(axis=1))
    order = np.argsort(rms)
    k = max(1, n // 10)
    print(f"# {SAMPLE}: {n * VAD_FRAME / 16000:.1f}s, {n} frames")

    for backend in ("learned", "spectral"):
        V._BACKEND = None
        V._LEARNED_APPLY = None
        os.environ["SK_VAD_BACKEND"] = backend
        state = vad_init_state()
        seg = SpeechSegmenter(threshold=0.5, min_silence_ms=700.0, max_segment_secs=30.0)
        probs, segments = [], []
        for i in range(0, n, 50):
            p, state = V.vad_frame_probs(state, jnp.asarray(frames[i : i + 50]))
            p = np.asarray(p)
            probs.append(p)
            for j, prob in enumerate(p):
                for kind, _s, s_f, e_f in seg.push(frames[i + j], float(prob)):
                    if kind == "speech_end":
                        segments.append((s_f, e_f))
        for kind, _s, s_f, e_f in seg.flush():
            if kind == "speech_end":
                segments.append((s_f, e_f))
        probs = np.concatenate(probs)
        durs = [(e - s) * VAD_FRAME / 16000 for s, e in segments]
        print(
            f"{backend:9s} loud-decile {probs[order[-k:]].mean():.3f}  "
            f"quiet-decile {probs[order[:k]].mean():.3f}  "
            f">0.5 {float((probs > 0.5).mean()):.2%}  "
            f"segments {len(segments)} "
            f"(mean {np.mean(durs):.1f}s, cover {sum(durs):.0f}s)"
            if durs
            else f"{backend:9s} loud {probs[order[-k:]].mean():.3f} quiet "
            f"{probs[order[:k]].mean():.3f} — NO SEGMENTS",
        )

    # -- quiet-SPEECH recall (the user-felt metric) ---------------------------
    # The loud/quiet-decile means above rank ALL frames: the quietest decile
    # is dominated by pauses/room tone, where LOW prob is correct (the
    # segmenter's min_silence hinges on it). What users feel is recall on
    # frames that ARE speech but quiet — soft phonemes, utterance tails, low
    # capture gain. Label speech frames with the weight-free spectral
    # teacher at the original level (conservative: prob > 0.8 only), then
    # report learned-backend recall (a) per speech-frame energy quintile and
    # (b) with the whole signal attenuated (quiet capture).
    from streamkit_tpu.ops.vad import _spectral_frame_probs, _spectral_init_state

    st = _spectral_init_state()
    tp = []
    for i in range(0, n, 256):
        p, st = _spectral_frame_probs(st, jnp.asarray(frames[i : i + 256]))
        tp.append(np.asarray(p))
    tp = np.concatenate(tp)
    speech = tp > 0.8

    V._BACKEND = None
    V._LEARNED_APPLY = None
    os.environ["SK_VAD_BACKEND"] = "learned"

    def run(gain: float) -> np.ndarray:
        state = vad_init_state()
        out = []
        for i in range(0, n, 50):
            p, state = V.vad_frame_probs(state, jnp.asarray(frames[i : i + 50] * gain))
            out.append(np.asarray(p))
        return np.concatenate(out)

    probs = run(1.0)
    sidx = np.where(speech)[0]
    qorder = sidx[np.argsort(rms[sidx])]
    kq = len(qorder) // 5
    rq = [(probs[qorder[q * kq : (q + 1) * kq]] > 0.5).mean() for q in range(5)]
    print(
        "learned speech-frame recall by energy quintile (quiet→loud): "
        + "  ".join(f"{r:.3f}" for r in rq)
    )
    for att_db in (-12.0, -20.0, -26.0):
        pa = run(10 ** (att_db / 20))
        rec = float((pa[speech] > 0.5).mean())
        fa = float((pa[tp < 0.2] > 0.5).mean())
        print(f"learned @ {att_db:+.0f} dB: speech recall {rec:.3f}  nonspeech false-accept {fa:.3f}")


if __name__ == "__main__":
    main()
