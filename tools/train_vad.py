# SPDX-License-Identifier: Apache-2.0
"""Train the bundled learned VAD on synthesized + real speech.

Zero-egress substitute for Silero's trained weights: the formant
synthesizer (``streamkit_tpu.utils.speechsynth``) provides speech-like
positives with exact frame labels; negatives are silence, white/pink noise,
tones, and synth music. Mixtures (speech+noise at varying SNR) keep the
label speech.

Synthetic-only training measurably does NOT generalize: on the OpenSpeech
real-speech fixture the synth-trained net scored the loudest-decile frames
at mean prob 0.15 (vs 0.97 for the weight-free spectral scorer —
tests/test_vad_real_speech.py). So when the reference checkout's
OpenSpeech sample (``samples/audio/system/speech_10m.opus``,
LicenseRef-VoIPTroubleshooter-OpenSpeech — a freely-usable codec-testing
corpus) is present, training mixes in real-speech clips pseudo-labeled by
the spectral scorer, keeping only high-confidence frames in the loss
(prob > 0.8 → speech, < 0.2 → nonspeech, in-between masked out), plus
gain/EQ-tilt augmentation on every clip.

Runs on CPU in a few minutes:
    JAX_PLATFORM_NAME=cpu python tools/train_vad.py
Writes streamkit_tpu/models/weights/vad_synth.npz
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor the documented CPU invocation even under the axon sitecustomize,
# where the env var alone is pinned to the TPU plugin (tests/conftest.py
# note) — registration against a dead tunnel otherwise hangs forever
if os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from streamkit_tpu.models import silero_vad as sv
from streamkit_tpu.utils.speechsynth import synth_music, synth_speech_with_plan

FRAME = sv.FRAME
SR = 16000
CLIP_FRAMES = 48  # ~1.5 s clips (48 x 32 ms)
CLIP = CLIP_FRAMES * FRAME


def _pink(rng, n):
    white = rng.standard_normal(n + 1024).astype(np.float32)
    # crude 1/f shaping via cumulative smoothing
    k = np.exp(-np.arange(256) / 64.0).astype(np.float32)
    pink = np.convolve(white, k, mode="same")[:n]
    return pink / (np.abs(pink).max() + 1e-6)


_REAL_SAMPLE = os.environ.get(
    "SK_VAD_REAL_SPEECH",
    "/root/reference/samples/audio/system/speech_10m.opus",
)
_REAL = None  # (frames [N, FRAME] f32, probs [N] spectral) or () if absent


def _load_real():
    """Decode the OpenSpeech fixture @16 kHz and pseudo-label every frame
    with the weight-free spectral scorer (which separates real speech at
    0.97/0.25 loud/quiet decile — the trustworthy teacher here)."""
    global _REAL
    if _REAL is not None:
        return _REAL
    try:
        from streamkit_tpu.ops.vad import _spectral_frame_probs, _spectral_init_state
        from streamkit_tpu.utils.realspeech import load_opus_16k

        a16 = load_opus_16k(_REAL_SAMPLE)
        if a16 is None:
            raise FileNotFoundError(_REAL_SAMPLE)
        nf = len(a16) // FRAME
        frames = a16[: nf * FRAME].reshape(nf, FRAME)
        st = _spectral_init_state()
        probs = []
        for i in range(0, nf, 256):
            p, st = _spectral_frame_probs(st, jnp.asarray(frames[i : i + 256]))
            probs.append(np.asarray(p))
        probs = np.concatenate(probs)
        _REAL = (frames, probs)
        print(
            f"# real-speech teacher: {nf} frames from {_REAL_SAMPLE} "
            f"(speech {(probs > 0.8).mean():.0%}, nonspeech {(probs < 0.2).mean():.0%}, "
            f"masked {((probs >= 0.2) & (probs <= 0.8)).mean():.0%})",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 — train synthetic-only without it
        print(f"# real-speech fixture unavailable ({e}); synthetic-only", flush=True)
        _REAL = ()
    return _REAL


def _augment(rng, audio):
    """Gain + first-order EQ tilt, matching real capture-level diversity."""
    gain = float(rng.uniform(0.05, 1.4))
    audio = audio * gain
    if rng.integers(0, 2):  # one-pole tilt (dark or bright)
        a = float(rng.uniform(-0.6, 0.6))
        out = np.empty_like(audio)
        # y[t] = x[t] + a*x[t-1] — cheap spectral tilt
        out[0] = audio[0]
        out[1:] = audio[1:] + a * audio[:-1]
        audio = out
    return np.clip(audio, -1.0, 1.0)


def make_dataset(n_clips: int, seed: int):
    """Returns (audio [N, CLIP], labels [N, CLIP_FRAMES], weight [N, CLIP_FRAMES])."""
    rng = np.random.default_rng(seed)
    real = _load_real()
    xs, ys, ws = [], [], []
    for i in range(n_clips):
        # 14 slots: 0-2 real speech, 3-7 synth speech (6-7 noisy), 8-9
        # stationary noise, 10 AM noise, 11 tones, 12 music, 13 near-silence
        # — real clips must not CROWD OUT synth speech: the first mixed
        # training run left synth speech at 2/12 of clips and the net
        # forgot it (0.2 frame acc on the synthetic eval the benches feed)
        kind = rng.integers(0, 14)
        if len(real) and kind < 3:  # real speech, spectral-pseudo-labeled
            frames, probs = real
            j = int(rng.integers(0, len(frames) - CLIP_FRAMES))
            audio = _augment(rng, frames[j : j + CLIP_FRAMES].reshape(-1).copy())
            p = probs[j : j + CLIP_FRAMES]
            label = (p > 0.8).astype(np.float32)
            weight = ((p > 0.8) | (p < 0.2)).astype(np.float32)
            if rng.integers(0, 3) == 0:  # noise under real speech
                audio = audio + rng.standard_normal(CLIP).astype(np.float32) * float(
                    rng.uniform(0.002, 0.03)
                )
            xs.append(audio[:CLIP])
            ys.append(label)
            ws.append(weight)
            continue
        if kind < 8:  # synth speech (possibly noisy)
            audio, plan = synth_speech_with_plan(
                CLIP / SR + 0.2, SR, seed=seed * 7919 + i, lead_silence_s=float(rng.uniform(0, 0.5))
            )
            audio = audio[:CLIP]
            label = plan.speech_mask(FRAME / SR)[:CLIP_FRAMES].astype(np.float32)
            if len(label) < CLIP_FRAMES:
                label = np.pad(label, (0, CLIP_FRAMES - len(label)))
            gain = float(rng.uniform(0.2, 1.5))
            audio = audio * gain
            if kind >= 6:  # add noise under the speech
                snr = float(rng.uniform(0.02, 0.15))
                noise = rng.standard_normal(CLIP).astype(np.float32) * snr * gain
                audio = audio + noise
        elif kind < 10:  # stationary noise (white or pink), wide level range
            level = float(rng.uniform(0.005, 0.5))
            audio = (
                rng.standard_normal(CLIP).astype(np.float32)
                if kind == 8
                else _pink(rng, CLIP)
            ) * level
            label = np.zeros(CLIP_FRAMES, np.float32)
        elif kind == 10:  # amplitude-modulated noise — hard negative
            t = np.arange(CLIP) / SR
            env = 0.5 + 0.5 * np.sin(2 * np.pi * float(rng.uniform(2.0, 6.0)) * t)
            audio = (rng.standard_normal(CLIP) * env * float(rng.uniform(0.05, 0.3))).astype(
                np.float32
            )
            label = np.zeros(CLIP_FRAMES, np.float32)
        elif kind == 11:  # pure tone(s) — structured but not speech-modulated
            t = np.arange(CLIP) / SR
            f = float(rng.uniform(100, 2000))
            audio = (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)
            label = np.zeros(CLIP_FRAMES, np.float32)
        elif kind == 12:  # music
            audio = synth_music(CLIP / SR + 0.1, SR, seed=seed * 104729 + i)[:CLIP]
            label = np.zeros(CLIP_FRAMES, np.float32)
        else:  # near-silence
            audio = rng.standard_normal(CLIP).astype(np.float32) * 0.002
            label = np.zeros(CLIP_FRAMES, np.float32)
        if len(audio) < CLIP:
            audio = np.pad(audio, (0, CLIP - len(audio)))
        xs.append(audio[:CLIP])
        ys.append(label)
        ws.append(np.ones(CLIP_FRAMES, np.float32))
    return np.stack(xs), np.stack(ys), np.stack(ws)


def main() -> None:
    params = {k: jnp.asarray(v) for k, v in sv.init_params(0).items()}
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def loss_fn(params, audio, labels, weight):
        frames = audio.reshape(audio.shape[0], CLIP_FRAMES, FRAME)
        state = sv.init_state((audio.shape[0],))
        probs, _ = sv.apply(params, state, frames)
        eps = 1e-6
        bce = -(labels * jnp.log(probs + eps) + (1 - labels) * jnp.log(1 - probs + eps))
        wsum = jnp.maximum(jnp.sum(weight), 1.0)
        acc = jnp.sum(((probs > 0.5) == (labels > 0.5)) * weight) / wsum
        return jnp.sum(bce * weight) / wsum, acc

    @jax.jit
    def step(params, opt_state, audio, labels, weight):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, audio, labels, weight
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    val_x, val_y, val_w = make_dataset(128, seed=999_999)
    val_x, val_y, val_w = jnp.asarray(val_x), jnp.asarray(val_y), jnp.asarray(val_w)
    n_steps = int(os.environ.get("SK_VAD_STEPS", 1200))
    batch = 64
    for it in range(n_steps):
        x, y, w = make_dataset(batch, seed=it)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)
        )
        if it % 50 == 0 or it == n_steps - 1:
            vloss, vacc = loss_fn(params, val_x, val_y, val_w)
            print(f"step {it}: loss {loss:.4f} acc {acc:.3f} | val loss {vloss:.4f} acc {vacc:.3f}", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "streamkit_tpu",
        "models",
        "weights",
        "vad_synth.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    sv.save_params({k: np.asarray(v) for k, v in params.items()}, out)
    vloss, vacc = loss_fn(params, val_x, val_y, val_w)
    print(f"saved {os.path.normpath(out)} (val acc {float(vacc):.3f})")


if __name__ == "__main__":
    main()
