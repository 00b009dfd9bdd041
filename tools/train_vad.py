# SPDX-License-Identifier: Apache-2.0
"""Train the bundled learned VAD on synthesized speech/noise.

Zero-egress substitute for Silero's trained weights: the formant
synthesizer (``streamkit_tpu.utils.speechsynth``) provides speech-like
positives with exact frame labels; negatives are silence, white/pink noise,
tones, and synth music. Mixtures (speech+noise at varying SNR) keep the
label speech.

Runs on CPU in a few minutes:
    JAX_PLATFORM_NAME=cpu python tools/train_vad.py
Writes streamkit_tpu/models/weights/vad_synth.npz
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
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


def make_dataset(n_clips: int, seed: int):
    """Returns (audio [N, CLIP], labels [N, CLIP_FRAMES])."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for i in range(n_clips):
        kind = rng.integers(0, 12)
        if kind < 5:  # speech (possibly noisy)
            audio, plan = synth_speech_with_plan(
                CLIP / SR + 0.2, SR, seed=seed * 7919 + i, lead_silence_s=float(rng.uniform(0, 0.5))
            )
            audio = audio[:CLIP]
            label = plan.speech_mask(FRAME / SR)[:CLIP_FRAMES].astype(np.float32)
            if len(label) < CLIP_FRAMES:
                label = np.pad(label, (0, CLIP_FRAMES - len(label)))
            gain = float(rng.uniform(0.2, 1.5))
            audio = audio * gain
            if kind >= 3:  # add noise under the speech
                snr = float(rng.uniform(0.02, 0.15))
                noise = rng.standard_normal(CLIP).astype(np.float32) * snr * gain
                audio = audio + noise
        elif kind < 8:  # stationary noise (white or pink), wide level range
            level = float(rng.uniform(0.005, 0.5))
            audio = (
                rng.standard_normal(CLIP).astype(np.float32)
                if kind in (5, 6)
                else _pink(rng, CLIP)
            ) * level
            label = np.zeros(CLIP_FRAMES, np.float32)
        elif kind == 8:  # amplitude-modulated noise — hard negative
            t = np.arange(CLIP) / SR
            env = 0.5 + 0.5 * np.sin(2 * np.pi * float(rng.uniform(2.0, 6.0)) * t)
            audio = (rng.standard_normal(CLIP) * env * float(rng.uniform(0.05, 0.3))).astype(
                np.float32
            )
            label = np.zeros(CLIP_FRAMES, np.float32)
        elif kind == 9:  # pure tone(s) — structured but not speech-modulated
            t = np.arange(CLIP) / SR
            f = float(rng.uniform(100, 2000))
            audio = (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)
            label = np.zeros(CLIP_FRAMES, np.float32)
        elif kind == 10:  # music
            audio = synth_music(CLIP / SR + 0.1, SR, seed=seed * 104729 + i)[:CLIP]
            label = np.zeros(CLIP_FRAMES, np.float32)
        else:  # near-silence
            audio = rng.standard_normal(CLIP).astype(np.float32) * 0.002
            label = np.zeros(CLIP_FRAMES, np.float32)
        if len(audio) < CLIP:
            audio = np.pad(audio, (0, CLIP - len(audio)))
        xs.append(audio[:CLIP])
        ys.append(label)
    return np.stack(xs), np.stack(ys)


def main() -> None:
    params = {k: jnp.asarray(v) for k, v in sv.init_params(0).items()}
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def loss_fn(params, audio, labels):
        frames = audio.reshape(audio.shape[0], CLIP_FRAMES, FRAME)
        state = sv.init_state((audio.shape[0],))
        probs, _ = sv.apply(params, state, frames)
        eps = 1e-6
        bce = -(labels * jnp.log(probs + eps) + (1 - labels) * jnp.log(1 - probs + eps))
        acc = jnp.mean((probs > 0.5) == (labels > 0.5))
        return jnp.mean(bce), acc

    @jax.jit
    def step(params, opt_state, audio, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, audio, labels)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    val_x, val_y = make_dataset(128, seed=999_999)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    n_steps = int(os.environ.get("SK_VAD_STEPS", 1200))
    batch = 64
    for it in range(n_steps):
        x, y = make_dataset(batch, seed=it)
        params, opt_state, loss, acc = step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
        if it % 50 == 0 or it == n_steps - 1:
            vloss, vacc = loss_fn(params, val_x, val_y)
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
    vloss, vacc = loss_fn(params, val_x, val_y)
    print(f"saved {os.path.normpath(out)} (val acc {float(vacc):.3f})")


if __name__ == "__main__":
    main()
