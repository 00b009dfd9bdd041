# SPDX-License-Identifier: Apache-2.0
"""Voice-activity detection: per-frame speech probability on-device.

The reference gates Whisper with Silero VAD over 512-sample (32 ms @16 kHz)
frames with RNN state + 64-sample context (``plugins/native/whisper/src/
vad.rs:19-60``). Silero ONNX weights are not redistributable here, so this
module provides:

two backends behind one contract (512-sample frames → prob per frame,
carried per-session state pytree, batched over sessions):

* **learned** (default when weights are present) — the Silero-class LSTM
  scorer in :mod:`streamkit_tpu.models.silero_vad`, state ``(h, c, context)``
  ≙ the reference's ``[2, B, 128]`` + 64-sample context. Weights come from
  ``SK_VAD_WEIGHTS`` or the bundled ``models/weights/vad_synth.npz``
  (trained offline on synthesized speech/noise, ``tools/train_vad.py``).
* **spectral** (fallback; force with ``SK_VAD_BACKEND=spectral``) — a
  deterministic weight-free scorer: band-limited speech energy (200–4000 Hz),
  spectral flatness, adaptive noise floor with attack/decay EMA.

The backend is resolved once, at first use — slot tables persist state rows
whose pytree structure must not change afterwards.

The host-side segmentation state machine (min-silence 700 ms, max-segment
30 s) lives in the whisper node, mirroring ``whisper/src/lib.rs:404-490``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "VadState",
    "vad_init_state",
    "vad_frame_probs",
    "vad_backend",
    "load_vad_weights",
    "VAD_FRAME",
    "VAD_CONTEXT",
]

VAD_FRAME = 512  # 32 ms @ 16 kHz, reference vad.rs:19
VAD_CONTEXT = 64  # samples of left context, reference vad.rs:23
_SR = 16_000


class VadState(NamedTuple):
    noise_floor: jax.Array  # [...] EMA of noise energy (log domain)
    context: jax.Array  # [..., VAD_CONTEXT] previous samples
    prob_ema: jax.Array  # [...] smoothed probability


def _spectral_init_state(batch_shape=()) -> VadState:
    return VadState(
        noise_floor=jnp.full(batch_shape, -6.0, dtype=jnp.float32),
        context=jnp.zeros(batch_shape + (VAD_CONTEXT,), dtype=jnp.float32),
        prob_ema=jnp.zeros(batch_shape, dtype=jnp.float32),
    )


@functools.lru_cache(maxsize=1)
def _band_bases():
    """Windowed DFT bases restricted to the speech band (200–4000 Hz).

    Returns numpy arrays — they enter jitted code as XLA constants, never as
    traced values (avoids tracer leaks via the cache).
    """
    n = VAD_FRAME + VAD_CONTEXT
    freqs = np.fft.rfftfreq(n, d=1.0 / _SR)
    keep = (freqs >= 200.0) & (freqs <= 4000.0)
    k = np.arange(n)[:, None]
    f = np.nonzero(keep)[0][None, :]
    ang = -2.0 * np.pi * k * f / n
    w = np.hanning(n)[:, None]
    return (
        (np.cos(ang) * w).astype(np.float32),
        (np.sin(ang) * w).astype(np.float32),
    )


@jax.jit
def _spectral_frame_probs(state: VadState, frames: jax.Array) -> tuple:
    """Score a block of VAD frames.

    ``frames``: ``[..., n_frames, VAD_FRAME]`` f32 @16 kHz.
    Returns ``(probs [..., n_frames], new_state)``.

    Heuristic scorer: speech-band SNR over an adaptive noise floor, weighted
    by spectral spread (speech has formant structure; hiss is flat, tones are
    too narrow). EMA attack/decay gives Silero-like hangover behaviour.
    """
    def step(st: VadState, frame: jax.Array):
        x = jnp.concatenate([st.context, frame], axis=-1)  # [..., 576]
        cos_b, sin_b = _band_bases()
        re = jnp.matmul(x, cos_b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(x, sin_b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        power = re * re + im * im  # [..., n_band]
        band_energy = jnp.mean(power, axis=-1)
        log_e = jnp.log(band_energy + 1e-10)
        # spectral spread: ratio of geometric to arithmetic mean (flatness)
        log_power = jnp.log(power + 1e-10)
        flatness = jnp.exp(jnp.mean(log_power, axis=-1)) / (band_energy + 1e-10)
        structure = 1.0 - jnp.clip(flatness * 4.0, 0.0, 1.0)  # 1 = structured
        # adaptive noise floor: fast decay toward quiet, slow rise
        is_quieter = log_e < st.noise_floor
        alpha = jnp.where(is_quieter, 0.3, 0.005)
        new_floor = st.noise_floor + alpha * (log_e - st.noise_floor)
        snr = log_e - new_floor  # nats above noise floor
        raw = jax.nn.sigmoid(2.0 * (snr - 1.5)) * (0.5 + 0.5 * structure)
        # attack fast, release slow (hangover)
        beta = jnp.where(raw > st.prob_ema, 0.7, 0.3)
        prob = st.prob_ema + beta * (raw - st.prob_ema)
        new_state = VadState(new_floor, x[..., -VAD_CONTEXT:], prob)
        return new_state, prob

    # scan over the frame axis (second-to-last)
    frames_t = jnp.moveaxis(frames, -2, 0)  # [n_frames, ..., VAD_FRAME]
    new_state, probs_t = jax.lax.scan(step, state, frames_t)
    return jnp.moveaxis(probs_t, 0, -1), new_state


# ---------------------------------------------------------------------------
# backend dispatch

_BACKEND = None  # "learned" | "spectral", frozen at first use
_LEARNED_APPLY = None


def _bundled_weights_path() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "models",
        "weights",
        "vad_synth.npz",
    )


def load_vad_weights(path: str) -> None:
    """Install learned-VAD weights (must happen before any state is created)."""
    global _BACKEND, _LEARNED_APPLY
    from ..models import silero_vad as sv

    params = sv.load_params(path)  # raises on schema mismatch

    @jax.jit
    def apply_fn(state, frames):
        return sv.apply(params, state, frames)

    _LEARNED_APPLY = apply_fn
    _BACKEND = "learned"


def _ensure_backend() -> str:
    global _BACKEND
    if _BACKEND is not None:
        return _BACKEND
    import os

    forced = os.environ.get("SK_VAD_BACKEND", "").lower()
    if forced == "spectral":
        _BACKEND = "spectral"
        return _BACKEND
    path = os.environ.get("SK_VAD_WEIGHTS") or _bundled_weights_path()
    if os.path.exists(path):
        try:
            load_vad_weights(path)
            return _BACKEND
        except Exception:
            if os.environ.get("SK_VAD_WEIGHTS"):
                raise  # an explicitly requested weights file must load
    _BACKEND = "spectral"
    return _BACKEND


def vad_backend() -> str:
    """Resolved backend name ("learned" or "spectral")."""
    return _ensure_backend()


def vad_init_state(batch_shape=()):
    if _ensure_backend() == "learned":
        from ..models import silero_vad as sv

        return sv.init_state(batch_shape)
    return _spectral_init_state(batch_shape)


def vad_frame_probs(state, frames: jax.Array) -> tuple:
    """Score VAD frames: ``[..., n_frames, VAD_FRAME]`` f32 @16 kHz →
    ``(probs [..., n_frames], new_state)``. Dispatches to the resolved
    backend; both carry per-row state pytrees suitable for slot tables."""
    if _ensure_backend() == "learned":
        return _LEARNED_APPLY(state, frames)
    return _spectral_frame_probs(state, frames)
