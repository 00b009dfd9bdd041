# SPDX-License-Identifier: Apache-2.0
"""Silero-class learned VAD in JAX.

Mirrors the reference's Silero v6 contract (``plugins/native/whisper/src/
vad.rs:19-60``): 512-sample frames @16 kHz, 64 samples of carried context,
recurrent state shaped ``[2, B, 128]`` (LSTM h,c), one speech probability
per frame.

The architecture is a TPU-friendly re-design of the same shape — windowed
STFT features → per-frame MLP encoder → LSTM(128) carried across frames →
sigmoid head — expressed as batched matmuls and a ``lax.scan`` so hundreds
of session rows score in one device call (the slot-table layout in
``engine/audio_ring.py``).

Weights: any npz matching :data:`PARAM_SHAPES`. The bundled
``weights/vad_synth.npz`` is trained offline (``tools/train_vad.py``) on
synthesized speech/noise (this environment is zero-egress; Silero's own
weights are not redistributable). Real Silero-derived weights can be
dropped in via ``SK_VAD_WEIGHTS``.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LearnedVadState",
    "PARAM_SHAPES",
    "init_params",
    "init_state",
    "apply",
    "load_params",
    "save_params",
]

FRAME = 512
CONTEXT = 64
N_FFT = 256
N_BINS = N_FFT // 2 + 1
# STFT frame offsets inside the 576-sample (context+frame) window
_OFFSETS = (0, 128, 256, 320)
ENC_DIM = 64
HIDDEN = 128


class LearnedVadState(NamedTuple):
    h: jax.Array  # [..., HIDDEN]
    c: jax.Array  # [..., HIDDEN]
    context: jax.Array  # [..., CONTEXT]

    def as_silero_layout(self) -> jax.Array:
        """The reference's ``[2, batch, 128]`` state tensor (vad.rs:49)."""
        return jnp.stack([self.h, self.c], axis=0)


PARAM_SHAPES: Dict[str, Tuple[int, ...]] = {
    "enc_w": (N_BINS, ENC_DIM),
    "enc_b": (ENC_DIM,),
    "lstm_wx": (ENC_DIM, 4 * HIDDEN),
    "lstm_wh": (HIDDEN, 4 * HIDDEN),
    "lstm_b": (4 * HIDDEN,),
    "head_w1": (HIDDEN, ENC_DIM),
    "head_b1": (ENC_DIM,),
    "head_w2": (ENC_DIM, 1),
    "head_b2": (1,),
}


def init_params(seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    params = {}
    for name, shape in PARAM_SHAPES.items():
        if name.endswith("_b"):
            params[name] = np.zeros(shape, np.float32)
        else:
            fan_in = shape[0]
            params[name] = (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(np.float32)
    # forget-gate bias init: keeps early training stable
    params["lstm_b"][HIDDEN : 2 * HIDDEN] = 1.0
    return params


def init_state(batch_shape=()) -> LearnedVadState:
    return LearnedVadState(
        h=jnp.zeros(batch_shape + (HIDDEN,), jnp.float32),
        c=jnp.zeros(batch_shape + (HIDDEN,), jnp.float32),
        context=jnp.zeros(batch_shape + (CONTEXT,), jnp.float32),
    )


@functools.lru_cache(maxsize=1)
def _stft_bases():
    """Windowed DFT bases as XLA constants (numpy, not traced)."""
    k = np.arange(N_FFT)[:, None]
    f = np.arange(N_BINS)[None, :]
    ang = -2.0 * np.pi * k * f / N_FFT
    w = np.hanning(N_FFT)[:, None]
    return (np.cos(ang) * w).astype(np.float32), (np.sin(ang) * w).astype(np.float32)


def _features(x: jax.Array) -> jax.Array:
    """``[..., 576]`` window → ``[..., len(_OFFSETS), N_BINS]`` log-magnitudes."""
    cos_b, sin_b = _stft_bases()
    frames = jnp.stack([x[..., o : o + N_FFT] for o in _OFFSETS], axis=-2)
    re = jnp.matmul(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
    return jnp.log1p(jnp.sqrt(re * re + im * im) * 32.0)


def _lstm_cell(params, x, h, c):
    gates = x @ params["lstm_wx"] + h @ params["lstm_wh"] + params["lstm_b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def apply(
    params: Dict[str, jax.Array], state: LearnedVadState, frames: jax.Array
) -> Tuple[jax.Array, LearnedVadState]:
    """Score frames: ``[..., n_frames, FRAME]`` → (probs ``[..., n_frames]``,
    new state). Differentiable; jit/vmap-safe; batch dims ride through."""

    def step(st: LearnedVadState, frame: jax.Array):
        x = jnp.concatenate([st.context, frame], axis=-1)  # [..., 576]
        feats = _features(x)  # [..., T, N_BINS]
        enc = jax.nn.relu(feats @ params["enc_w"] + params["enc_b"])  # [..., T, E]
        h, c = st.h, st.c
        for t in range(len(_OFFSETS)):  # T is tiny & static: unrolled
            h, c = _lstm_cell(params, enc[..., t, :], h, c)
        z = jax.nn.relu(h @ params["head_w1"] + params["head_b1"])
        logit = (z @ params["head_w2"] + params["head_b2"])[..., 0]
        prob = jax.nn.sigmoid(logit)
        return LearnedVadState(h, c, x[..., -CONTEXT:]), prob

    frames_t = jnp.moveaxis(frames, -2, 0)
    new_state, probs_t = jax.lax.scan(step, state, frames_t)
    return jnp.moveaxis(probs_t, 0, -1), new_state


def save_params(params: Dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path)
    params = {}
    for name, shape in PARAM_SHAPES.items():
        if name not in data:
            raise ValueError(f"VAD weights file missing parameter {name!r}")
        arr = np.asarray(data[name], np.float32)
        if arr.shape != shape:
            raise ValueError(f"VAD weight {name}: expected {shape}, got {arr.shape}")
        params[name] = arr
    return params
