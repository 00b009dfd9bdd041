# SPDX-License-Identifier: Apache-2.0
"""Whisper-compatible log-mel spectrogram frontend, MXU-friendly.

Replaces the reference's whisper.cpp mel stage (the reference delegates to
whisper.cpp inside ``plugins/native/whisper``). Parameters follow the Whisper
recipe: 16 kHz, n_fft=400, hop=160, Hann window, 80 (or 128) slaney-norm mel
bands, ``log10(clip(.,1e-10))`` then dynamic-range compression
``max(log, max-8); (log+4)/4``.

TPU design: the DFT is computed as two real matmuls with precomputed
cos/sin bases ``[n_fft, n_fft//2+1]`` — small-N FFTs lower poorly to TPU,
while a 400×201 matmul rides the MXU and XLA fuses the window + power +
mel-projection chain into it. Batched over sessions: ``[batch, samples]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mel_filterbank", "log_mel_spectrogram", "N_FFT", "HOP_LENGTH", "SAMPLE_RATE"]

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(n_mels: int = 80, sample_rate: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank ``[n_mels, n_fft//2+1]``
    (equivalent to ``librosa.filters.mel`` defaults, as Whisper ships)."""
    fft_freqs = np.fft.rfftfreq(n_fft, d=1.0 / sample_rate)
    mel_min, mel_max = _hz_to_mel(np.array(0.0)), _hz_to_mel(np.array(sample_rate / 2))
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# numpy-valued caches: values enter jitted code as XLA constants (never
# cache jax arrays created under a trace — tracer-leak hazard).
@functools.lru_cache(maxsize=4)
def _dft_bases(n_fft: int):
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    window = np.hanning(n_fft + 1)[:-1]  # periodic Hann, matches torch.hann_window
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


@functools.lru_cache(maxsize=4)
def _mel_mat(n_mels: int) -> np.ndarray:
    return mel_filterbank(n_mels).T  # [n_freq, n_mels]


def frame_signal(x: jax.Array, n_frames: int, offset: int = 0) -> jax.Array:
    """``[..., samples]`` → overlapping ``[..., n_frames, N_FFT]`` frames
    (hop ``HOP_LENGTH``, frame j starting at ``offset + j·160``) using only
    reshapes and static slices: a 400-sample window spans 3 consecutive
    160-sample rows, so frames = concat of 3 shifted row views, trimmed.
    The equivalent 2-D index gather (``x[..., idx]``) costs ~0.5 µs per
    element PAIR on v5e — seconds per call at 30 s decode windows."""
    rows = n_frames + 2
    need = offset + rows * HOP_LENGTH
    pad = need - x.shape[-1]
    if pad > 0:  # tail rows only feed the sliced-off overhang
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    y = x[..., offset : offset + rows * HOP_LENGTH]
    y = y.reshape(*x.shape[:-1], rows, HOP_LENGTH)
    w = jnp.concatenate(
        [y[..., :-2, :], y[..., 1:-1, :], y[..., 2:, :]], axis=-1
    )  # [..., n_frames, 480]
    return w[..., :N_FFT]


@functools.partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram(audio: jax.Array, n_mels: int = 80) -> jax.Array:
    """``[..., samples] f32 @16kHz → [..., n_frames, n_mels]`` log-mel.

    Matches Whisper's recipe: reflect-pad n_fft//2 each side, drop the final
    frame (Whisper slices ``[:, :-1]``), windowed matmul-DFT, power spectrum,
    mel projection, log10 + dynamic-range compression.
    """
    pad = N_FFT // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    n = x.shape[-1]
    n_frames = 1 + (n - N_FFT) // HOP_LENGTH
    frames = frame_signal(x, n_frames)  # [..., n_frames, n_fft]
    cos_b, sin_b = _dft_bases(N_FFT)
    re = jnp.matmul(frames, cos_b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im  # [..., n_frames, n_freq]
    power = power[..., :-1, :]  # whisper drops the last frame
    mel = jnp.matmul(power, _mel_mat(n_mels), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0
