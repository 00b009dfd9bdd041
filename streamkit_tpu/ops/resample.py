# SPDX-License-Identifier: Apache-2.0
"""Streaming linear-interpolation resampler (fixed input chunk).

TPU-native counterpart of the reference's rubato ``FastFixedIn`` with
``PolynomialDegree::Linear`` (``nodes/src/audio/filters/resampler.rs:232-244``):

* fixed ``chunk_frames`` input per call (default 960 = 20 ms @ 48 kHz),
* per-output-sample linear interpolation ``s0 + (s1 - s0) * frac`` in f32,
* one history frame carried between chunks for boundary continuity.

Two deliberate improvements over the reference:

* **Exact rational phase.** Source position is tracked as an integer
  numerator modulo the output rate (reduced by gcd), so there is *zero*
  phase drift over unbounded stream length — rubato's f64 accumulator
  drifts a few samples per hour at irrational ratios.
* **Static shapes.** Output length per chunk varies by ±1 with phase, which
  would force XLA recompiles. We emit a fixed ``max_out`` output plus a valid
  count; the node's Opus-frame re-framer consumes (data, n_valid) pairs, so
  no dynamic shape ever reaches the compiler.

The kernel is a pure gather+lerp (VPU), shape-polymorphic over a leading
batch dimension for the dynamic engine's continuous batcher: per-session
state is just ``(phase_num int32, history [channels] f32)`` rows in HBM.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LinearResampler", "max_output_frames", "resample_chunk"]


def max_output_frames(chunk_frames: int, src_rate: int, dst_rate: int) -> int:
    """Static upper bound on output frames per chunk."""
    return int(math.floor(chunk_frames * dst_rate / src_rate)) + 2


@functools.partial(jax.jit, static_argnames=("src_num", "dst_num", "max_out"))
def resample_chunk(
    history: jax.Array,  # [..., channels] last input frame of previous chunk
    chunk: jax.Array,  # [..., frames, channels] deinterleaved input
    phase_num: jax.Array,  # [...] int32, source position numerator (units: 1/dst_num src samples)
    src_num: int,  # reduced source rate (src_rate / gcd)
    dst_num: int,  # reduced destination rate (dst_rate / gcd)
    max_out: int,
) -> tuple:
    """Resample one fixed-size chunk.

    Source timeline: index 0 is ``history``, 1..frames are ``chunk``. Output
    k is taken at exact source position ``(phase_num + k*src_num) / dst_num``;
    valid while it needs no sample beyond the chunk.

    Returns ``(out [..., max_out, channels], n_valid [...],
    new_phase_num [...], new_history [..., channels])``.
    """
    frames = chunk.shape[-2]
    src = jnp.concatenate([history[..., None, :], chunk], axis=-2)  # frames+1 samples
    k = jnp.arange(max_out, dtype=jnp.int32)
    pos_num = phase_num[..., None] + k * jnp.int32(src_num)  # [..., max_out]
    idx0 = pos_num // jnp.int32(dst_num)
    frac = (pos_num % jnp.int32(dst_num)).astype(jnp.float32) * jnp.float32(1.0 / dst_num)
    valid = idx0 < frames  # lerp needs src[idx0+1] <= src[frames]
    idx0c = jnp.clip(idx0, 0, frames - 1)
    s0 = jnp.take_along_axis(src, idx0c[..., None], axis=-2)
    s1 = jnp.take_along_axis(src, (idx0c + 1)[..., None], axis=-2)
    out = s0 + (s1 - s0) * frac[..., None]  # f32 lerp — reference interp_lin form
    out = jnp.where(valid[..., None], out, 0.0)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)
    new_phase_num = phase_num + n_valid * jnp.int32(src_num) - jnp.int32(frames * dst_num)
    new_history = chunk[..., -1, :]
    return out, n_valid, new_phase_num, new_history


@dataclass
class LinearResampler:
    """Host-side stateful wrapper for single-stream use (nodes/tests).

    The dynamic engine calls :func:`resample_chunk` directly with batched
    per-session state rows instead.
    """

    src_rate: int
    dst_rate: int
    chunk_frames: int
    channels: int

    def __post_init__(self) -> None:
        g = math.gcd(self.src_rate, self.dst_rate)
        self.src_num = self.src_rate // g
        self.dst_num = self.dst_rate // g
        # int32 overflow guard: phase_num + max_out*src_num must fit in int32
        self.max_out = max_output_frames(self.chunk_frames, self.src_rate, self.dst_rate)
        if (self.dst_num + self.max_out * self.src_num) >= 2**31:
            raise ValueError("sample-rate ratio too extreme for int32 phase tracking")
        # first output at source position 1.0 (= first real sample; index 0 is history)
        self._phase_num = jnp.asarray(self.dst_num, dtype=jnp.int32)
        self._history = jnp.zeros((self.channels,), dtype=jnp.float32)

    def process(self, chunk_interleaved: np.ndarray) -> np.ndarray:
        """Resample exactly ``chunk_frames`` interleaved samples; returns the
        valid interleaved output samples."""
        frames = chunk_interleaved.shape[0] // self.channels
        if frames != self.chunk_frames:
            raise ValueError(f"expected {self.chunk_frames} frames, got {frames}")
        chunk = jnp.asarray(chunk_interleaved, dtype=jnp.float32).reshape(frames, self.channels)
        out, n_valid, self._phase_num, self._history = resample_chunk(
            self._history, chunk, self._phase_num, self.src_num, self.dst_num, self.max_out
        )
        n = int(n_valid)
        return np.asarray(out)[:n].reshape(-1)
