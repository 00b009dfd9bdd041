# SPDX-License-Identifier: Apache-2.0
"""Elementwise/mixing DSP kernels (gain, mix, channel + sample-format convert).

These are the device counterparts of the reference's CPU loops:

* gain — COW in-place multiply (``nodes/src/audio/filters/gain.rs:188``)
* mix  — f32 sequential accumulation with channel up/down-mix
  (``nodes/src/audio/filters/mixer.rs:1027-1090``): mono→stereo duplicates,
  stereo→mono averages ``(L+R)*0.5``, generic cyclic mapping; **no clamping**.
* convert — s16le↔f32 PCM conversion.

All kernels are shape-polymorphic over a leading batch dimension so the
dynamic engine's continuous batcher can fuse many sessions into one device
call. Accumulation order is left-to-right in input order, preserving the
reference's exact f32 summation order (bit-parity requirement, BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "apply_gain",
    "mix_frames",
    "convert_channels",
    "s16le_to_f32",
    "f32_to_s16le",
]


@jax.jit
def apply_gain(samples: jax.Array, gain: jax.Array) -> jax.Array:
    """Multiply samples by a scalar gain (f32, no clamp).

    ``gain`` is a traced scalar — live UpdateParams retunes it with **no
    recompile** (reference tunes per-packet; we tune per-call).
    """
    return samples * jnp.asarray(gain, dtype=samples.dtype)


def convert_channels(samples: jax.Array, src_channels: int, dst_channels: int) -> jax.Array:
    """Channel up/down-mix on interleaved PCM ``[..., frames*src_channels]``.

    Matches reference ``mixer.rs:1047-1078``: mono→stereo duplicate,
    stereo→mono ``(L+R)*0.5``, generic cyclic channel mapping.
    Static channel counts → fully unrolled, fusable gather.
    """
    if src_channels == dst_channels:
        return samples
    *lead, n = samples.shape
    frames = n // src_channels
    x = samples.reshape(*lead, frames, src_channels)
    if src_channels == 1 and dst_channels == 2:
        y = jnp.repeat(x, 2, axis=-1)
    elif src_channels == 2 and dst_channels == 1:
        y = (x[..., 0:1] + x[..., 1:2]) * jnp.float32(0.5)
    else:
        idx = np.arange(dst_channels) % src_channels
        y = x[..., idx]
    return y.reshape(*lead, frames * dst_channels)


def mix_frames(inputs, src_channels, dst_channels: int, out_samples: int) -> jax.Array:
    """Mix N interleaved inputs into one buffer of ``out_samples``.

    ``inputs``: list of arrays ``[..., n_i]``; ``src_channels``: per-input
    channel count. Inputs shorter than the output (after channel conversion)
    are zero-padded (reference mixes ``min`` length into a zeroed buffer).
    Left-to-right accumulation preserves f32 summation order.
    """
    acc = jnp.zeros(inputs[0].shape[:-1] + (out_samples,), dtype=jnp.float32)
    for x, ch in zip(inputs, src_channels):
        y = convert_channels(x, ch, dst_channels)
        n = y.shape[-1]
        if n < out_samples:
            pad = [(0, 0)] * (y.ndim - 1) + [(0, out_samples - n)]
            y = jnp.pad(y, pad)
        elif n > out_samples:
            y = y[..., :out_samples]
        acc = acc + y
    return acc


@jax.jit
def s16le_to_f32(samples: jax.Array) -> jax.Array:
    """int16 PCM → float32 in [-1, 1): x / 32768."""
    return samples.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)


@jax.jit
def f32_to_s16le(samples: jax.Array) -> jax.Array:
    """float32 → int16 PCM with clamp + round-half-away-from-zero.

    Half-away matches Rust ``f32::round`` (the reference's conversion
    convention); ``jnp.round`` would be IEEE half-to-even and differ by
    1 LSB on exact-half inputs (tested against the reference-golden
    fixtures in tests/test_golden_dsp.py)."""
    x = jnp.clip(samples * jnp.float32(32768.0), -32768.0, 32767.0)
    rounded = jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))
    return rounded.astype(jnp.int16)
