# SPDX-License-Identifier: Apache-2.0
"""Shared seq2seq decoder-cache layout (Marian + NLLB cached greedy).

One definition of the per-decoder-layer (self_k, self_v, cross_k, cross_v)
tuple — cross K/V computed once from the encoder states, self K/V
preallocated ``[b, max_t, d]`` buffers written incrementally (the whisper
decode.py layout). The model passes its own ``dense`` so per-model matmul
semantics (accumulation dtype) are preserved.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax.numpy as jnp

__all__ = ["init_decoder_cache"]


def init_decoder_cache(
    dec_layers,
    enc_states: jnp.ndarray,
    d_model: int,
    max_t: int,
    dense: Callable,
) -> List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    b = enc_states.shape[0]
    cache = []
    for layer in dec_layers:
        ck = dense(enc_states, layer["xattn"]["k"])
        cv = dense(enc_states, layer["xattn"]["v"])
        sk = jnp.zeros((b, max_t, d_model), enc_states.dtype)
        cache.append((sk, jnp.zeros_like(sk), ck, cv))
    return cache
