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


def beam_decode(
    step_fn,
    cache,
    first_logits,
    b: int,
    beam: int,
    max_tokens: int,
    eos_id: int,
    pad_id: int,
    start_step: int,
    length_penalty: float = 1.0,
):
    """Batched beam search over a cached single-token decoder.

    The reference exposes ``beam_size`` on its CTranslate2 translation
    plugins (``plugins/native/nllb/src/lib.rs`` config); this is the
    TPU-native equivalent: a fully jittable ``lax.while_loop`` where every
    step re-indexes the KV cache rows by parent beam with one gather.

    ``step_fn(tok [b*beam], step, cache) -> (logits [b*beam, V], cache)``;
    ``cache`` is any pytree whose leaves have a leading ``b*beam`` row axis
    (pre-expanded by the caller, e.g. ``jnp.repeat(leaf, beam, axis=0)``);
    ``first_logits [b, V]`` is the prefix-fed distribution for the first
    generated token; ``start_step`` is that first token's sequence
    position (the prefix occupies positions ``0..start_step-1``).

    Returns (tokens [b, max_tokens] of the best hypothesis, lengths [b]).
    Finished rows continue with forced ``pad`` at zero cost (the standard
    freeze trick), so scores are final log-probs; hypotheses are ranked by
    score / length**length_penalty.
    """
    import jax

    neg_inf = jnp.float32(-1e30)
    v = first_logits.shape[-1]
    logp0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), axis=-1)
    # all beams start identical: mask beams 1.. so top-k picks k distinct
    # first tokens out of beam 0
    init = jnp.where(
        (jnp.arange(beam) == 0)[None, :, None], logp0[:, None, :], neg_inf
    )  # [b, beam, V]
    scores0, idx0 = jax.lax.top_k(init.reshape(b, beam * v), beam)
    tok0 = (idx0 % v).astype(jnp.int32)  # [b, beam]
    tokens0 = jnp.full((b * beam, max_tokens), pad_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0.reshape(-1))
    done0 = tok0.reshape(-1) == eos_id
    lengths0 = jnp.ones((b * beam,), jnp.int32)

    def cond(carry):
        i, _, _, _, _, done = carry
        return jnp.logical_and(i < max_tokens, ~jnp.all(done))

    def body(carry):
        i, tokens, scores, lengths, cache, done = carry
        last = jax.lax.dynamic_index_in_dim(tokens.T, i - 1, 0, keepdims=False)
        # the fed token sits at sequence position start_step + (i - 1)
        logits, cache = step_fn(last, start_step + i - 1, cache)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # frozen rows: pad continues at zero cost, everything else -inf
        frozen = jnp.full((v,), neg_inf).at[pad_id].set(0.0)
        logp = jnp.where(done[:, None], frozen[None, :], logp)
        total = scores.reshape(b, beam, 1) + logp.reshape(b, beam, v)
        new_scores, idx = jax.lax.top_k(total.reshape(b, beam * v), beam)
        parent = idx // v  # [b, beam]
        tok = (idx % v).astype(jnp.int32)
        rows = (jnp.arange(b)[:, None] * beam + parent).reshape(-1)  # [b*beam]
        cache = jax.tree.map(lambda x: x[rows], cache)
        tokens = tokens[rows]
        done = done[rows]
        lengths = lengths[rows]
        tok_flat = tok.reshape(-1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, tok_flat[:, None], i, axis=1
        )
        lengths = jnp.where(done, lengths, lengths + 1)
        done = jnp.logical_or(done, tok_flat == eos_id)
        return i + 1, tokens, new_scores.reshape(b, beam), lengths, cache, done

    _, tokens, scores, lengths, _, _ = jax.lax.while_loop(
        cond,
        body,
        (jnp.int32(1), tokens0, scores0, lengths0, cache, done0),
    )
    norm = scores / jnp.power(
        jnp.maximum(1, lengths.reshape(b, beam)).astype(jnp.float32), length_penalty
    )
    best = jnp.argmax(norm, axis=1)  # [b]
    rows = jnp.arange(b) * beam + best
    return tokens[rows], lengths.reshape(b, beam)[jnp.arange(b), best], scores[jnp.arange(b), best]
