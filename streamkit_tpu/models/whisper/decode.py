# SPDX-License-Identifier: Apache-2.0
"""Greedy decoding for Whisper — batched, jitted, static-shaped.

The reference transcribes whole VAD segments with whisper.cpp ``full()``
(``plugins/native/whisper/src/lib.rs:404-490``). Here the decode loop is a
``lax.while_loop`` over a jitted single-token step with a preallocated KV
cache: one compilation per (batch, max_len) bucket, then pure device
execution. Batched over sessions for the continuous batcher.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.mel import log_mel_spectrogram
from .config import WhisperConfig
from .model import Params, decode_logits, decode_step, encode, init_kv_cache

__all__ = ["greedy_decode", "transcribe_window", "transcribe_ring", "pad_or_trim", "N_SAMPLES_30S"]

N_SAMPLES_30S = 30 * 16_000


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES_30S) -> np.ndarray:
    """Whisper's fixed 30 s window: zero-pad or trim."""
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
    return np.pad(audio, pad)


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_tokens", "cross_kv_int8", "with_logprobs")
)
def _greedy_loop(
    params: Params,
    cfg: WhisperConfig,
    audio_states: jnp.ndarray,  # [batch, n_audio_ctx, d]
    prefix: jnp.ndarray,  # [batch, n_prefix] forced tokens
    max_tokens: int,
    cross_kv_int8: bool = False,
    token_caps: Optional[jnp.ndarray] = None,  # [batch] per-row budget
    suppress_bias: Optional[jnp.ndarray] = None,  # [n_vocab] f32 added to
    # every step's logits (-inf at suppressed ids: the whisper.cpp
    # suppress_nst non-speech set)
    begin_bias: Optional[jnp.ndarray] = None,  # [n_vocab] extra bias for the
    # FIRST sampled token only (suppress_blank: " " and eot at begin)
    with_logprobs: bool = False,  # also return summed chosen-token logprobs
    # (confidence — the reference's whisper.cpp wrapper reports None)
):  # -> (tokens, lengths) or (tokens, lengths, lp_sum) with with_logprobs
    """Greedy decode → (tokens [batch, max_tokens], lengths [batch]).

    ``token_caps`` bounds each row's emission (over-generation guard: real
    speech averages ~2.5 tok/s, so a row covering n seconds of audio never
    needs more than ~4n tokens — whisper.cpp applies the same per-segment
    bound). The batch exits when every row is done OR capped, so short
    partial segments stop paying for the full static budget."""
    batch = audio_states.shape[0]
    n_prefix = prefix.shape[1]
    cache = init_kv_cache(
        params, cfg, audio_states, max_len=max_tokens + n_prefix,
        cross_kv_int8=cross_kv_int8,
    )
    eot = jnp.int32(cfg.token_eot)

    # feed the forced prefix (one step at a time keeps the cache layout simple;
    # prefix is ≤4 tokens so this costs 4 steps)
    def feed(i, carry):
        cache, _ = carry
        logits, cache = decode_step(params, cfg, prefix[:, i], cache)
        return cache, logits

    cache, logits = jax.lax.fori_loop(0, n_prefix, feed, (cache, jnp.zeros((batch, cfg.n_vocab))))

    caps = (
        jnp.full((batch,), max_tokens, jnp.int32)
        if token_caps is None
        else jnp.clip(token_caps.astype(jnp.int32), 1, max_tokens)
    )
    if suppress_bias is not None:
        logits = logits + suppress_bias
    if begin_bias is not None:
        logits = logits + begin_bias

    def chosen_lp(logits, tok):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0]

    tokens0 = jnp.full((batch, max_tokens), eot, dtype=jnp.int32)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first)
    done0 = jnp.logical_or(first == eot, caps <= 1)
    # lp_sum covers CONTENT tokens only (the same set `lengths` counts):
    # including the terminal eot would deflate short segments' confidence
    lp0 = (
        jnp.where(first == eot, 0.0, chosen_lp(logits, first))
        if with_logprobs
        else jnp.zeros((batch,), jnp.float32)
    )

    def cond(carry):
        i, _, _, done, _ = carry
        return jnp.logical_and(i < max_tokens - 1, ~jnp.all(done))

    def body(carry):
        i, tokens, cache, done, lp_sum = carry
        logits, cache = decode_step(params, cfg, tokens[:, i], cache)
        if suppress_bias is not None:
            logits = logits + suppress_bias
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eot, nxt)
        if with_logprobs:
            lp_sum = lp_sum + jnp.where(
                jnp.logical_or(done, nxt == eot), 0.0, chosen_lp(logits, nxt)
            )
        tokens = tokens.at[:, i + 1].set(nxt)
        done = jnp.logical_or(done, jnp.logical_or(nxt == eot, i + 2 > caps))
        return i + 1, tokens, cache, done, lp_sum

    _, tokens, _, done, lp_sum = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens0, cache, done0, lp0)
    )
    lengths = jnp.sum((tokens != eot).astype(jnp.int32), axis=-1)
    if with_logprobs:
        return tokens, lengths, lp_sum
    return tokens, lengths


def greedy_decode(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,  # [batch, 3000, n_mels]
    language_index: int = 0,
    task: str = "transcribe",
    max_tokens: int = 224,
    cross_kv_int8: Optional[bool] = None,
    suppress_bias: Optional[jnp.ndarray] = None,
    begin_bias: Optional[jnp.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode + greedy decode with the standard forced prefix
    ``<|sot|><|lang|><|task|><|notimestamps|>``.

    ``cross_kv_int8`` defaults to on for bf16 serving (halves the dominant
    decode HBM stream; scores shift below greedy sensitivity) and off for
    f32 parity paths. Override explicitly or via ``SK_KV_INT8=0``."""
    import os

    audio_states = encode(params, cfg, mel)
    if cross_kv_int8 is None:
        cross_kv_int8 = (
            audio_states.dtype == jnp.bfloat16
            and os.environ.get("SK_KV_INT8", "1") == "1"
        )
    batch = mel.shape[0]
    task_token = cfg.token_transcribe if task == "transcribe" else cfg.token_translate
    prefix = jnp.broadcast_to(
        jnp.asarray(
            [cfg.token_sot, cfg.token_language(language_index), task_token, cfg.token_no_timestamps],
            dtype=jnp.int32,
        ),
        (batch, 4),
    )
    tokens, lengths = _greedy_loop(
        params, cfg, audio_states, prefix, max_tokens, cross_kv_int8=cross_kv_int8,
        suppress_bias=suppress_bias, begin_bias=begin_bias,
    )
    return np.asarray(tokens), np.asarray(lengths)


def transcribe_window(
    params: Params,
    cfg: WhisperConfig,
    audio_16k: np.ndarray,  # [samples] or [batch, samples] f32 @16 kHz
    window_samples: int = N_SAMPLES_30S,
    **kw,
) -> Tuple[np.ndarray, np.ndarray]:
    """Audio → mel → tokens for one window (batched).

    ``window_samples`` < 30 s enables chunked-encoder streaming buckets:
    the mel/encoder run over the shorter context (position table sliced),
    cutting transfer + encode cost for short segments/partials.
    """
    squeeze = audio_16k.ndim == 1
    if squeeze:
        audio_16k = audio_16k[None]
    audio = pad_or_trim(audio_16k, window_samples)
    mel = log_mel_spectrogram(jnp.asarray(audio), cfg.n_mels)
    # match param dtype (bf16 params expect bf16 activations)
    param_dtype = params["enc"]["conv1"]["w"].dtype
    mel = mel.astype(param_dtype)
    tokens, lengths = greedy_decode(params, cfg, mel, **kw)
    return tokens, lengths


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "window_samples", "max_tokens", "cross_kv_int8", "with_logprobs"),
)
def _ring_stt(
    params: Params,
    cfg: WhisperConfig,
    ring: jnp.ndarray,  # [slots, ring_samples] int16 (SessionAudioRing)
    slot_ids: jnp.ndarray,  # [B]
    starts: jnp.ndarray,  # [B] absolute sample positions
    lengths: jnp.ndarray,  # [B] valid samples (<= window_samples)
    lang_rows: jnp.ndarray,  # [B] language indices (per-row: sessions with
    # different — possibly auto-detected — languages share one batch)
    window_samples: int,
    max_tokens: int,
    cross_kv_int8: bool,
    suppress_bias: Optional[jnp.ndarray] = None,
    begin_bias: Optional[jnp.ndarray] = None,
    with_logprobs: bool = False,
):
    from ...engine.audio_ring import gather_ring_window

    audio = gather_ring_window(ring, slot_ids, starts, lengths, window_samples)
    mel = log_mel_spectrogram(audio, cfg.n_mels)
    param_dtype = params["enc"]["conv1"]["w"].dtype
    audio_states = encode(params, cfg, mel.astype(param_dtype))
    # per-row token budget from actual audio length: ~4 tok/s + slack
    token_caps = lengths // 4000 + 4
    lang_rows = lang_rows.astype(jnp.int32)
    prefix = jnp.stack(
        [
            jnp.full_like(lang_rows, cfg.token_sot),
            jnp.int32(cfg.token_sot + 1) + lang_rows,  # token_language(i)
            jnp.full_like(lang_rows, cfg.token_transcribe),
            jnp.full_like(lang_rows, cfg.token_no_timestamps),
        ],
        axis=1,
    )
    return _greedy_loop(params, cfg, audio_states, prefix, max_tokens,
                        cross_kv_int8=cross_kv_int8, token_caps=token_caps,
                        suppress_bias=suppress_bias, begin_bias=begin_bias,
                        with_logprobs=with_logprobs)


@functools.partial(jax.jit, static_argnames=("cfg", "window_samples"))
def _ring_detect(
    params: Params,
    cfg: WhisperConfig,
    ring: jnp.ndarray,
    slot_ids: jnp.ndarray,
    starts: jnp.ndarray,
    lengths: jnp.ndarray,
    window_samples: int,
) -> jnp.ndarray:
    """Language auto-detection (whisper.cpp ``language=auto`` semantics):
    one decoder step after ``<|sot|>``, argmax over the language-token
    block. Returns [B] language indices."""
    from ...engine.audio_ring import gather_ring_window

    audio = gather_ring_window(ring, slot_ids, starts, lengths, window_samples)
    mel = log_mel_spectrogram(audio, cfg.n_mels)
    param_dtype = params["enc"]["conv1"]["w"].dtype
    audio_states = encode(params, cfg, mel.astype(param_dtype))
    sot = jnp.full((audio.shape[0], 1), cfg.token_sot, jnp.int32)
    logits = decode_logits(params, cfg, sot, audio_states)[:, -1]
    block = jax.lax.dynamic_slice_in_dim(
        logits, cfg.token_sot + 1, cfg.n_languages, axis=-1
    )
    return jnp.argmax(block, axis=-1).astype(jnp.int32)


def detect_language_ring(params, cfg, ring, slot_ids, starts, lengths,
                         window_samples: int) -> jnp.ndarray:
    """Public wrapper for the batched ring language detector."""
    return _ring_detect(
        params, cfg, ring,
        jnp.asarray(slot_ids, jnp.int32),
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        window_samples,
    )


def transcribe_ring(
    params: Params,
    cfg: WhisperConfig,
    ring,
    slot_ids: np.ndarray,
    starts: np.ndarray,
    lengths: np.ndarray,
    window_samples: int,
    language_index: int = 0,
    max_tokens: int = 224,
    cross_kv_int8: Optional[bool] = None,
    suppress_bias: Optional[jnp.ndarray] = None,
    begin_bias: Optional[jnp.ndarray] = None,
    with_logprobs: bool = False,
):
    """Decode straight from device-resident audio rings: the submission
    carries three scalars per session instead of a padded audio window
    (mel + encode + greedy decode fused into ONE device call — partial
    buckets are small enough that the fused program's peak fits; the full
    30 s window at batch ≳ 22 should keep using the split encode/decode
    path, see PERF_NOTES.md)."""
    import os

    if cross_kv_int8 is None:
        param_dtype = params["enc"]["conv1"]["w"].dtype
        cross_kv_int8 = (
            param_dtype == jnp.bfloat16 and os.environ.get("SK_KV_INT8", "1") == "1"
        )
    lang_rows = (
        jnp.full((np.asarray(slot_ids).shape[0],), language_index, jnp.int32)
        if np.isscalar(language_index) or getattr(language_index, "ndim", 1) == 0
        else jnp.asarray(language_index, jnp.int32)
    )
    return _ring_stt(
        params, cfg, ring,
        jnp.asarray(slot_ids, jnp.int32),
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        lang_rows,
        window_samples=window_samples, max_tokens=max_tokens,
        cross_kv_int8=cross_kv_int8,
        suppress_bias=suppress_bias, begin_bias=begin_bias,
        with_logprobs=with_logprobs,
    )


def detect_language_window(params, cfg, audio_16k: np.ndarray) -> int:
    """Language auto-detection on a raw audio window (non-batched path):
    one decoder step after ``<|sot|>``, argmax over the language block."""
    audio = pad_or_trim(np.asarray(audio_16k)[None] if np.asarray(audio_16k).ndim == 1
                        else np.asarray(audio_16k), N_SAMPLES_30S)
    mel = log_mel_spectrogram(jnp.asarray(audio), cfg.n_mels)
    param_dtype = params["enc"]["conv1"]["w"].dtype
    audio_states = encode(params, cfg, mel.astype(param_dtype))
    sot = jnp.full((audio.shape[0], 1), cfg.token_sot, jnp.int32)
    logits = decode_logits(params, cfg, sot, audio_states)[:, -1]
    block = logits[:, cfg.token_sot + 1 : cfg.token_sot + 1 + cfg.n_languages]
    return int(jnp.argmax(block, axis=-1)[0])
