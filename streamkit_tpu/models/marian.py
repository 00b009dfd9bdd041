# SPDX-License-Identifier: Apache-2.0
"""Marian NMT (Helsinki-NLP opus-mt) in JAX.

Parity target: the reference's helsinki plugin wraps Marian checkpoints
(``plugins/native/helsinki/``). Architecturally Marian differs from the
NLLB/M2M100 stack in :mod:`streamkit_tpu.models.nllb` — this is a distinct
implementation, not an alias:

* post-layer-norm residual blocks (NLLB is pre-norm)
* fairseq-style sinusoidal positions starting at 0, no padding offset
* SiLU ("swish") FFN activation (NLLB uses ReLU)
* a trained ``final_logits_bias`` added to the output projection
* decoder_start_token_id = pad

Logit parity vs ``transformers.MarianMTModel`` is tested in
``tests/test_marian_model.py``. HF weight loading via
:func:`marian_params_from_hf`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MarianConfig",
    "marian_init_params",
    "marian_encode",
    "marian_decode_logits",
    "marian_greedy_translate",
    "marian_greedy_cached",
    "marian_beam_translate",
    "marian_decode_step",
    "marian_config_from_hf",
    "marian_params_from_hf",
]


@dataclass(frozen=True)
class MarianConfig:
    vocab_size: int = 65001  # opus-mt default (last id = pad)
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    heads: int = 8
    ffn_dim: int = 2048
    max_positions: int = 512
    pad_token_id: int = 65000
    eos_token_id: int = 0
    decoder_start_token_id: int = 65000  # = pad (Marian convention)
    scale_embedding: bool = True  # opus-mt checkpoints scale by sqrt(d)


def _sinusoidal_marian(n_pos: int, dim: int) -> np.ndarray:
    """Marian's position table: [sin block | cos block], position 0-based,
    no zeroed padding row, frequency 10000^(-2k/dim) (HF Marian layout —
    note the /half denominator, unlike fairseq's /(half-1))."""
    half = dim // 2
    freqs = np.power(10000.0, -2.0 * np.arange(half, dtype=np.float64) / dim)
    pos = np.arange(n_pos, dtype=np.float64)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n_pos, 1))], axis=1)
    return table.astype(np.float32)


def marian_init_params(cfg: MarianConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)

    def lin(d_in, d_out):
        return {
            "w": jnp.asarray(rng.standard_normal((d_in, d_out)) * 0.02, dtype),
            "b": jnp.zeros((d_out,), dtype),
        }

    def ln(d):
        return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    def attn(d):
        return {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "o": lin(d, d)}

    d = cfg.d_model

    def enc_layer():
        return {"attn": attn(d), "ln1": ln(d), "fc1": lin(d, cfg.ffn_dim), "fc2": lin(cfg.ffn_dim, d), "ln2": ln(d)}

    def dec_layer():
        return {
            "attn": attn(d),
            "ln1": ln(d),
            "xattn": attn(d),
            "ln_x": ln(d),
            "fc1": lin(d, cfg.ffn_dim),
            "fc2": lin(cfg.ffn_dim, d),
            "ln2": ln(d),
        }

    return {
        "emb": jnp.asarray(rng.standard_normal((cfg.vocab_size, d)) * 0.02, dtype),
        "pos": jnp.asarray(_sinusoidal_marian(cfg.max_positions, d), dtype),
        "logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        "enc_layers": [enc_layer() for _ in range(cfg.encoder_layers)],
        "dec_layers": [dec_layer() for _ in range(cfg.decoder_layers)],
    }


def _ln(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5) * p["g"] + p["b"]


def _dense(x, p):
    return jnp.matmul(x, p["w"], preferred_element_type=x.dtype) + p["b"]


def _attn(q, k, v, n_head, bias=None):
    b, tq, d = q.shape
    tk = k.shape[1]
    hd = d // n_head

    def heads(x, t):
        return x.reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q, tq), heads(k, tk), heads(v, tk)
    scores = jnp.matmul(qh, kh.transpose(0, 1, 3, 2), preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd)
    if bias is not None:
        scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.matmul(w, vh, preferred_element_type=vh.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, d)


def marian_encode(params, cfg: MarianConfig, tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``tokens [b, t]`` → (hidden states, cross-attention bias)."""
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    t = tokens.shape[-1]
    x = params["emb"][tokens] * jnp.asarray(scale, params["emb"].dtype)
    x = x + params["pos"][:t].astype(x.dtype)[None, :, :]
    pad_bias = jnp.where(tokens == cfg.pad_token_id, -jnp.inf, 0.0).astype(jnp.float32)
    bias = pad_bias[:, None, None, :]
    for layer in params["enc_layers"]:
        a = _attn(
            _dense(x, layer["attn"]["q"]),
            _dense(x, layer["attn"]["k"]),
            _dense(x, layer["attn"]["v"]),
            cfg.heads,
            bias,
        )
        x = _ln(x + _dense(a, layer["attn"]["o"]), layer["ln1"])  # post-LN
        h = _dense(jax.nn.silu(_dense(x, layer["fc1"])), layer["fc2"])
        x = _ln(x + h, layer["ln2"])
    return x, bias


def marian_decode_logits(params, cfg: MarianConfig, dec_tokens, enc_states, enc_bias) -> jnp.ndarray:
    """Teacher-forced decoder pass → logits [b, t, vocab]."""
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    t = dec_tokens.shape[-1]
    x = params["emb"][dec_tokens] * jnp.asarray(scale, params["emb"].dtype)
    x = x + params["pos"][:t].astype(x.dtype)[None, :, :]
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    for layer in params["dec_layers"]:
        a = _attn(
            _dense(x, layer["attn"]["q"]),
            _dense(x, layer["attn"]["k"]),
            _dense(x, layer["attn"]["v"]),
            cfg.heads,
            causal,
        )
        x = _ln(x + _dense(a, layer["attn"]["o"]), layer["ln1"])
        a = _attn(
            _dense(x, layer["xattn"]["q"]),
            _dense(enc_states, layer["xattn"]["k"]),
            _dense(enc_states, layer["xattn"]["v"]),
            cfg.heads,
            enc_bias,
        )
        x = _ln(x + _dense(a, layer["xattn"]["o"]), layer["ln_x"])
        h = _dense(jax.nn.silu(_dense(x, layer["fc1"])), layer["fc2"])
        x = _ln(x + h, layer["ln2"])
    logits = jnp.matmul(x, params["emb"].T.astype(x.dtype), preferred_element_type=jnp.float32)
    return logits + params["logits_bias"]


def _marian_init_cache(params, cfg: MarianConfig, enc_states, max_t: int):
    from .seq2seq import init_decoder_cache

    return init_decoder_cache(params["dec_layers"], enc_states, cfg.d_model, max_t, _dense)


def marian_decode_step(params, cfg: MarianConfig, tok, step, cache, enc_bias):
    """One cached decoder step: ``tok [b]`` at position ``step`` →
    (logits [b, vocab], cache). Jit/while_loop-safe (static shapes)."""
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    emb = params["emb"]
    pos = jax.lax.dynamic_index_in_dim(params["pos"], step, 0, keepdims=False)
    x = (emb[tok] * jnp.asarray(scale, emb.dtype) + pos.astype(emb.dtype))[:, None, :]
    max_t = cache[0][0].shape[1]
    self_mask = jnp.where(
        jnp.arange(max_t)[None, None, None, :] <= step, 0.0, -jnp.inf
    ).astype(jnp.float32)
    new_cache = []
    for layer, (sk, sv, ck, cv) in zip(params["dec_layers"], cache):
        k = _dense(x, layer["attn"]["k"])
        v = _dense(x, layer["attn"]["v"])
        sk = jax.lax.dynamic_update_slice_in_dim(sk, k, step, axis=1)
        sv = jax.lax.dynamic_update_slice_in_dim(sv, v, step, axis=1)
        a = _attn(_dense(x, layer["attn"]["q"]), sk, sv, cfg.heads, self_mask)
        x = _ln(x + _dense(a, layer["attn"]["o"]), layer["ln1"])
        a = _attn(_dense(x, layer["xattn"]["q"]), ck, cv, cfg.heads, enc_bias)
        x = _ln(x + _dense(a, layer["xattn"]["o"]), layer["ln_x"])
        h = _dense(jax.nn.silu(_dense(x, layer["fc1"])), layer["fc2"])
        x = _ln(x + h, layer["ln2"])
        new_cache.append((sk, sv, ck, cv))
    logits = jnp.matmul(
        x[:, 0], params["emb"].T.astype(x.dtype), preferred_element_type=jnp.float32
    ) + params["logits_bias"]
    return logits, new_cache


def marian_greedy_cached(
    params, cfg: MarianConfig, src_tokens: jnp.ndarray, max_tokens: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TPU-native greedy decode: encode once, then a ``lax.while_loop`` of
    cached single-token steps (O(T) vs the eager helper's O(T²) re-decode;
    jit the whole call per shape bucket — the serving node does). Returns
    (tokens [b, max_tokens] — predictions only, pad-filled after eos —
    and lengths [b] including the eos)."""
    enc_states, enc_bias = marian_encode(params, cfg, src_tokens)
    b = src_tokens.shape[0]
    cache = _marian_init_cache(params, cfg, enc_states, max_tokens + 1)
    pad = jnp.int32(cfg.pad_token_id)
    eos = jnp.int32(cfg.eos_token_id)
    tok0 = jnp.full((b,), cfg.decoder_start_token_id, jnp.int32)
    tokens0 = jnp.full((b, max_tokens), pad, jnp.int32)
    done0 = jnp.zeros((b,), bool)

    def cond(carry):
        i, _, _, _, done = carry
        return jnp.logical_and(i < max_tokens, ~jnp.all(done))

    def body(carry):
        i, tok, tokens, cache, done = carry
        logits, cache = marian_decode_step(params, cfg, tok, i, cache, enc_bias)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad, nxt)
        tokens = jax.lax.dynamic_update_slice_in_dim(tokens, nxt[:, None], i, axis=1)
        done = jnp.logical_or(done, nxt == eos)
        return i + 1, nxt, tokens, cache, done

    _, _, tokens, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tok0, tokens0, cache, done0)
    )
    lengths = jnp.sum((tokens != pad).astype(jnp.int32), axis=1)
    return tokens, lengths


def marian_greedy_translate(
    params, cfg: MarianConfig, src_tokens: jnp.ndarray, max_len: int = 64
) -> np.ndarray:
    """Greedy decode (teacher-forced re-scoring per step — the serving node
    batches short utterances, so O(T²) is fine at these lengths)."""
    enc_states, enc_bias = marian_encode(params, cfg, src_tokens)
    b = src_tokens.shape[0]
    dec = np.full((b, 1), cfg.decoder_start_token_id, np.int32)
    finished = np.zeros(b, bool)
    for _ in range(max_len):
        logits = marian_decode_logits(params, cfg, jnp.asarray(dec), enc_states, enc_bias)
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1)).astype(np.int32)
        nxt = np.where(finished, cfg.pad_token_id, nxt)
        dec = np.concatenate([dec, nxt[:, None]], axis=1)
        finished |= nxt == cfg.eos_token_id
        if finished.all():
            break
    return dec


def marian_config_from_hf(hf) -> MarianConfig:
    return MarianConfig(
        vocab_size=hf.vocab_size,
        d_model=hf.d_model,
        encoder_layers=hf.encoder_layers,
        decoder_layers=hf.decoder_layers,
        heads=hf.encoder_attention_heads,
        ffn_dim=hf.encoder_ffn_dim,
        max_positions=hf.max_position_embeddings,
        pad_token_id=hf.pad_token_id,
        eos_token_id=hf.eos_token_id,
        decoder_start_token_id=hf.decoder_start_token_id,
        scale_embedding=bool(getattr(hf, "scale_embedding", True)),
    )


def marian_params_from_hf(sd: Dict[str, np.ndarray], cfg: MarianConfig, dtype=jnp.float32) -> Dict:
    """Convert a ``MarianMTModel.state_dict()`` to our layout."""

    def t(name):
        return jnp.asarray(np.asarray(sd[name]), dtype)

    def lin(prefix):
        return {"w": t(f"{prefix}.weight").T, "b": t(f"{prefix}.bias")}

    def ln(prefix):
        return {"g": t(f"{prefix}.weight"), "b": t(f"{prefix}.bias")}

    def attn(prefix):
        return {
            "q": lin(f"{prefix}.q_proj"),
            "k": lin(f"{prefix}.k_proj"),
            "v": lin(f"{prefix}.v_proj"),
            "o": lin(f"{prefix}.out_proj"),
        }

    def enc_layer(i):
        p = f"model.encoder.layers.{i}"
        return {
            "attn": attn(f"{p}.self_attn"),
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
            "ln2": ln(f"{p}.final_layer_norm"),
        }

    def dec_layer(i):
        p = f"model.decoder.layers.{i}"
        return {
            "attn": attn(f"{p}.self_attn"),
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "xattn": attn(f"{p}.encoder_attn"),
            "ln_x": ln(f"{p}.encoder_attn_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
            "ln2": ln(f"{p}.final_layer_norm"),
        }

    return {
        "emb": t("model.shared.weight"),
        "pos": (
            t("model.encoder.embed_positions.weight")
            if "model.encoder.embed_positions.weight" in sd
            else jnp.asarray(_sinusoidal_marian(cfg.max_positions, cfg.d_model), dtype)
        ),
        "logits_bias": jnp.asarray(np.asarray(sd["final_logits_bias"]).reshape(-1), jnp.float32),
        "enc_layers": [enc_layer(i) for i in range(cfg.encoder_layers)],
        "dec_layers": [dec_layer(i) for i in range(cfg.decoder_layers)],
    }


def marian_beam_translate(
    params,
    cfg: MarianConfig,
    src_tokens: jnp.ndarray,
    max_tokens: int = 64,
    beam: int = 4,
    length_penalty: float = 1.0,
):
    """Beam-search decode (reference helsinki/CTranslate2 ``beam_size``).
    Returns (tokens [b, max_tokens] best hypothesis, lengths [b])."""
    from .seq2seq import beam_decode

    enc_states, enc_bias = marian_encode(params, cfg, src_tokens)
    b = src_tokens.shape[0]
    cache = _marian_init_cache(params, cfg, enc_states, max_tokens + 1)
    start = jnp.full((b,), cfg.decoder_start_token_id, jnp.int32)
    logits, cache = marian_decode_step(params, cfg, start, jnp.int32(0), cache, enc_bias)
    cache = jax.tree.map(lambda x: jnp.repeat(x, beam, axis=0), cache)
    enc_bias_x = jnp.repeat(enc_bias, beam, axis=0)

    def step(tok, i, c):
        return marian_decode_step(params, cfg, tok, i, c, enc_bias_x)

    tokens, lengths, _ = beam_decode(
        step, cache, logits, b, beam, max_tokens,
        cfg.eos_token_id, cfg.pad_token_id, start_step=1,
        length_penalty=length_penalty,
    )
    return tokens, lengths
