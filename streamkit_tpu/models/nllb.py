# SPDX-License-Identifier: Apache-2.0
"""NLLB-200 / M2M100-family translation model in pure JAX.

TPU-native replacement for the reference's CTranslate2 NLLB plugin
(``plugins/native/nllb/src/lib.rs:21-70``): encoder-decoder transformer
(M2M100 architecture, which NLLB-200 shares) with greedy decode and a KV
cache, batched over sessions. Weights convert from HF
``M2M100ForConditionalGeneration`` checkpoints; logit parity is tested
against torch with random weights.

Architecture notes (matching HF M2M100):
* token embeddings scaled by ``sqrt(d_model)``; positions are *sinusoidal*
  with M2M100's table layout (sin block then cos block) and offset 2,
* pre-norm residual blocks + final layernorm in both stacks,
* k/v/q/out projections all biased; lm head ties to the shared embedding.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "NllbConfig",
    "nllb_init_params",
    "nllb_encode",
    "nllb_decode_logits",
    "nllb_config_from_hf",
    "nllb_params_from_hf",
    "nllb_greedy_translate",
    "nllb_beam_translate",
    "nllb_greedy_cached",
    "nllb_decode_step",
]


@dataclass(frozen=True)
class NllbConfig:
    vocab_size: int = 128112  # NLLB-200
    d_model: int = 1024
    encoder_layers: int = 12
    decoder_layers: int = 12
    heads: int = 16
    ffn_dim: int = 4096
    max_positions: int = 1024
    pad_token_id: int = 1
    eos_token_id: int = 2
    decoder_start_token_id: int = 2


def _sinusoidal_table(n_pos: int, dim: int, padding_idx: int = 1) -> np.ndarray:
    """M2M100's sinusoidal layout: [sin block | cos block], padding row zeroed."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(n_pos, dtype=np.float64)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n_pos, 1))], axis=1)
    table[padding_idx] = 0.0
    return table.astype(np.float32)


def nllb_init_params(cfg: NllbConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)

    def lin(d_in, d_out):
        s = 1.0 / math.sqrt(d_in)
        return {
            "w": jnp.asarray(rng.uniform(-s, s, (d_in, d_out)).astype(np.float32), dtype),
            "b": jnp.zeros((d_out,), dtype),
        }

    def ln(d):
        return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    def attn(d):
        return {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "o": lin(d, d)}

    def enc_layer(d):
        return {"ln1": ln(d), "attn": attn(d), "ln2": ln(d), "fc1": lin(d, cfg.ffn_dim), "fc2": lin(cfg.ffn_dim, d)}

    def dec_layer(d):
        return {
            "ln1": ln(d), "attn": attn(d),
            "ln_x": ln(d), "xattn": attn(d),
            "ln2": ln(d), "fc1": lin(d, cfg.ffn_dim), "fc2": lin(cfg.ffn_dim, d),
        }

    d = cfg.d_model
    return {
        "emb": jnp.asarray(rng.normal(0, 0.02, (cfg.vocab_size, d)).astype(np.float32), dtype),
        "pos": jnp.asarray(_sinusoidal_table(cfg.max_positions + 2, d, cfg.pad_token_id), dtype),
        "enc_layers": [enc_layer(d) for _ in range(cfg.encoder_layers)],
        "enc_ln": ln(d),
        "dec_layers": [dec_layer(d) for _ in range(cfg.decoder_layers)],
        "dec_ln": ln(d),
    }


def _ln(x, p):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    return (jnp.matmul(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype) + p["b"])


def _heads(x, n):
    *lead, t, d = x.shape
    return x.reshape(*lead, t, n, d // n).swapaxes(-3, -2)


def _unheads(x):
    *lead, h, t, hd = x.shape
    return x.swapaxes(-3, -2).reshape(*lead, t, h * hd)


def _attn(q, k, v, n_head, mask=None):
    hd = q.shape[-1] // n_head
    qh = _heads(q, n_head) * (hd ** -0.5)  # M2M100 scales q only
    kh, vh = _heads(k, n_head), _heads(v, n_head)
    scores = jnp.matmul(qh, kh.swapaxes(-1, -2), preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return _unheads(jnp.matmul(probs, vh, preferred_element_type=jnp.float32).astype(q.dtype))


def _positions_for(tokens: jnp.ndarray, pad_id: int, offset: int = 0) -> jnp.ndarray:
    """M2M100 position ids: cumsum over non-pad + pad_id (pads stay at pad_id)."""
    mask = (tokens != pad_id).astype(jnp.int32)
    return (jnp.cumsum(mask, axis=-1) + offset) * mask + pad_id


def nllb_encode(params, cfg: NllbConfig, tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``tokens [b, t]`` → (hidden states, attention bias for cross-attn)."""
    scale = math.sqrt(cfg.d_model)
    pos_ids = _positions_for(tokens, cfg.pad_token_id)
    x = params["emb"][tokens] * jnp.asarray(scale, params["emb"].dtype) + params["pos"][pos_ids].astype(params["emb"].dtype)
    pad_bias = jnp.where(tokens == cfg.pad_token_id, -jnp.inf, 0.0).astype(jnp.float32)
    bias = pad_bias[:, None, None, :]  # [b, 1, 1, t]
    for layer in params["enc_layers"]:
        h = _ln(x, layer["ln1"])
        a = _attn(_dense(h, layer["attn"]["q"]), _dense(h, layer["attn"]["k"]), _dense(h, layer["attn"]["v"]), cfg.heads, bias)
        x = x + _dense(a, layer["attn"]["o"])
        h = _ln(x, layer["ln2"])
        x = x + _dense(jax.nn.relu(_dense(h, layer["fc1"])), layer["fc2"])
    return _ln(x, params["enc_ln"]), bias


def nllb_decode_logits(params, cfg: NllbConfig, dec_tokens, enc_states, enc_bias) -> jnp.ndarray:
    """Teacher-forced decoder pass → logits [b, t, vocab]."""
    scale = math.sqrt(cfg.d_model)
    t = dec_tokens.shape[-1]
    pos_ids = _positions_for(dec_tokens, cfg.pad_token_id)
    x = params["emb"][dec_tokens] * jnp.asarray(scale, params["emb"].dtype) + params["pos"][pos_ids].astype(params["emb"].dtype)
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    for layer in params["dec_layers"]:
        h = _ln(x, layer["ln1"])
        a = _attn(_dense(h, layer["attn"]["q"]), _dense(h, layer["attn"]["k"]), _dense(h, layer["attn"]["v"]), cfg.heads, causal)
        x = x + _dense(a, layer["attn"]["o"])
        h = _ln(x, layer["ln_x"])
        a = _attn(_dense(h, layer["xattn"]["q"]), _dense(enc_states, layer["xattn"]["k"]), _dense(enc_states, layer["xattn"]["v"]), cfg.heads, enc_bias)
        x = x + _dense(a, layer["xattn"]["o"])
        h = _ln(x, layer["ln2"])
        x = x + _dense(jax.nn.relu(_dense(h, layer["fc1"])), layer["fc2"])
    x = _ln(x, params["dec_ln"])
    return jnp.matmul(x, params["emb"].T.astype(x.dtype), preferred_element_type=jnp.float32)


def _nllb_init_cache(params, cfg: NllbConfig, enc_states, max_t: int):
    from .seq2seq import init_decoder_cache

    return init_decoder_cache(params["dec_layers"], enc_states, cfg.d_model, max_t, _dense)


def nllb_decode_step(params, cfg: NllbConfig, tok, step, cache, enc_bias):
    """One cached decoder step at sequence position ``step`` (0-based).

    M2M100 position ids are cumsum-over-non-pad + pad_id; incremental
    greedy rows never feed pad before finishing, so position = pad_id +
    step + 1 (rows diverge only after eos, where outputs are discarded)."""
    scale = math.sqrt(cfg.d_model)
    emb = params["emb"]
    pos_id = cfg.pad_token_id + step + 1
    pos = jax.lax.dynamic_index_in_dim(params["pos"], pos_id, 0, keepdims=False)
    x = (emb[tok] * jnp.asarray(scale, emb.dtype) + pos.astype(emb.dtype))[:, None, :]
    max_t = cache[0][0].shape[1]
    self_mask = jnp.where(
        jnp.arange(max_t)[None, None, None, :] <= step, 0.0, -jnp.inf
    ).astype(jnp.float32)
    new_cache = []
    for layer, (sk, sv, ck, cv) in zip(params["dec_layers"], cache):
        h = _ln(x, layer["ln1"])
        k = _dense(h, layer["attn"]["k"])
        v = _dense(h, layer["attn"]["v"])
        sk = jax.lax.dynamic_update_slice_in_dim(sk, k, step, axis=1)
        sv = jax.lax.dynamic_update_slice_in_dim(sv, v, step, axis=1)
        a = _attn(_dense(h, layer["attn"]["q"]), sk, sv, cfg.heads, self_mask)
        x = x + _dense(a, layer["attn"]["o"])
        h = _ln(x, layer["ln_x"])
        a = _attn(_dense(h, layer["xattn"]["q"]), ck, cv, cfg.heads, enc_bias)
        x = x + _dense(a, layer["xattn"]["o"])
        h = _ln(x, layer["ln2"])
        x = x + _dense(jax.nn.relu(_dense(h, layer["fc1"])), layer["fc2"])
        new_cache.append((sk, sv, ck, cv))
    x = _ln(x, params["dec_ln"])
    logits = jnp.matmul(
        x[:, 0], params["emb"].T.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return logits, new_cache


def nllb_greedy_cached(
    params,
    cfg: NllbConfig,
    src_tokens: jnp.ndarray,
    target_lang_token,
    max_tokens: int = 128,
):
    """TPU-native greedy decode (encode once + cached ``lax.while_loop``
    steps; O(T) vs the eager helper's O(T²)). The NLLB forced prefix
    ``[decoder_start, target_lang]`` is fed first; returns
    (tokens [b, max_tokens] predictions only, lengths [b] incl. eos)."""
    enc_states, enc_bias = nllb_encode(params, cfg, src_tokens)
    b = src_tokens.shape[0]
    cache = _nllb_init_cache(params, cfg, enc_states, max_tokens + 2)
    pad = jnp.int32(cfg.pad_token_id)
    eos = jnp.int32(cfg.eos_token_id)

    # feed the 2-token prefix
    start = jnp.full((b,), cfg.decoder_start_token_id, jnp.int32)
    lang = jnp.broadcast_to(jnp.asarray(target_lang_token, jnp.int32), (b,))
    _, cache = nllb_decode_step(params, cfg, start, jnp.int32(0), cache, enc_bias)
    logits, cache = nllb_decode_step(params, cfg, lang, jnp.int32(1), cache, enc_bias)

    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    tokens0 = jnp.full((b, max_tokens), pad, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first)
    done0 = first == eos

    def cond(carry):
        i, _, _, _, done = carry
        return jnp.logical_and(i < max_tokens, ~jnp.all(done))

    def body(carry):
        i, tok, tokens, cache, done = carry
        logits, cache = nllb_decode_step(params, cfg, tok, i + 1, cache, enc_bias)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad, nxt)
        tokens = jax.lax.dynamic_update_slice_in_dim(tokens, nxt[:, None], i, axis=1)
        done = jnp.logical_or(done, nxt == eos)
        return i + 1, nxt, tokens, cache, done

    _, _, tokens, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), first, tokens0, cache, done0)
    )
    lengths = jnp.sum((tokens != pad).astype(jnp.int32), axis=1)
    return tokens, lengths


def nllb_greedy_translate(
    params,
    cfg: NllbConfig,
    src_tokens: np.ndarray,
    target_lang_token: int,
    max_tokens: int = 128,
) -> np.ndarray:
    """Greedy translation. NLLB convention: decoder starts with
    ``[eos, target_lang]`` and src begins with the source lang token.

    Full-prefix redecode per step (no KV cache yet — translation segments
    are short; cached decode mirrors whisper's and lands with the batcher).
    """
    enc_states, enc_bias = nllb_encode(params, cfg, jnp.asarray(src_tokens))
    batch = src_tokens.shape[0]
    dec = np.full((batch, 1), cfg.decoder_start_token_id, np.int32)
    dec = np.concatenate([dec, np.full((batch, 1), target_lang_token, np.int32)], axis=1)
    done = np.zeros(batch, bool)
    for _ in range(max_tokens):
        logits = nllb_decode_logits(params, cfg, jnp.asarray(dec), enc_states, enc_bias)
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1)).astype(np.int32)
        nxt = np.where(done, cfg.pad_token_id, nxt)
        done |= nxt == cfg.eos_token_id
        dec = np.concatenate([dec, nxt[:, None]], axis=1)
        if done.all():
            break
    return dec


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------
def nllb_config_from_hf(hf) -> NllbConfig:
    return NllbConfig(
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
    )


def nllb_params_from_hf(sd: Dict[str, np.ndarray], cfg: NllbConfig, dtype=jnp.float32) -> Dict:
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
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "attn": attn(f"{p}.self_attn"),
            "ln2": ln(f"{p}.final_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
        }

    def dec_layer(i):
        p = f"model.decoder.layers.{i}"
        return {
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "attn": attn(f"{p}.self_attn"),
            "ln_x": ln(f"{p}.encoder_attn_layer_norm"),
            "xattn": attn(f"{p}.encoder_attn"),
            "ln2": ln(f"{p}.final_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
        }

    n_pos = np.asarray(sd["model.encoder.embed_positions.weights"]).shape[0] if "model.encoder.embed_positions.weights" in sd else cfg.max_positions + 2
    return {
        "emb": t("model.shared.weight"),
        "pos": jnp.asarray(_sinusoidal_table(n_pos, cfg.d_model, cfg.pad_token_id), dtype),
        "enc_layers": [enc_layer(i) for i in range(cfg.encoder_layers)],
        "enc_ln": ln("model.encoder.layer_norm"),
        "dec_layers": [dec_layer(i) for i in range(cfg.decoder_layers)],
        "dec_ln": ln("model.decoder.layer_norm"),
    }


def nllb_beam_translate(
    params,
    cfg: NllbConfig,
    src_tokens: jnp.ndarray,
    target_lang_token,
    max_tokens: int = 128,
    beam: int = 4,
    length_penalty: float = 1.0,
):
    """Beam-search decode (reference nllb/CTranslate2 ``beam_size``).
    Returns (tokens [b, max_tokens] best hypothesis, lengths [b])."""
    from .seq2seq import beam_decode

    enc_states, enc_bias = nllb_encode(params, cfg, src_tokens)
    b = src_tokens.shape[0]
    cache = _nllb_init_cache(params, cfg, enc_states, max_tokens + 2)
    start = jnp.full((b,), cfg.decoder_start_token_id, jnp.int32)
    lang = jnp.broadcast_to(jnp.asarray(target_lang_token, jnp.int32), (b,))
    _, cache = nllb_decode_step(params, cfg, start, jnp.int32(0), cache, enc_bias)
    logits, cache = nllb_decode_step(params, cfg, lang, jnp.int32(1), cache, enc_bias)
    cache = jax.tree.map(lambda x: jnp.repeat(x, beam, axis=0), cache)
    enc_bias_x = jnp.repeat(enc_bias, beam, axis=0)

    def step(tok, i, c):
        return nllb_decode_step(params, cfg, tok, i, c, enc_bias_x)

    tokens, lengths, _ = beam_decode(
        step, cache, logits, b, beam, max_tokens,
        cfg.eos_token_id, cfg.pad_token_id, start_step=2,
        length_penalty=length_penalty,
    )
    return tokens, lengths
