# SPDX-License-Identifier: Apache-2.0
"""SenseVoice-small-class non-autoregressive ASR in JAX.

Parity target: the reference's sensevoice plugin
(``plugins/native/sensevoice/``) wraps the sherpa-onnx SenseVoice-small
model: LFR-stacked log-mel features + language/ITN prefix embeddings → a
SAN-M encoder (self-attention fused with an FSMN depthwise-conv memory
branch) → CTC output. This is a from-scratch JAX implementation of that
architecture — single forward pass per segment (no autoregressive decode),
which maps perfectly onto the batcher: one fused program, MXU-heavy.

Weights load from an npz matching the param tree (zero-egress environment;
converter hooks mirror ``models/whisper/load.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SenseVoiceConfig",
    "sensevoice_init_params",
    "sensevoice_logits",
    "ctc_greedy_decode",
    "lfr_stack",
    "LANGUAGES",
]

# language ids in SenseVoice order (reference config.rs: auto/zh/en/ja/ko/yue)
LANGUAGES = {"auto": 0, "zh": 1, "en": 2, "ja": 3, "ko": 4, "yue": 5}


@dataclass(frozen=True)
class SenseVoiceConfig:
    vocab_size: int = 25055  # SenseVoice-small vocab
    n_mels: int = 80
    lfr_m: int = 7  # frames stacked
    lfr_n: int = 6  # hop in frames
    d_model: int = 512
    heads: int = 4
    ffn_dim: int = 2048
    layers: int = 50
    fsmn_kernel: int = 11
    n_languages: int = 6
    blank_id: int = 0

    @property
    def input_dim(self) -> int:
        return self.n_mels * self.lfr_m


def lfr_stack(mel: jnp.ndarray, m: int, n: int) -> jnp.ndarray:
    """Low-frame-rate stacking: ``[..., T, n_mels]`` → ``[..., T//n, n_mels*m]``
    (Paraformer/SenseVoice frontend: stack m frames, hop n)."""
    t = mel.shape[-2]
    t_out = (t + n - 1) // n
    pad = (t_out - 1) * n + m - t
    mel = jnp.pad(mel, [(0, 0)] * (mel.ndim - 2) + [(0, max(0, pad)), (0, 0)], mode="edge")
    idx = (jnp.arange(t_out)[:, None] * n + jnp.arange(m)[None, :]).reshape(-1)
    stacked = jnp.take(mel, idx, axis=-2)
    return stacked.reshape(*mel.shape[:-2], t_out, m * mel.shape[-1])


def sensevoice_init_params(cfg: SenseVoiceConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)

    def lin(d_in, d_out):
        return {
            "w": jnp.asarray(rng.standard_normal((d_in, d_out)) / math.sqrt(d_in), dtype),
            "b": jnp.zeros((d_out,), dtype),
        }

    def ln(d):
        return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    d = cfg.d_model

    def layer():
        return {
            "ln1": ln(d),
            "qkv": lin(d, 3 * d),
            "out": lin(d, d),
            # FSMN memory: depthwise conv over the value stream
            "fsmn": jnp.asarray(
                rng.standard_normal((cfg.fsmn_kernel, d)) / math.sqrt(cfg.fsmn_kernel), dtype
            ),
            "ln2": ln(d),
            "fc1": lin(d, cfg.ffn_dim),
            "fc2": lin(cfg.ffn_dim, d),
        }

    return {
        "in_proj": lin(cfg.input_dim, d),
        "lang_emb": jnp.asarray(rng.standard_normal((cfg.n_languages, d)) * 0.02, dtype),
        "itn_emb": jnp.asarray(rng.standard_normal((2, d)) * 0.02, dtype),
        "layers": [layer() for _ in range(cfg.layers)],
        "out_ln": ln(d),
        "ctc": lin(d, cfg.vocab_size),
    }


def _ln(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5) * p["g"] + p["b"]


def _dense(x, p):
    return jnp.matmul(x, p["w"], preferred_element_type=x.dtype) + p["b"]


def _fsmn(v: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise causal-centered memory conv over time: ``v [b,t,d]``."""
    k = kernel.shape[0]
    pad = k // 2
    vp = jnp.pad(v, ((0, 0), (pad, k - 1 - pad), (0, 0)))
    # depthwise conv as a sum of shifted scalings (k is small and static)
    out = jnp.zeros_like(v)
    for i in range(k):
        out = out + vp[:, i : i + v.shape[1], :] * kernel[i]
    return out


def sensevoice_logits(
    params,
    cfg: SenseVoiceConfig,
    mel: jnp.ndarray,
    mask: jnp.ndarray,
    language_id: jnp.ndarray,
    use_itn: jnp.ndarray,
) -> jnp.ndarray:
    """``mel [b, T, n_mels]``, ``mask [b, T_lfr]`` (1 = valid) → CTC logits
    ``[b, 2 + T_lfr, vocab]`` (prefix: language + itn embeddings)."""
    x = lfr_stack(mel, cfg.lfr_m, cfg.lfr_n)
    x = _dense(x.astype(params["in_proj"]["w"].dtype), params["in_proj"])
    b = x.shape[0]
    lang = params["lang_emb"][language_id][:, None, :]
    itn = params["itn_emb"][use_itn.astype(jnp.int32)][:, None, :]
    x = jnp.concatenate([lang, itn, x], axis=1)
    mask_full = jnp.concatenate([jnp.ones((b, 2), mask.dtype), mask], axis=1)
    bias = jnp.where(mask_full == 0, -jnp.inf, 0.0).astype(jnp.float32)[:, None, None, :]

    hd = cfg.d_model // cfg.heads
    for layer in params["layers"]:
        h = _ln(x, layer["ln1"])
        qkv = _dense(h, layer["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, z.shape[1], cfg.heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.matmul(heads(q), heads(k).transpose(0, 1, 3, 2), preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(hd) + bias
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        att = jnp.matmul(w, heads(v), preferred_element_type=v.dtype)
        att = att.transpose(0, 2, 1, 3).reshape(b, x.shape[1], cfg.d_model)
        # SAN-M: attention output + FSMN memory over the (masked) value stream
        mem = _fsmn(v * mask_full[..., None].astype(v.dtype), layer["fsmn"])
        x = x + _dense(att + mem, layer["out"])
        h = _ln(x, layer["ln2"])
        x = x + _dense(jax.nn.relu(_dense(h, layer["fc1"])), layer["fc2"])

    x = _ln(x, params["out_ln"])
    return jnp.matmul(x, params["ctc"]["w"], preferred_element_type=jnp.float32) + params["ctc"]["b"]


def ctc_greedy_decode(logits: np.ndarray, mask: np.ndarray, blank_id: int = 0) -> List[List[int]]:
    """Framewise argmax → collapse repeats → drop blanks. ``logits [b,t,v]``,
    ``mask [b,t]`` over the same axis (prefix positions already excluded)."""
    ids = np.argmax(logits, axis=-1)
    out: List[List[int]] = []
    for b in range(ids.shape[0]):
        seq: List[int] = []
        prev = -1
        for t in range(ids.shape[1]):
            if not mask[b, t]:
                break
            tok = int(ids[b, t])
            if tok != blank_id and tok != prev:
                seq.append(tok)
            prev = tok
        out.append(seq)
    return out
