# SPDX-License-Identifier: Apache-2.0
"""Matcha-TTS-class flow-matching acoustic model in JAX.

Parity target: the reference's matcha plugin (``plugins/native/matcha/``)
wraps Matcha-TTS via sherpa-onnx: text encoder + duration predictor →
length-regulated means → a conditional flow-matching (CFM) decoder solved
with a fixed-step Euler ODE → mel, then a vocoder (our HiFi-GAN in
``models/tts.py``). This is a from-scratch JAX implementation of that
architecture — NOT an alias of the VITS/FastSpeech stacks (different
decoder family: ODE over mels vs flows/upsampling).

Config semantics mirror the reference (``matcha/src/config.rs``):
``speed``/``length_scale`` scale durations, ``noise_scale`` scales the
initial ODE noise, ``speaker_id`` selects a speaker embedding.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MatchaConfig", "matcha_init_params", "matcha_synthesize_mel"]


@dataclass(frozen=True)
class MatchaConfig:
    vocab_size: int = 178  # phoneme inventory
    d_model: int = 192
    heads: int = 2
    enc_layers: int = 6
    ffn_dim: int = 768
    n_mels: int = 80
    dec_channels: int = 256
    dec_layers: int = 4
    n_speakers: int = 1
    spk_dim: int = 64
    ode_steps: int = 10  # fixed Euler steps (sherpa default ~5-10)


def matcha_init_params(cfg: MatchaConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)

    def lin(d_in, d_out):
        return {
            "w": jnp.asarray(rng.standard_normal((d_in, d_out)) / math.sqrt(d_in), dtype),
            "b": jnp.zeros((d_out,), dtype),
        }

    def ln(d):
        return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    def conv(c_in, c_out, k):
        return {
            "w": jnp.asarray(rng.standard_normal((k, c_in, c_out)) / math.sqrt(k * c_in), dtype),
            "b": jnp.zeros((c_out,), dtype),
        }

    d = cfg.d_model

    def enc_layer():
        return {
            "ln1": ln(d),
            "qkv": lin(d, 3 * d),
            "out": lin(d, d),
            "ln2": ln(d),
            "conv1": conv(d, cfg.ffn_dim, 3),
            "conv2": conv(cfg.ffn_dim, d, 3),
        }

    c = cfg.dec_channels
    cond_dim = cfg.n_mels + cfg.spk_dim + c  # mu + speaker + time embedding

    def dec_block():
        return {
            "conv1": conv(cfg.n_mels + cond_dim, c, 5),
            "conv2": conv(c, c, 5),
            "conv3": conv(c, cfg.n_mels, 5),
            "gn1": ln(c),
            "gn2": ln(c),
        }

    return {
        "emb": jnp.asarray(rng.standard_normal((cfg.vocab_size, d)) * 0.02, dtype),
        "enc_layers": [enc_layer() for _ in range(cfg.enc_layers)],
        "enc_ln": ln(d),
        "mu_proj": lin(d, cfg.n_mels),
        "dur_conv": conv(d, d, 3),
        "dur_ln": ln(d),
        "dur_proj": lin(d, 1),
        "spk_emb": jnp.asarray(rng.standard_normal((cfg.n_speakers, cfg.spk_dim)) * 0.1, dtype),
        "time_mlp1": lin(c, c),
        "time_mlp2": lin(c, c),
        "dec_blocks": [dec_block() for _ in range(cfg.dec_layers)],
    }


def _ln(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5) * p["g"] + p["b"]


def _dense(x, p):
    return jnp.matmul(x, p["w"], preferred_element_type=x.dtype) + p["b"]


def _conv1d(x, p):
    """``x [b, t, c_in]`` → same-padded conv → ``[b, t, c_out]``."""
    return (
        jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(1,), padding="SAME",
            dimension_numbers=("NTC", "TIO", "NTC"),
        )
        + p["b"]
    )


def _encode(params, cfg: MatchaConfig, tokens: jnp.ndarray, mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phoneme tokens → (mu per token [b,t,n_mels], log-durations [b,t]).

    ``mask [b, t]`` (1 = token, 0 = pad) excludes pad keys from attention
    and zeroes pad activations so conv layers see zeros there — required
    for cross-session batching of different-length texts."""
    x = params["emb"][tokens] * math.sqrt(cfg.d_model)
    b, t, d = x.shape
    hd = d // cfg.heads
    m = None if mask is None else mask.astype(x.dtype)[..., None]
    attn_bias = None
    if mask is not None:
        x = x * m
        attn_bias = ((1.0 - mask.astype(jnp.float32)) * -1e9)[:, None, None, :]
    for layer in params["enc_layers"]:
        h = _ln(x, layer["ln1"])
        q, k, v = jnp.split(_dense(h, layer["qkv"]), 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, cfg.heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.matmul(heads(q), heads(k).transpose(0, 1, 3, 2), preferred_element_type=jnp.float32)
        if attn_bias is not None:
            scores = scores + attn_bias
        w = jax.nn.softmax(scores / math.sqrt(hd), axis=-1).astype(v.dtype)
        att = jnp.matmul(w, heads(v), preferred_element_type=v.dtype)
        x = x + _dense(att.transpose(0, 2, 1, 3).reshape(b, t, d), layer["out"])
        h = _ln(x, layer["ln2"])
        if m is not None:
            h = h * m  # LN beta makes pads nonzero — convs must see zeros
        h = jax.nn.gelu(_conv1d(h, layer["conv1"]))
        if m is not None:
            h = h * m  # conv1 spills into pad positions; conv2 must not read it
        x = x + _conv1d(h, layer["conv2"])
        if m is not None:
            x = x * m
    x = _ln(x, params["enc_ln"])
    if m is not None:
        # zeros at pads before the mu/duration conv heads: a padded batch
        # then matches the unpadded run exactly (conv zero-padding beyond
        # the boundary equals masked pad positions)
        x = x * m
    mu = _dense(x, params["mu_proj"])
    dur = _dense(_ln(jax.nn.relu(_conv1d(x, params["dur_conv"])), params["dur_ln"]), params["dur_proj"])
    return mu, dur[..., 0]


def _length_regulate(mu: jnp.ndarray, durations: jnp.ndarray, max_frames: int) -> jnp.ndarray:
    """Expand token means by integer durations into [b, max_frames, n_mels]."""
    b, t, _ = mu.shape
    ends = jnp.cumsum(durations, axis=1)  # [b, t]
    starts = ends - durations
    frames = jnp.arange(max_frames)  # [F]
    sel = (frames[None, :, None] >= starts[:, None, :]) & (frames[None, :, None] < ends[:, None, :])
    return jnp.einsum("bft,btm->bfm", sel.astype(mu.dtype), mu)


def _time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    ang = t[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _velocity(params, cfg: MatchaConfig, x, mu_frames, spk, t_scalar):
    """CFM vector field v(x_t, t | mu, spk): stacked conv blocks."""
    b, f, _ = x.shape
    temb = _time_embedding(jnp.full((b,), t_scalar, jnp.float32), cfg.dec_channels)
    temb = _dense(jax.nn.silu(_dense(temb, params["time_mlp1"])), params["time_mlp2"])
    cond = jnp.concatenate(
        [
            mu_frames,
            jnp.broadcast_to(spk[:, None, :], (b, f, cfg.spk_dim)),
            jnp.broadcast_to(temb[:, None, :], (b, f, cfg.dec_channels)),
        ],
        axis=-1,
    )
    v = x
    for blk in params["dec_blocks"]:
        h = jnp.concatenate([v, cond], axis=-1)
        h = jax.nn.silu(_ln(_conv1d(h, blk["conv1"]), blk["gn1"]))
        h = jax.nn.silu(_ln(_conv1d(h, blk["conv2"]), blk["gn2"]))
        v = v + _conv1d(h, blk["conv3"])
    return v - x  # residual parametrization of the field


def matcha_synthesize_mel(
    params,
    cfg: MatchaConfig,
    tokens: jnp.ndarray,
    max_frames: int,
    mask=None,
    speaker_id: int = 0,
    noise_scale: float = 0.667,
    length_scale: float = 1.0,
    ode_steps: int = 0,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``tokens [b, t]`` → (mel [b, max_frames, n_mels], n_frames [b]).

    Deterministic given ``seed``. ``length_scale`` > 1 slows speech
    (reference config.rs semantics: speed = 1/length_scale)."""
    steps = ode_steps or cfg.ode_steps
    mu, log_dur = _encode(params, cfg, tokens, mask)
    durations = jnp.clip(jnp.round(jnp.exp(log_dur) * length_scale), 1, None).astype(jnp.int32)
    if mask is not None:
        durations = durations * mask.astype(jnp.int32)  # pads emit no frames
    n_frames = jnp.minimum(jnp.sum(durations, axis=1), max_frames)
    mu_frames = _length_regulate(mu, durations, max_frames)
    spk = params["spk_emb"][jnp.full((tokens.shape[0],), speaker_id, jnp.int32)]

    key = jax.random.PRNGKey(seed)
    # one noise pattern broadcast across rows: synthesis is then invariant
    # to batch width (required for cross-session batching — a row decodes
    # identically whether it shares the call with 0 or 15 other sentences)
    noise = jax.random.normal(
        key, (1,) + mu_frames.shape[1:], mu_frames.dtype
    )
    x = mu_frames + noise_scale * noise
    dt = 1.0 / steps

    def euler_step(i, x):
        t = i.astype(jnp.float32) * dt
        return x + dt * _velocity(params, cfg, x, mu_frames, spk, t)

    x = jax.lax.fori_loop(0, steps, euler_step, x)
    mask = jnp.arange(max_frames)[None, :] < n_frames[:, None]
    return x * mask[..., None], n_frames
