# SPDX-License-Identifier: Apache-2.0
"""TTS stack: non-autoregressive acoustic model + HiFi-GAN vocoder, pure JAX.

TPU-native replacement for the reference's sherpa-onnx TTS plugins
(``plugins/native/kokoro``, ``piper``, ``matcha`` — VITS/Matcha + vocoder):

* :func:`hifigan_generate` — HiFi-GAN generator (the vocoder used by
  Kokoro/Matcha-class stacks). Weight layout matches HF ``SpeechT5HifiGan``
  so checkpoints convert directly; parity-tested against torch.
* :class:`AcousticConfig` / :func:`acoustic_generate` — FastSpeech-style
  text→mel: phoneme embeddings → transformer encoder → duration-expanded
  frames → decoder → mel. Non-autoregressive: one device call per sentence,
  batched over sessions (the TTS continuous-batching unit is a sentence,
  mirroring the reference's per-sentence synthesis).

All convs are expressed channels-last so XLA maps them onto the MXU.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "HifiGanConfig",
    "hifigan_init_params",
    "hifigan_generate",
    "hifigan_params_from_hf",
    "AcousticConfig",
    "acoustic_init_params",
    "acoustic_generate",
]


# ---------------------------------------------------------------------------
# HiFi-GAN generator (HF SpeechT5HifiGan-compatible layout)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class HifiGanConfig:
    model_in_dim: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: tuple = (4, 4, 4, 4)
    upsample_kernel_sizes: tuple = (8, 8, 8, 8)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    leaky_relu_slope: float = 0.1
    normalize_before: bool = True  # HF applies mean/scale normalization


def _conv_init(rng, k, c_in, c_out):
    s = 1.0 / math.sqrt(k * c_in)
    return rng.uniform(-s, s, (k, c_in, c_out)).astype(np.float32)


def hifigan_init_params(cfg: HifiGanConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)

    def conv(k, c_in, c_out):
        return {
            "w": jnp.asarray(_conv_init(rng, k, c_in, c_out), dtype),
            "b": jnp.zeros((c_out,), dtype),
        }

    params: Dict = {
        "mean": jnp.zeros((cfg.model_in_dim,), dtype),
        "scale": jnp.ones((cfg.model_in_dim,), dtype),
        "conv_pre": conv(7, cfg.model_in_dim, cfg.upsample_initial_channel),
        "ups": [],
        "resblocks": [],
    }
    ch = cfg.upsample_initial_channel
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        # transpose-conv kernels are [k, out, in] (transpose_kernel=True layout,
        # matching the HF conversion in hifigan_params_from_hf); bias is [out]
        params["ups"].append(
            {
                "w": jnp.asarray(_conv_init(rng, k, ch // 2, ch), dtype),
                "b": jnp.zeros((ch // 2,), dtype),
            }
        )
        ch //= 2
        for k_res, dilations in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            block = {"convs1": [], "convs2": []}
            for d in dilations:
                block["convs1"].append(conv(k_res, ch, ch))
                block["convs2"].append(conv(k_res, ch, ch))
            params["resblocks"].append(block)
    params["conv_post"] = conv(7, ch, 1)
    return params


def _conv1d_same(x, p, dilation: int = 1):
    """Channels-last 'same' conv: x [b, t, c]."""
    k = p["w"].shape[0]
    pad = (k - 1) * dilation // 2
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(1,),
        padding=((pad, pad),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"]


def _conv_transpose1d(x, p, stride: int):
    """HF ConvTranspose1d with padding=(k-stride)//2."""
    k = p["w"].shape[0]
    pad = (k - stride) // 2
    y = jax.lax.conv_transpose(
        x,
        p["w"],
        strides=(stride,),
        padding=((k - 1 - pad, k - 1 - pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"]


def hifigan_generate(params: Dict, cfg: HifiGanConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """``mel [b, frames, n_mels]`` → waveform ``[b, frames * prod(rates)]``."""
    lrelu = lambda x: jax.nn.leaky_relu(x, cfg.leaky_relu_slope)
    x = mel
    if cfg.normalize_before:
        x = (x - params["mean"]) / params["scale"]
    x = _conv1d_same(x, params["conv_pre"])
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        x = _conv_transpose1d(lrelu(x), params["ups"][i], cfg.upsample_rates[i])
        acc = None
        for j in range(n_kernels):
            block = params["resblocks"][i * n_kernels + j]
            h = x
            for c1, c2, d in zip(
                block["convs1"], block["convs2"], cfg.resblock_dilation_sizes[j]
            ):
                y = _conv1d_same(lrelu(h), c1, dilation=d)
                y = _conv1d_same(lrelu(y), c2)
                h = h + y
            acc = h if acc is None else acc + h
        x = acc / n_kernels
    x = _conv1d_same(lrelu(x), params["conv_post"])
    return jnp.tanh(x)[..., 0]


def hifigan_params_from_hf(sd: Dict[str, np.ndarray], cfg: HifiGanConfig, dtype=jnp.float32) -> Dict:
    """Convert an HF SpeechT5HifiGan state dict (torch conv layout [out,in,k])."""

    def conv(prefix):
        w = np.asarray(sd[f"{prefix}.weight"])
        return {
            "w": jnp.asarray(w.transpose(2, 1, 0), dtype),
            "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]), dtype),
        }

    def tconv(prefix):
        w = np.asarray(sd[f"{prefix}.weight"])  # [in, out, k]
        return {
            "w": jnp.asarray(w.transpose(2, 1, 0), dtype),  # [k, out, in] for transpose_kernel
            "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]), dtype),
        }

    params: Dict = {
        "mean": jnp.asarray(np.asarray(sd.get("mean", np.zeros(cfg.model_in_dim))), dtype),
        "scale": jnp.asarray(np.asarray(sd.get("scale", np.ones(cfg.model_in_dim))), dtype),
        "conv_pre": conv("conv_pre"),
        "ups": [],
        "resblocks": [],
    }
    for i in range(len(cfg.upsample_rates)):
        params["ups"].append(tconv(f"upsampler.{i}"))
    n_blocks = len(cfg.upsample_rates) * len(cfg.resblock_kernel_sizes)
    for i in range(n_blocks):
        block = {"convs1": [], "convs2": []}
        for j in range(len(cfg.resblock_dilation_sizes[0])):
            block["convs1"].append(conv(f"resblocks.{i}.convs1.{j}"))
            block["convs2"].append(conv(f"resblocks.{i}.convs2.{j}"))
        params["resblocks"].append(block)
    params["conv_post"] = conv("conv_post")
    return params


# ---------------------------------------------------------------------------
# FastSpeech-style acoustic model (text → mel)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class AcousticConfig:
    vocab_size: int = 256  # byte-level text input
    d_model: int = 256
    heads: int = 4
    enc_layers: int = 4
    dec_layers: int = 4
    n_mels: int = 80
    max_text: int = 512
    max_frames: int = 2048
    frames_per_token: int = 8  # fallback duration when predictor untrained


def acoustic_init_params(cfg: AcousticConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)

    def lin(d_in, d_out):
        s = 1.0 / math.sqrt(d_in)
        return {
            "w": jnp.asarray(rng.uniform(-s, s, (d_in, d_out)).astype(np.float32), dtype),
            "b": jnp.zeros((d_out,), dtype),
        }

    def ln(d):
        return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    def layer(d):
        return {
            "ln1": ln(d),
            "q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "o": lin(d, d),
            "ln2": ln(d),
            "fc1": lin(d, 4 * d), "fc2": lin(4 * d, d),
        }

    d = cfg.d_model
    pos = np.zeros((max(cfg.max_text, cfg.max_frames), d), np.float32)
    p = np.arange(pos.shape[0])[:, None]
    i = np.arange(d // 2)[None, :]
    angles = p / np.power(10000, 2 * i / d)
    pos[:, 0::2] = np.sin(angles)
    pos[:, 1::2] = np.cos(angles)
    return {
        "emb": jnp.asarray(rng.normal(0, 0.02, (cfg.vocab_size, d)).astype(np.float32), dtype),
        "pos": jnp.asarray(pos, dtype),
        "enc": [layer(d) for _ in range(cfg.enc_layers)],
        "dur": lin(d, 1),
        "dec": [layer(d) for _ in range(cfg.dec_layers)],
        "out_ln": ln(d),
        "mel_out": lin(d, cfg.n_mels),
    }


def _ln_(x, p):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]).astype(x.dtype)


def _dense_(x, p):
    return jnp.matmul(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype) + p["b"]


def _block(x, layer, heads, mask=None):
    h = _ln_(x, layer["ln1"])
    *lead, t, d = h.shape
    hd = d // heads

    def split(v):
        return v.reshape(*lead, t, heads, hd).swapaxes(-3, -2)

    q, k, v = split(_dense_(h, layer["q"])), split(_dense_(h, layer["k"])), split(_dense_(h, layer["v"]))
    scores = jnp.matmul(q, k.swapaxes(-1, -2), preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
    a = jnp.matmul(probs, v, preferred_element_type=jnp.float32).astype(x.dtype)
    a = a.swapaxes(-3, -2).reshape(*lead, t, d)
    x = x + _dense_(a, layer["o"])
    h = _ln_(x, layer["ln2"])
    return x + _dense_(jax.nn.gelu(_dense_(h, layer["fc1"])), layer["fc2"])


def acoustic_generate(
    params: Dict, cfg: AcousticConfig, tokens: jnp.ndarray, n_frames: int
) -> jnp.ndarray:
    """``tokens [b, t]`` → mel ``[b, n_frames, n_mels]``.

    Durations: predicted per token (softplus), normalized to fill exactly
    ``n_frames`` (static output shape for XLA); frame→token mapping via a
    searchsorted gather.
    """
    b, t = tokens.shape
    x = params["emb"][tokens] + params["pos"][:t].astype(params["emb"].dtype)
    for layer in params["enc"]:
        x = _block(x, layer, cfg.heads)
    dur = jax.nn.softplus(_dense_(x, params["dur"])[..., 0]) + 1e-3  # [b, t]
    cum = jnp.cumsum(dur, axis=-1)
    total = cum[:, -1:]
    boundaries = cum / total * n_frames  # token end-frames in [0, n_frames]
    frame_idx = jnp.arange(n_frames, dtype=jnp.float32)[None, :] + 0.5
    # token index for each frame: first boundary >= frame position
    tok_for_frame = jnp.sum(boundaries[:, None, :] < frame_idx[:, :, None], axis=-1)
    tok_for_frame = jnp.clip(tok_for_frame, 0, t - 1)
    frames = jnp.take_along_axis(x, tok_for_frame[..., None].astype(jnp.int32), axis=1)
    y = frames + params["pos"][:n_frames].astype(frames.dtype)
    for layer in params["dec"]:
        y = _block(y, layer, cfg.heads)
    return _dense_(_ln_(y, params["out_ln"]), params["mel_out"])
