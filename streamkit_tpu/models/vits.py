# SPDX-License-Identifier: Apache-2.0
"""VITS text-to-speech (piper/MMS-class) — pure-JAX inference stack.

Parity target: the reference's piper/kokoro native plugins run VITS voices
through sherpa-onnx (``plugins/native/piper`` — SURVEY.md §2; same shape as
``plugins/native/kokoro/kokoro_node.rs:25-123``). Here the whole acoustic
stack is TPU-native instead of an ONNX sidecar: text encoder (relative-
position transformer), deterministic + stochastic duration predictors
(rational-quadratic spline flows), residual-coupling prior flow, and the
VITS HiFi-GAN decoder, all jittable with static shapes.

Weight layout is compatible with HuggingFace ``VitsModel`` (facebook/mms-tts-*
and piper exports) — ``vits_params_from_hf`` converts a state dict, fusing
torch weight-norm parametrizations. Numerics follow HF ``modeling_vits.py``
so converted checkpoints reproduce reference audio.

Everything is channels-last ``[batch, time, channels]`` (TPU lanes carry the
channel dim); torch conv weights ``(out, in, k)`` convert to ``(k, in, out)``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "VitsConfig",
    "VitsCharTokenizer",
    "vits_params_from_hf",
    "vits_config_from_hf",
    "vits_init_params",
    "load_vits",
    "synthesize",
    "text_encoder",
    "predict_durations",
    "flow_reverse",
    "vits_decode",
]


@dataclass
class VitsConfig:
    vocab_size: int = 38
    hidden_size: int = 192
    num_hidden_layers: int = 6
    num_attention_heads: int = 2
    window_size: int = 4
    use_bias: bool = True
    ffn_dim: int = 768
    ffn_kernel_size: int = 3
    flow_size: int = 192
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    leaky_relu_slope: float = 0.1
    prior_encoder_num_flows: int = 4
    prior_encoder_num_wavenet_layers: int = 4
    wavenet_kernel_size: int = 5
    wavenet_dilation_rate: int = 1
    duration_predictor_kernel_size: int = 3
    duration_predictor_filter_channels: int = 256
    duration_predictor_flow_bins: int = 10
    duration_predictor_tail_bound: float = 5.0
    duration_predictor_num_flows: int = 4
    depth_separable_channels: int = 2
    depth_separable_num_layers: int = 3
    use_stochastic_duration_prediction: bool = True
    speaking_rate: float = 1.0
    noise_scale: float = 0.667
    noise_scale_duration: float = 0.8
    layer_norm_eps: float = 1e-5
    hidden_act: str = "relu"
    sampling_rate: int = 16000

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def hop(self) -> int:
        return int(np.prod(self.upsample_rates))


def vits_config_from_hf(hf) -> VitsConfig:
    """Map a ``transformers.VitsConfig`` onto ours."""
    return VitsConfig(
        vocab_size=hf.vocab_size,
        hidden_size=hf.hidden_size,
        num_hidden_layers=hf.num_hidden_layers,
        num_attention_heads=hf.num_attention_heads,
        window_size=hf.window_size,
        use_bias=hf.use_bias,
        ffn_dim=hf.ffn_dim,
        ffn_kernel_size=hf.ffn_kernel_size,
        flow_size=hf.flow_size,
        upsample_rates=tuple(hf.upsample_rates),
        upsample_kernel_sizes=tuple(hf.upsample_kernel_sizes),
        upsample_initial_channel=hf.upsample_initial_channel,
        resblock_kernel_sizes=tuple(hf.resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(tuple(d) for d in hf.resblock_dilation_sizes),
        leaky_relu_slope=hf.leaky_relu_slope,
        prior_encoder_num_flows=hf.prior_encoder_num_flows,
        prior_encoder_num_wavenet_layers=hf.prior_encoder_num_wavenet_layers,
        wavenet_kernel_size=hf.wavenet_kernel_size,
        wavenet_dilation_rate=hf.wavenet_dilation_rate,
        duration_predictor_kernel_size=hf.duration_predictor_kernel_size,
        duration_predictor_filter_channels=hf.duration_predictor_filter_channels,
        duration_predictor_flow_bins=hf.duration_predictor_flow_bins,
        duration_predictor_tail_bound=hf.duration_predictor_tail_bound,
        duration_predictor_num_flows=hf.duration_predictor_num_flows,
        depth_separable_channels=hf.depth_separable_channels,
        depth_separable_num_layers=hf.depth_separable_num_layers,
        use_stochastic_duration_prediction=hf.use_stochastic_duration_prediction,
        speaking_rate=hf.speaking_rate,
        noise_scale=hf.noise_scale,
        noise_scale_duration=hf.noise_scale_duration,
        layer_norm_eps=hf.layer_norm_eps,
        hidden_act=hf.hidden_act if isinstance(hf.hidden_act, str) else "relu",
        sampling_rate=hf.sampling_rate,
    )


# ---------------------------------------------------------------------------
# primitive layers (channels-last)
# ---------------------------------------------------------------------------

def _conv1d(x, p, *, dilation: int = 1, pad: Optional[Tuple[int, int]] = None,
            groups: int = 1):
    """x [b, t, c_in] * w [k, c_in/groups, c_out] (+b) with torch 'same' pads."""
    k = p["w"].shape[0]
    if pad is None:
        s = (k * dilation - dilation) // 2
        pad = (s, s)
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(1,),
        padding=(pad,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"] if "b" in p else y


def _conv_transpose1d(x, p, stride: int):
    """HF ConvTranspose1d with padding=(k-stride)//2, channels-last."""
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


def _layer_norm(x, p, eps: float):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def _act(name: str):
    return {"relu": jax.nn.relu, "gelu": jax.nn.gelu, "silu": jax.nn.silu}.get(
        name, jax.nn.relu
    )


# ---------------------------------------------------------------------------
# text encoder: relative-position attention (modeling_vits.py:842-1005)
# ---------------------------------------------------------------------------

def _get_relative_embeddings(emb, length: int, window: int):
    """emb [2w+1, d] → [2*length-1, d] (pad or slice to the sequence)."""
    pad = max(length - (window + 1), 0)
    if pad > 0:
        emb = jnp.pad(emb, ((pad, pad), (0, 0)))
    start = max((window + 1) - length, 0)
    return jax.lax.dynamic_slice_in_dim(emb, start, 2 * length - 1, axis=0)


def _relative_to_absolute(x):
    """[bh, t, 2t-1] → [bh, t, t] (skewing trick)."""
    bh, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
    x = x.reshape(bh, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, t - 1)))
    x = x.reshape(bh, t + 1, 2 * t - 1)
    return x[:, :t, t - 1 :]


def _absolute_to_relative(x):
    """[bh, t, t] → [bh, t, 2t-1]."""
    bh, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(bh, t * (2 * t - 1))
    x = jnp.pad(x, ((0, 0), (t, 0)))
    return x.reshape(bh, t, 2 * t)[:, :, 1:]


def _attention(x, p, cfg: VitsConfig, attn_bias=None):
    b, t, _ = x.shape
    h, d = cfg.num_attention_heads, cfg.head_dim
    scale = d ** -0.5

    def proj(name):
        y = x @ p[name]["w"]
        if "b" in p[name]:
            y = y + p[name]["b"]
        return y.reshape(b, t, h, d).transpose(0, 2, 1, 3).reshape(b * h, t, d)

    q = proj("q") * scale
    k = proj("k")
    v = proj("v")
    logits = q @ k.transpose(0, 2, 1)
    if cfg.window_size:
        rel_k = _get_relative_embeddings(p["emb_rel_k"], t, cfg.window_size)
        logits = logits + _relative_to_absolute(q @ rel_k.T)
    if attn_bias is not None:
        logits = (logits.reshape(b, h, t, t) + attn_bias).reshape(b * h, t, t)
    probs = jax.nn.softmax(logits, axis=-1)
    out = probs @ v
    if cfg.window_size:
        rel_v = _get_relative_embeddings(p["emb_rel_v"], t, cfg.window_size)
        out = out + _absolute_to_relative(probs) @ rel_v
    out = out.reshape(b, h, t, d).transpose(0, 2, 1, 3).reshape(b, t, h * d)
    y = out @ p["out"]["w"]
    if "b" in p["out"]:
        y = y + p["out"]["b"]
    return y


def _feed_forward(x, mask, p, cfg: VitsConfig):
    k = cfg.ffn_kernel_size
    pad = ((k - 1) // 2, k // 2) if k > 1 else (0, 0)
    y = _conv1d(x * mask, p["conv1"], pad=pad)
    y = _act(cfg.hidden_act)(y)
    y = _conv1d(y * mask, p["conv2"], pad=pad)
    return y * mask


def text_encoder(params, cfg: VitsConfig, input_ids, mask=None):
    """``input_ids [b, t]`` → (hidden [b,t,h], prior_means, prior_log_var).

    mask: optional [b, t] float (1 = token, 0 = pad).
    """
    p = params["text_encoder"]
    x = p["emb"][input_ids] * math.sqrt(cfg.hidden_size)
    if mask is None:
        mask = jnp.ones(input_ids.shape, x.dtype)
    m = mask[..., None]
    attn_bias = None
    if mask is not None:
        neg = jnp.finfo(x.dtype).min
        attn_bias = (1.0 - mask[:, None, None, :]) * neg
    x = x * m
    for layer in p["layers"]:
        res = x
        x = _attention(x, layer["attn"], cfg, attn_bias)
        x = _layer_norm(res + x, layer["ln1"], cfg.layer_norm_eps)
        res = x
        x = _feed_forward(x, m, layer["ffn"], cfg)
        x = _layer_norm(res + x, layer["ln2"], cfg.layer_norm_eps)
    x = x * m
    stats = _conv1d(x, p["project"], pad=(0, 0)) * m
    means, log_var = jnp.split(stats, 2, axis=-1)
    return x, means, log_var


# ---------------------------------------------------------------------------
# WaveNet + residual coupling flow (modeling_vits.py:303-372, 552-595)
# ---------------------------------------------------------------------------

def _wavenet(x, mask, p, cfg: VitsConfig):
    """Gated dilated conv stack; x [b, t, hidden]."""
    out = jnp.zeros_like(x)
    n = cfg.hidden_size
    for i, layer in enumerate(p["layers"]):
        dilation = cfg.wavenet_dilation_rate ** i
        h = _conv1d(x, layer["in"], dilation=dilation)
        acts = jnp.tanh(h[..., :n]) * jax.nn.sigmoid(h[..., n:])
        rs = _conv1d(acts, layer["res_skip"], pad=(0, 0))
        if i < len(p["layers"]) - 1:
            x = (x + rs[..., :n]) * mask
            out = out + rs[..., n:]
        else:
            out = out + rs
    return out * mask


def _coupling_layer_reverse(z, mask, p, cfg: VitsConfig):
    half = cfg.flow_size // 2
    first, second = z[..., :half], z[..., half:]
    h = _conv1d(first, p["pre"], pad=(0, 0)) * mask
    h = _wavenet(h, mask, p["wavenet"], cfg)
    mean = _conv1d(h, p["post"], pad=(0, 0)) * mask
    return jnp.concatenate([first, (second - mean) * mask], axis=-1)


def flow_reverse(params, cfg: VitsConfig, z, mask):
    """Prior flow in reverse (inference): z [b, t, flow] → latents."""
    for p in reversed(params["flow"]):
        z = jnp.flip(z, axis=-1)
        z = _coupling_layer_reverse(z, mask, p, cfg)
    return z


# ---------------------------------------------------------------------------
# duration predictors (modeling_vits.py:598-839)
# ---------------------------------------------------------------------------

def _duration_predictor(x, mask, p, cfg: VitsConfig):
    y = _conv1d(x * mask, p["conv1"])
    y = jax.nn.relu(y)
    y = _layer_norm(y, p["norm1"], cfg.layer_norm_eps)
    y = _conv1d(y * mask, p["conv2"])
    y = jax.nn.relu(y)
    y = _layer_norm(y, p["norm2"], cfg.layer_norm_eps)
    return _conv1d(y * mask, p["proj"], pad=(0, 0)) * mask


def _dds_conv(x, mask, p, cfg: VitsConfig, cond=None):
    """Dilated depth-separable conv stack (gelu/LN), x [b, t, hidden]."""
    if cond is not None:
        x = x + cond
    k = cfg.duration_predictor_kernel_size
    for i, layer in enumerate(p["layers"]):
        dilation = k ** i
        h = _conv1d(x * mask, layer["dw"], dilation=dilation,
                    groups=cfg.hidden_size)
        h = _layer_norm(h, layer["norm1"], cfg.layer_norm_eps)
        h = jax.nn.gelu(h, approximate=False)
        h = _conv1d(h, layer["pw"], pad=(0, 0))
        h = _layer_norm(h, layer["norm2"], cfg.layer_norm_eps)
        h = jax.nn.gelu(h, approximate=False)
        x = x + h
    return x * mask


def _rq_spline_reverse(inputs, uw, uh, ud, cfg: VitsConfig):
    """Unconstrained rational-quadratic spline, reverse direction only
    (modeling_vits.py:93-300) with static-shape where-selection."""
    tail = cfg.duration_predictor_tail_bound
    min_bin_w = 1e-3
    min_bin_h = 1e-3
    min_deriv = 1e-3
    num_bins = uw.shape[-1]

    inside = (inputs >= -tail) & (inputs <= tail)
    x = jnp.clip(inputs, -tail, tail)

    constant = float(np.log(np.exp(1 - min_deriv) - 1))
    ud = jnp.pad(ud, [(0, 0)] * (ud.ndim - 1) + [(1, 1)], constant_values=constant)

    widths = jax.nn.softmax(uw, axis=-1)
    widths = min_bin_w + (1 - min_bin_w * num_bins) * widths
    cumw = jnp.cumsum(widths, axis=-1)
    cumw = jnp.pad(cumw, [(0, 0)] * (cumw.ndim - 1) + [(1, 0)])
    cumw = 2 * tail * cumw - tail
    cumw = cumw.at[..., 0].set(-tail).at[..., -1].set(tail)
    widths = cumw[..., 1:] - cumw[..., :-1]

    derivs = min_deriv + jax.nn.softplus(ud)

    heights = jax.nn.softmax(uh, axis=-1)
    heights = min_bin_h + (1 - min_bin_h * num_bins) * heights
    cumh = jnp.cumsum(heights, axis=-1)
    cumh = jnp.pad(cumh, [(0, 0)] * (cumh.ndim - 1) + [(1, 0)])
    cumh = 2 * tail * cumh - tail
    cumh = cumh.at[..., 0].set(-tail).at[..., -1].set(tail)
    heights = cumh[..., 1:] - cumh[..., :-1]

    locations = cumh.at[..., -1].add(1e-6)  # reverse: bins over heights
    bin_idx = jnp.sum((x[..., None] >= locations).astype(jnp.int32), axis=-1) - 1
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    def take(a):
        return jnp.take_along_axis(a, bin_idx, axis=-1)[..., 0]

    in_cumw = take(cumw)
    in_w = take(widths)
    in_cumh = take(cumh)
    delta = heights / widths
    in_delta = take(delta)
    in_d = take(derivs)
    in_d1 = take(derivs[..., 1:])
    in_h = take(heights)

    inter1 = in_d + in_d1 - 2 * in_delta
    inter2 = x - in_cumh
    inter3 = inter2 * inter1
    a = in_h * (in_delta - in_d) + inter3
    b = in_h * in_d - inter3
    c = -in_delta * inter2
    disc = b * b - 4 * a * c
    root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
    out = root * in_w + in_cumw
    return jnp.where(inside, out, inputs)


def _conv_flow_reverse(z, mask, p, cfg: VitsConfig, cond):
    half = cfg.depth_separable_channels // 2
    first, second = z[..., :half], z[..., half:]
    h = _conv1d(first, p["pre"], pad=(0, 0))
    h = _dds_conv(h, mask, p["dds"], cfg, cond)
    h = _conv1d(h, p["proj"], pad=(0, 0)) * mask

    b, t, _ = first.shape
    nb = cfg.duration_predictor_flow_bins
    # torch reshapes (b, c, 3nb-1, t) channel-first; channels-last equivalent
    h = h.reshape(b, t, half, 3 * nb - 1)
    scale = math.sqrt(cfg.hidden_size)
    uw = h[..., :nb] / scale
    uh = h[..., nb : 2 * nb] / scale
    ud = h[..., 2 * nb :]

    # spline operates [b, t, half] with per-element bins
    second_t = second
    out = _rq_spline_reverse(second_t, uw, uh, ud, cfg)
    return jnp.concatenate([first, out * mask], axis=-1)


def _stochastic_duration_reverse(x, mask, p, cfg: VitsConfig, noise):
    """Reverse (inference) pass of the stochastic duration predictor."""
    h = _conv1d(x, p["conv_pre"], pad=(0, 0))
    h = _dds_conv(h, mask, p["dds"], cfg)
    h = _conv1d(h, p["conv_proj"], pad=(0, 0)) * mask

    z = noise  # [b, t, 2]
    # flows reversed, dropping the "useless" first ConvFlow
    # (modeling_vits.py:790-791)
    flows: List = list(reversed(p["flows"]))
    flows = flows[:-2] + [flows[-1]]
    for fp in flows:
        z = jnp.flip(z, axis=-1)
        if fp["kind"] == "affine":
            z = (z - fp["translate"]) * jnp.exp(-fp["log_scale"]) * mask
        else:
            z = _conv_flow_reverse(z, mask, fp, cfg, cond=h)
    return z[..., :1]  # log_duration


def predict_durations(params, cfg: VitsConfig, hidden, mask, dur_noise=None):
    """hidden [b,t,h], mask [b,t,1] → log_duration [b,t,1]."""
    p = params["duration_predictor"]
    if cfg.use_stochastic_duration_prediction:
        if dur_noise is None:
            dur_noise = jnp.zeros(hidden.shape[:2] + (2,), hidden.dtype)
        return _stochastic_duration_reverse(hidden, mask, p, cfg, dur_noise)
    return _duration_predictor(hidden, mask, p, cfg)


# ---------------------------------------------------------------------------
# HiFi-GAN decoder (VITS variant: flow_size in, no conv_post bias)
# ---------------------------------------------------------------------------

def vits_decode(params, cfg: VitsConfig, latents):
    """latents [b, frames, flow] → waveform [b, frames * hop]."""
    p = params["decoder"]
    slope = cfg.leaky_relu_slope
    x = _conv1d(latents, p["pre"], pad=(3, 3))
    nk = len(cfg.resblock_kernel_sizes)
    for i, up in enumerate(p["ups"]):
        x = jax.nn.leaky_relu(x, slope)
        x = _conv_transpose1d(x, up, cfg.upsample_rates[i])
        acc = None
        for j in range(nk):
            rb = p["resblocks"][i * nk + j]
            k = cfg.resblock_kernel_sizes[j]
            y = x
            for c1, c2, d in zip(rb["convs1"], rb["convs2"],
                                 cfg.resblock_dilation_sizes[j]):
                res = y
                y = jax.nn.leaky_relu(y, slope)
                y = _conv1d(y, c1, dilation=d)
                y = jax.nn.leaky_relu(y, slope)
                y = _conv1d(y, c2)
                y = y + res
            acc = y if acc is None else acc + y
        x = acc / nk
    x = jax.nn.leaky_relu(x, 0.01)  # torch F.leaky_relu default slope
    x = _conv1d(x, p["post"], pad=(3, 3))
    return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# end-to-end synthesis
# ---------------------------------------------------------------------------

def _expand_by_duration(durations, means, log_vars, in_mask, max_frames: int):
    """Monotonic length regulation as one matmul (MXU-friendly).

    durations [b, t, 1] integer-valued floats → attn [b, frames, t] with
    attn[b, j, i] = 1 iff frame j belongs to token i; then stats expand by
    ``attn @ stats``. Mirrors modeling_vits.py:1373-1385 with a static
    ``max_frames`` so the whole path jits.
    """
    d = durations[..., 0] * in_mask[..., 0]
    cum = jnp.cumsum(d, axis=-1)  # [b, t]
    total = jnp.maximum(cum[:, -1:], 1.0)
    frames = jnp.arange(max_frames, dtype=d.dtype)[None, :, None]  # [1, f, 1]
    below = (frames < cum[:, None, :]).astype(d.dtype)  # [b, f, t]
    started = (frames >= (cum - d)[:, None, :]).astype(d.dtype)
    out_mask = (frames[..., 0] < total).astype(d.dtype)[..., None]  # [b, f, 1]
    attn = below * started * out_mask * in_mask[:, None, :, 0]
    return attn @ means, attn @ log_vars, out_mask, total[..., 0]


def synthesize(
    params,
    cfg: VitsConfig,
    input_ids,
    *,
    mask=None,
    max_frames: Optional[int] = None,
    speaking_rate: Optional[float] = None,
    noise_scale: Optional[float] = None,
    noise: Optional[jnp.ndarray] = None,
    dur_noise: Optional[jnp.ndarray] = None,
):
    """Full VITS inference: token ids → waveform.

    Returns ``(waveform [b, max_frames*hop], n_valid_samples [b])``.
    ``max_frames`` fixes the output length for jit; frames beyond the
    predicted length are masked to silence (the last few valid frames —
    within the decoder's receptive field of the boundary — differ slightly
    from a tight-length run, since the padded tail is zero latents rather
    than conv edge padding). ``noise``/``dur_noise`` default to zeros
    (deterministic synthesis); pass gaussian samples scaled by the config
    noise levels to match stochastic reference behaviour.
    """
    hidden, means, log_vars = text_encoder(params, cfg, input_ids, mask)
    m = (jnp.ones(input_ids.shape, hidden.dtype) if mask is None else mask)[..., None]

    log_dur = predict_durations(params, cfg, hidden, m, dur_noise)
    rate = cfg.speaking_rate if speaking_rate is None else speaking_rate
    duration = jnp.ceil(jnp.exp(log_dur) * m / rate)

    if max_frames is None:
        # eager convenience: tight bound from the actual prediction
        per_sample = jnp.sum(duration, axis=(1, 2))
        max_frames = int(jnp.max(jnp.maximum(per_sample, 1.0)))

    means_e, log_vars_e, out_mask, total = _expand_by_duration(
        duration, means, log_vars, m, max_frames
    )
    ns = cfg.noise_scale if noise_scale is None else noise_scale
    if noise is None:
        z_p = means_e
    else:
        z_p = means_e + noise * jnp.exp(log_vars_e) * ns
    z_p = z_p * out_mask
    latents = flow_reverse(params, cfg, z_p, out_mask) * out_mask
    wave = vits_decode(params, cfg, latents)
    return wave, (total * cfg.hop).astype(jnp.int32)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def _fuse_weight_norm(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """torch weight_norm: w = g * v / ||v|| (norm over in+k dims per out)."""
    g = np.asarray(sd[f"{prefix}.parametrizations.weight.original0"], np.float32)
    v = np.asarray(sd[f"{prefix}.parametrizations.weight.original1"], np.float32)
    norm = np.sqrt(np.sum(v * v, axis=(1, 2), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def vits_params_from_hf(sd: Dict[str, np.ndarray], cfg: VitsConfig,
                        dtype=jnp.float32) -> Dict:
    """Convert a HF ``VitsModel`` state dict (training-only posterior encoder
    is skipped)."""

    def t(name):
        return np.asarray(sd[name], np.float32)

    def conv(prefix, bias=True, weight_norm=False):
        w = _fuse_weight_norm(sd, prefix) if weight_norm else t(f"{prefix}.weight")
        out = {"w": jnp.asarray(w.transpose(2, 1, 0), dtype)}  # (o,i,k)→(k,i,o)
        if bias and f"{prefix}.bias" in sd:
            out["b"] = jnp.asarray(t(f"{prefix}.bias"), dtype)
        return out

    def lin(prefix):
        out = {"w": jnp.asarray(t(f"{prefix}.weight").T, dtype)}
        if f"{prefix}.bias" in sd:
            out["b"] = jnp.asarray(t(f"{prefix}.bias"), dtype)
        return out

    def ln(prefix):
        return {
            "w": jnp.asarray(t(f"{prefix}.weight"), dtype),
            "b": jnp.asarray(t(f"{prefix}.bias"), dtype),
        }

    def enc_layer(i):
        pre = f"text_encoder.encoder.layers.{i}"
        return {
            "attn": {
                "q": lin(f"{pre}.attention.q_proj"),
                "k": lin(f"{pre}.attention.k_proj"),
                "v": lin(f"{pre}.attention.v_proj"),
                "out": lin(f"{pre}.attention.out_proj"),
                "emb_rel_k": jnp.asarray(t(f"{pre}.attention.emb_rel_k")[0], dtype),
                "emb_rel_v": jnp.asarray(t(f"{pre}.attention.emb_rel_v")[0], dtype),
            },
            "ln1": ln(f"{pre}.layer_norm"),
            "ffn": {
                "conv1": conv(f"{pre}.feed_forward.conv_1"),
                "conv2": conv(f"{pre}.feed_forward.conv_2"),
            },
            "ln2": ln(f"{pre}.final_layer_norm"),
        }

    def wavenet(prefix, num_layers):
        return {
            "layers": [
                {
                    "in": {
                        "w": jnp.asarray(
                            _fuse_weight_norm(sd, f"{prefix}.in_layers.{i}")
                            .transpose(2, 1, 0), dtype
                        ),
                        "b": jnp.asarray(t(f"{prefix}.in_layers.{i}.bias"), dtype),
                    },
                    "res_skip": {
                        "w": jnp.asarray(
                            _fuse_weight_norm(sd, f"{prefix}.res_skip_layers.{i}")
                            .transpose(2, 1, 0), dtype
                        ),
                        "b": jnp.asarray(
                            t(f"{prefix}.res_skip_layers.{i}.bias"), dtype
                        ),
                    },
                }
                for i in range(num_layers)
            ]
        }

    def dds(prefix):
        return {
            "layers": [
                {
                    "dw": conv(f"{prefix}.convs_dilated.{i}"),
                    "pw": conv(f"{prefix}.convs_pointwise.{i}"),
                    "norm1": ln(f"{prefix}.norms_1.{i}"),
                    "norm2": ln(f"{prefix}.norms_2.{i}"),
                }
                for i in range(cfg.depth_separable_num_layers)
            ]
        }

    params: Dict = {
        "text_encoder": {
            "emb": jnp.asarray(t("text_encoder.embed_tokens.weight"), dtype),
            "layers": [enc_layer(i) for i in range(cfg.num_hidden_layers)],
            "project": conv("text_encoder.project"),
        },
        "flow": [
            {
                "pre": conv(f"flow.flows.{i}.conv_pre"),
                "wavenet": wavenet(
                    f"flow.flows.{i}.wavenet", cfg.prior_encoder_num_wavenet_layers
                ),
                "post": conv(f"flow.flows.{i}.conv_post"),
            }
            for i in range(cfg.prior_encoder_num_flows)
        ],
        "decoder": {
            "pre": conv("decoder.conv_pre"),
            "ups": [
                conv(f"decoder.upsampler.{i}")
                for i in range(len(cfg.upsample_rates))
            ],
            "resblocks": [
                {
                    "convs1": [
                        conv(f"decoder.resblocks.{r}.convs1.{j}")
                        for j in range(len(cfg.resblock_dilation_sizes[r % len(cfg.resblock_kernel_sizes)]))
                    ],
                    "convs2": [
                        conv(f"decoder.resblocks.{r}.convs2.{j}")
                        for j in range(len(cfg.resblock_dilation_sizes[r % len(cfg.resblock_kernel_sizes)]))
                    ],
                }
                for r in range(len(cfg.upsample_rates) * len(cfg.resblock_kernel_sizes))
            ],
            "post": conv("decoder.conv_post", bias=False),
        },
    }

    # conv_transpose weights: torch ConvTranspose1d stores (in, out, k);
    # our helper (transpose_kernel=True) wants (k, out, in) under WIO
    for i, up in enumerate(params["decoder"]["ups"]):
        w = t(f"decoder.upsampler.{i}.weight")  # (in, out, k)
        up["w"] = jnp.asarray(w.transpose(2, 1, 0), dtype)  # (k, out, in)

    if cfg.use_stochastic_duration_prediction:
        flows = [
            {
                "kind": "affine",
                "translate": jnp.asarray(
                    t("duration_predictor.flows.0.translate")[:, 0], dtype
                ),
                "log_scale": jnp.asarray(
                    t("duration_predictor.flows.0.log_scale")[:, 0], dtype
                ),
            }
        ]
        for i in range(1, cfg.duration_predictor_num_flows + 1):
            pre = f"duration_predictor.flows.{i}"
            flows.append(
                {
                    "kind": "conv",
                    "pre": conv(f"{pre}.conv_pre"),
                    "dds": dds(f"{pre}.conv_dds"),
                    "proj": conv(f"{pre}.conv_proj"),
                }
            )
        params["duration_predictor"] = {
            "conv_pre": conv("duration_predictor.conv_pre"),
            "conv_proj": conv("duration_predictor.conv_proj"),
            "dds": dds("duration_predictor.conv_dds"),
            "flows": flows,
        }
    else:
        params["duration_predictor"] = {
            "conv1": conv("duration_predictor.conv_1"),
            "conv2": conv("duration_predictor.conv_2"),
            "norm1": ln("duration_predictor.norm_1"),
            "norm2": ln("duration_predictor.norm_2"),
            "proj": conv("duration_predictor.proj"),
        }
    return params


# ---------------------------------------------------------------------------
# random init (weightless demo mode / torch-free tests)
# ---------------------------------------------------------------------------

def vits_init_params(cfg: VitsConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    """Random-normal parameter tree with the same structure the HF
    conversion produces (host numpy init, one transfer)."""
    rng = np.random.RandomState(seed)

    def arr(*shape, scale=0.02):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale, dtype)

    def conv(k, c_in, c_out, bias=True, groups=1):
        p = {"w": arr(k, c_in // groups, c_out, scale=1.0 / math.sqrt(k * c_in))}
        if bias:
            p["b"] = jnp.zeros((c_out,), dtype)
        return p

    def lin(d_in, d_out):
        return {"w": arr(d_in, d_out), "b": jnp.zeros((d_out,), dtype)}

    def ln(d):
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    h = cfg.hidden_size
    w2 = 2 * cfg.window_size + 1

    def enc_layer():
        return {
            "attn": {
                "q": lin(h, h), "k": lin(h, h), "v": lin(h, h), "out": lin(h, h),
                "emb_rel_k": arr(w2, cfg.head_dim, scale=cfg.head_dim ** -0.5),
                "emb_rel_v": arr(w2, cfg.head_dim, scale=cfg.head_dim ** -0.5),
            },
            "ln1": ln(h),
            "ffn": {
                "conv1": conv(cfg.ffn_kernel_size, h, cfg.ffn_dim),
                "conv2": conv(cfg.ffn_kernel_size, cfg.ffn_dim, h),
            },
            "ln2": ln(h),
        }

    def wavenet(num_layers):
        return {
            "layers": [
                {
                    "in": conv(cfg.wavenet_kernel_size, h, 2 * h),
                    "res_skip": conv(1, h, 2 * h if i < num_layers - 1 else h),
                }
                for i in range(num_layers)
            ]
        }

    def dds():
        return {
            "layers": [
                {
                    "dw": conv(cfg.duration_predictor_kernel_size, h, h, groups=h),
                    "pw": conv(1, h, h),
                    "norm1": ln(h),
                    "norm2": ln(h),
                }
                for _ in range(cfg.depth_separable_num_layers)
            ]
        }

    half = cfg.flow_size // 2
    params: Dict = {
        "text_encoder": {
            "emb": arr(cfg.vocab_size, h),
            "layers": [enc_layer() for _ in range(cfg.num_hidden_layers)],
            "project": conv(1, h, cfg.flow_size * 2),
        },
        "flow": [
            {
                "pre": conv(1, half, h),
                "wavenet": wavenet(cfg.prior_encoder_num_wavenet_layers),
                "post": conv(1, h, half),
            }
            for _ in range(cfg.prior_encoder_num_flows)
        ],
        "decoder": {
            "pre": conv(7, cfg.flow_size, cfg.upsample_initial_channel),
            "ups": [
                conv(cfg.upsample_kernel_sizes[i],
                     cfg.upsample_initial_channel // (2 ** (i + 1)),
                     cfg.upsample_initial_channel // (2 ** i))
                for i in range(len(cfg.upsample_rates))
            ],
            "resblocks": [],
            "post": conv(7, cfg.upsample_initial_channel
                         // (2 ** len(cfg.upsample_rates)), 1, bias=False),
        },
    }
    # transpose-conv weights live as (k, out, in) under transpose_kernel=True
    for i, up in enumerate(params["decoder"]["ups"]):
        c_in = cfg.upsample_initial_channel // (2 ** i)
        c_out = cfg.upsample_initial_channel // (2 ** (i + 1))
        k = cfg.upsample_kernel_sizes[i]
        up["w"] = arr(k, c_out, c_in, scale=1.0 / math.sqrt(k * c_in))
        up["b"] = jnp.zeros((c_out,), dtype)
    for i in range(len(cfg.upsample_rates)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        for j, k in enumerate(cfg.resblock_kernel_sizes):
            dil = cfg.resblock_dilation_sizes[j]
            params["decoder"]["resblocks"].append(
                {
                    "convs1": [conv(k, ch, ch) for _ in dil],
                    "convs2": [conv(k, ch, ch) for _ in dil],
                }
            )

    if cfg.use_stochastic_duration_prediction:
        flows: List = [
            {
                "kind": "affine",
                "translate": jnp.zeros((cfg.depth_separable_channels,), dtype),
                "log_scale": jnp.zeros((cfg.depth_separable_channels,), dtype),
            }
        ]
        dsc_half = cfg.depth_separable_channels // 2
        for _ in range(cfg.duration_predictor_num_flows):
            flows.append(
                {
                    "kind": "conv",
                    "pre": conv(1, dsc_half, h),
                    "dds": dds(),
                    "proj": conv(1, h, dsc_half
                                 * (cfg.duration_predictor_flow_bins * 3 - 1)),
                }
            )
        params["duration_predictor"] = {
            "conv_pre": conv(1, h, h),
            "conv_proj": conv(1, h, h),
            "dds": dds(),
            "flows": flows,
        }
    else:
        fc = cfg.duration_predictor_filter_channels
        params["duration_predictor"] = {
            "conv1": conv(cfg.duration_predictor_kernel_size, h, fc),
            "conv2": conv(cfg.duration_predictor_kernel_size, fc, fc),
            "norm1": ln(fc),
            "norm2": ln(fc),
            "proj": conv(1, fc, 1),
        }
    return params


# ---------------------------------------------------------------------------
# tokenizer + checkpoint loading (HF VitsTokenizer-compatible, char level)
# ---------------------------------------------------------------------------

class VitsCharTokenizer:
    """Character tokenizer matching HF ``VitsTokenizer`` (non-phonemized
    path, tokenization_vits.py:115-216): lowercase, drop chars outside the
    vocab, intersperse the blank/pad id between characters."""

    def __init__(self, vocab: Dict[str, int], add_blank: bool = True,
                 pad_id: int = 0) -> None:
        self.vocab = vocab
        self.add_blank = add_blank
        self.pad_id = pad_id

    def encode(self, text: str) -> np.ndarray:
        chars = [c for c in text.lower() if c in self.vocab]
        ids = [self.vocab[c] for c in chars]
        if self.add_blank:
            out = [self.pad_id] * (len(ids) * 2 + 1)
            out[1::2] = ids
            ids = out
        return np.asarray(ids or [self.pad_id], np.int32)


def load_vits(model_dir: str, dtype=jnp.float32):
    """Load an HF VitsModel checkpoint dir (config.json + model.safetensors /
    pytorch_model.bin + vocab.json) → ``(cfg, params, tokenizer)``."""
    import json
    import os

    with open(os.path.join(model_dir, "config.json"), encoding="utf-8") as f:
        raw = json.load(f)
    defaults = VitsConfig()
    cfg = VitsConfig(**{
        k: (tuple(tuple(x) if isinstance(x, list) else x for x in v)
            if isinstance(v, list) else v)
        for k, v in raw.items()
        if k in defaults.__dataclass_fields__
    })

    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        import torch

        blob = torch.load(
            os.path.join(model_dir, "pytorch_model.bin"),
            map_location="cpu", weights_only=True,
        )
        sd = {k: v.numpy() for k, v in blob.items()}
    params = vits_params_from_hf(sd, cfg, dtype)

    tok = None
    vocab_path = os.path.join(model_dir, "vocab.json")
    if os.path.exists(vocab_path):
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        tok = VitsCharTokenizer(vocab)
    return cfg, params, tok
