# SPDX-License-Identifier: Apache-2.0
"""Pure-JAX Whisper encoder/decoder.

TPU-native replacement for the reference's whisper.cpp inference
(``plugins/native/whisper/src/lib.rs``). Design notes:

* parameters are plain dict pytrees (easy HF-checkpoint conversion, easy
  pjit sharding annotations in :mod:`streamkit_tpu.parallel`),
* all matmuls carry ``preferred_element_type=f32``; params may be bf16 —
  the MXU computes bf16×bf16→f32, which is the TPU sweet spot,
* encoder conv1d is expressed as ``lax.conv_general_dilated`` over NCW —
  XLA lowers it onto the MXU,
* decoder self-attention uses a preallocated KV cache updated with
  ``lax.dynamic_update_slice`` at a traced position — static shapes, no
  recompile per step,
* everything is batched over a leading ``batch`` axis so the continuous
  batcher can pack many sessions into one device call.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig

__all__ = [
    "init_params",
    "encode",
    "decode_logits",
    "init_kv_cache",
    "decode_step",
    "sinusoids",
]

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# parameter init (deterministic; real weights come from load.py conversion)
# ---------------------------------------------------------------------------
def _param_spec(cfg: WhisperConfig):
    """Leaf-spec pytree with HF-compatible structure.

    Each leaf is ``(kind, shape, arg)`` — ``uniform`` (±arg), ``normal``
    (std arg), ``zeros``, ``ones``, ``sinusoid``. One structure feeds both
    materializers below, so the host and device init paths can never
    diverge structurally.
    """

    def linear(d_in, d_out, bias=True):
        p = {"w": ("uniform", (d_in, d_out), 1.0 / math.sqrt(d_in))}
        if bias:
            p["b"] = ("zeros", (d_out,), None)
        return p

    def ln(d):
        return {"g": ("ones", (d,), None), "b": ("zeros", (d,), None)}

    def attn_block(d):
        return {
            "q": linear(d, d),
            "k": linear(d, d, bias=False),
            "v": linear(d, d),
            "o": linear(d, d),
        }

    def enc_layer(d):
        return {
            "ln1": ln(d),
            "attn": attn_block(d),
            "ln2": ln(d),
            "mlp1": linear(d, 4 * d),
            "mlp2": linear(4 * d, d),
        }

    def dec_layer(d):
        return {
            "ln1": ln(d),
            "attn": attn_block(d),
            "ln_x": ln(d),
            "xattn": attn_block(d),
            "ln2": ln(d),
            "mlp1": linear(d, 4 * d),
            "mlp2": linear(4 * d, d),
        }

    da, dt = cfg.n_audio_state, cfg.n_text_state
    return {
        "enc": {
            # conv kernels draw as a (d_in, d_out) matrix then reshape —
            # identical flat draw order keeps the host path's values
            # byte-stable across this refactor
            "conv1": {
                "w": ("uniform_r", (3, cfg.n_mels, da), 1.0 / math.sqrt(cfg.n_mels * 3)),
                "b": ("zeros", (da,), None),
            },
            "conv2": {
                "w": ("uniform_r", (3, da, da), 1.0 / math.sqrt(da * 3)),
                "b": ("zeros", (da,), None),
            },
            "pos": ("sinusoid", (cfg.n_audio_ctx, da), None),
            "layers": [enc_layer(da) for _ in range(cfg.n_audio_layer)],
            "ln_post": ln(da),
        },
        "dec": {
            "tok_emb": ("normal", (cfg.n_vocab, dt), 0.02),
            "pos_emb": ("normal", (cfg.n_text_ctx, dt), 0.02),
            "layers": [dec_layer(dt) for _ in range(cfg.n_text_layer)],
            "ln": ln(dt),
        },
    }


def _spec_map(spec, fn):
    """Map ``fn`` over spec leaves in INSERTION order (dict construction
    order — not jax.tree's sorted-key order, which would permute the host
    path's RNG draw sequence)."""
    if isinstance(spec, dict):
        return {k: _spec_map(v, fn) for k, v in spec.items()}
    if isinstance(spec, list):
        return [_spec_map(v, fn) for v in spec]
    return fn(spec)


def init_params(
    cfg: WhisperConfig, key: jax.Array, dtype=jnp.float32,
    on_device: Optional[bool] = None,
) -> Params:
    """Randomly initialized parameter pytree with HF-compatible structure.

    Two materializers over one spec (:func:`_param_spec`):

    * **device** (default on non-CPU backends, SK_INIT_ON_DEVICE=1/0
      overrides): ONE jitted program generates every leaf from the PRNG
      key — the weights never cross the host↔device link. A 3.2 GB
      large-v3 upload over the axon tunnel takes minutes at best and has
      been observed to stall indefinitely on a degraded relay (round-5
      PERF_NOTES); the on-device path transfers 8 bytes.
    * **host** (CPU default): numpy draws seeded from ``key`` with one
      ``device_put`` at the end — value-stable with previous releases so
      CPU test fixtures are unchanged, and numpy avoids thousands of tiny
      device dispatches.
    """
    import os

    spec = _param_spec(cfg)
    if on_device is None:
        env = os.environ.get("SK_INIT_ON_DEVICE")
        on_device = (
            env == "1" if env is not None else jax.default_backend() != "cpu"
        )

    if on_device:
        leaves: list = []
        idx_tree = _spec_map(spec, lambda s: (leaves.append(s), len(leaves) - 1)[1])

        @jax.jit
        def gen(key):
            keys = jax.random.split(key, len(leaves))
            out = []
            for (kind, shape, arg), k in zip(leaves, keys):
                if kind in ("uniform", "uniform_r"):
                    a = jax.random.uniform(k, shape, jnp.float32, -arg, arg)
                elif kind == "normal":
                    a = arg * jax.random.normal(k, shape, jnp.float32)
                elif kind == "zeros":
                    a = jnp.zeros(shape, jnp.float32)
                elif kind == "ones":
                    a = jnp.ones(shape, jnp.float32)
                else:  # sinusoid
                    a = _sinusoids_jnp(*shape)
                out.append(a.astype(dtype))
            return out
        vals = gen(key)
        return _spec_map(idx_tree, lambda i: vals[i])

    seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1]) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    np_dtype = jnp.dtype(dtype)

    def materialize(leaf):
        kind, shape, arg = leaf
        if kind == "uniform":
            return rng.uniform(-arg, arg, shape).astype(np.float32).astype(np_dtype)
        if kind == "uniform_r":
            # draw as (d_in, d_out) then reshape (same flat C-order values)
            flat = (int(np.prod(shape[:-1])), shape[-1])
            return (
                rng.uniform(-arg, arg, flat).astype(np.float32).astype(np_dtype)
                .reshape(shape)
            )
        if kind == "normal":
            return rng.normal(0, arg, shape).astype(np.float32).astype(np_dtype)
        if kind == "zeros":
            return np.zeros(shape, np_dtype)
        if kind == "ones":
            return np.ones(shape, np_dtype)
        return sinusoids(*shape).astype(np_dtype)  # sinusoid

    return jax.device_put(_spec_map(spec, materialize))


def _sinusoids_jnp(length: int, channels: int, max_timescale: float = 10000.0):
    """:func:`sinusoids` expressed in jnp (traceable inside the on-device
    init program)."""
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = jnp.exp(-log_timescale_increment * jnp.arange(channels // 2))
    scaled_time = jnp.arange(length)[:, None] * inv_timescales[None, :]
    return jnp.concatenate(
        [jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=1
    ).astype(jnp.float32)


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions."""
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------
def _layernorm(x, p):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    y = jnp.matmul(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def _split_heads(x, n_head):
    *lead, t, d = x.shape
    return x.reshape(*lead, t, n_head, d // n_head).swapaxes(-3, -2)  # [..., h, t, hd]


def _merge_heads(x):
    *lead, h, t, hd = x.shape
    return x.swapaxes(-3, -2).reshape(*lead, t, h * hd)


def _attention(q, k, v, n_head, mask=None):
    """Scaled dot-product attention. q,k,v: [..., t, d].

    Non-causal full-sequence attention routes through the Pallas flash
    kernel on TPU (encoder self-attention — the hot path); masked/causal
    and tiny-sequence cases use plain XLA attention.
    """
    hd = q.shape[-1] // n_head
    scale = hd ** -0.25
    qh = _split_heads(q, n_head)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)
    if mask is None and qh.ndim == 4 and qh.shape[-2] >= 256 and hd % 64 == 0:
        from ...ops.attention import flash_attention, use_flash_attention

        if use_flash_attention():
            return _merge_heads(flash_attention(qh, kh, vh, scale))
    scores = jnp.matmul(
        qh * scale, (kh * scale).swapaxes(-1, -2), preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.matmul(probs, vh, preferred_element_type=jnp.float32).astype(q.dtype)
    return _merge_heads(out)


def _mlp(x, layer):
    # tanh-gelu when activations are bf16: its approximation error (~3e-4)
    # sits below bf16 rounding (~4e-3) and the erf polynomial costs
    # ~2.3 ms/layer on the VPU at batch 20; f32 paths keep exact gelu so
    # CPU parity tests match torch bit-for-bit tolerances
    approx = x.dtype == jnp.bfloat16
    return _dense(jax.nn.gelu(_dense(x, layer["mlp1"]), approximate=approx), layer["mlp2"])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------
def _conv1d(x, w, b, stride: int):
    """x: [batch, t, c_in]; w: [k, c_in, c_out] — NWC conv on the MXU."""
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + b


def encode(params: Params, cfg: WhisperConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """``mel [batch, n_frames, n_mels]`` → audio states ``[batch, n_audio_ctx, d]``.

    ``n_frames`` must be ``2 * n_audio_ctx`` (3000 for 30 s windows) — pad
    shorter audio with zeros mel-side (the standard Whisper recipe).
    """
    e = params["enc"]
    x = jax.nn.gelu(_conv1d(mel, e["conv1"]["w"], e["conv1"]["b"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, e["conv2"]["w"], e["conv2"]["b"], 2), approximate=False)
    # pos sliced to the actual context: shorter-than-30s window buckets reuse
    # the prefix of the position table (chunked-encoder streaming mode)
    x = x + e["pos"][: x.shape[-2]].astype(x.dtype)
    for layer in e["layers"]:
        h = _layernorm(x, layer["ln1"])
        attn = _attention(
            _dense(h, layer["attn"]["q"]),
            _dense(h, layer["attn"]["k"]),
            _dense(h, layer["attn"]["v"]),
            cfg.n_audio_head,
        )
        x = x + _dense(attn, layer["attn"]["o"])
        x = x + _mlp(_layernorm(x, layer["ln2"]), layer)
    return _layernorm(x, e["ln_post"])


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
def decode_logits(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # [batch, t]
    audio_states: jnp.ndarray,  # [batch, n_audio_ctx, d]
) -> jnp.ndarray:
    """Full-sequence (teacher-forced) decoder — training/parity path."""
    d = params["dec"]
    t = tokens.shape[-1]
    x = d["tok_emb"][tokens] + d["pos_emb"][:t]
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, dtype=jnp.float32), k=1)
    for layer in d["layers"]:
        h = _layernorm(x, layer["ln1"])
        attn = _attention(
            _dense(h, layer["attn"]["q"]),
            _dense(h, layer["attn"]["k"]),
            _dense(h, layer["attn"]["v"]),
            cfg.n_text_head,
            mask=causal,
        )
        x = x + _dense(attn, layer["attn"]["o"])
        hx = _layernorm(x, layer["ln_x"])
        xattn = _attention(
            _dense(hx, layer["xattn"]["q"]),
            _dense(audio_states, layer["xattn"]["k"]),
            _dense(audio_states, layer["xattn"]["v"]),
            cfg.n_text_head,
        )
        x = x + _dense(xattn, layer["xattn"]["o"])
        x = x + _mlp(_layernorm(x, layer["ln2"]), layer)
    x = _layernorm(x, d["ln"])
    return jnp.matmul(
        x, d["tok_emb"].T.astype(x.dtype), preferred_element_type=jnp.float32
    )


class KVCache(NamedTuple):
    """Decoder caches in **T-major layout** ``[..., head_dim, T]``.

    TPU lane padding note: with head_dim (64) as the minor dimension, every
    cache tile pads 64→128 lanes — a 2× HBM expansion that OOMed
    whisper-large at batch 16. Keeping T minor puts the padding on the long
    time axis (1500→1536, ~2%), halving cache memory.
    """

    k: jnp.ndarray  # [layers, batch, heads, head_dim, max_len]
    v: jnp.ndarray  # [layers, batch, heads, head_dim, max_len]
    xk: jnp.ndarray  # [layers, batch, heads, head_dim, n_audio_ctx] (bf16 or int8)
    xv: jnp.ndarray
    pos: jnp.ndarray  # [] int32 — next write position
    # per-token dequant scales when xk/xv are int8 ([L, B, H, 1, n_audio_ctx]
    # f32); zero-size arrays when the cross cache is kept full-precision.
    # Cross K/V dominates decode HBM traffic (large-v3 @ batch 24: 5.9 GB
    # re-read every token) — int8 halves both the reads and the footprint.
    xk_scale: jnp.ndarray
    xv_scale: jnp.ndarray

    @property
    def cross_quantized(self) -> bool:
        return self.xk_scale.size > 0


def _quantize_tmaj(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token symmetric int8 over the head_dim axis of ``[..., hd, T]``."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def init_kv_cache(
    params: Params,
    cfg: WhisperConfig,
    audio_states: jnp.ndarray,
    max_len: Optional[int] = None,
    cross_kv_int8: bool = False,
) -> KVCache:
    """Preallocate self-attn cache and precompute cross-attn K/V once.

    ``cross_kv_int8`` stores the (static) cross-attention K/V per-token
    int8-quantized with f32 scales — halves decode HBM traffic + cache
    memory; scores shift by <1% (below greedy-argmax sensitivity, same
    scheme whisper.cpp serves with)."""
    batch = audio_states.shape[0]
    max_len = max_len or cfg.n_text_ctx
    hd = cfg.n_text_state // cfg.n_text_head
    dtype = audio_states.dtype
    layers = params["dec"]["layers"]
    xk = jnp.stack(
        [
            _split_heads(_dense(audio_states, l["xattn"]["k"]), cfg.n_text_head).swapaxes(-1, -2)
            for l in layers
        ]
    )
    xv = jnp.stack(
        [
            _split_heads(_dense(audio_states, l["xattn"]["v"]), cfg.n_text_head).swapaxes(-1, -2)
            for l in layers
        ]
    )
    if cross_kv_int8:
        xk, xk_scale = _quantize_tmaj(xk)
        xv, xv_scale = _quantize_tmaj(xv)
    else:
        xk_scale = jnp.zeros((0,), jnp.float32)
        xv_scale = jnp.zeros((0,), jnp.float32)
    shape = (cfg.n_text_layer, batch, cfg.n_text_head, hd, max_len)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        xk=xk,
        xv=xv,
        pos=jnp.asarray(0, jnp.int32),
        xk_scale=xk_scale,
        xv_scale=xv_scale,
    )


def decode_step(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # [batch] current token ids
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One incremental decode step → (logits [batch, vocab], new cache)."""
    d = params["dec"]
    batch = tokens.shape[0]
    pos = cache.pos
    x = d["tok_emb"][tokens][:, None, :] + jax.lax.dynamic_slice_in_dim(d["pos_emb"], pos, 1)
    max_len = cache.k.shape[-1]
    hd = cfg.n_text_state // cfg.n_text_head
    # mask future cache slots: position j valid iff j <= pos
    idx = jnp.arange(max_len)
    mask = jnp.where(idx[None, :] <= pos, 0.0, -jnp.inf).astype(jnp.float32)[None, None, :]

    def _tmaj_attend(q, k_t, v_t, bias=None, k_scale=None, v_scale=None):
        """q [b,h,1,hd]; k_t/v_t in T-major [b,h,hd,T] → out [b,1,h*hd].

        With ``k_scale``/``v_scale`` set, k_t/v_t are per-token int8: the
        int8→bf16 convert fuses into the dot's operand read (HBM traffic
        stays int8) and scales apply to the f32 scores / fold into probs.
        """
        kmat = k_t.astype(x.dtype) if k_scale is not None else k_t
        scores = jnp.matmul(q, kmat, preferred_element_type=jnp.float32)  # [b,h,1,T]
        if k_scale is not None:
            scores = scores * k_scale  # [b,h,1,T] per-token scales
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if v_scale is not None:
            probs = probs * v_scale
            v_t = v_t.astype(x.dtype)
        probs = probs.astype(x.dtype)
        # contract over T with v in [hd, T]: einsum bhqt,bhdt->bhqd
        out = jnp.einsum(
            "bhqt,bhdt->bhqd", probs, v_t, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return _merge_heads(out)

    scale = hd ** -0.25
    new_k, new_v = cache.k, cache.v
    for i, layer in enumerate(d["layers"]):
        h = _layernorm(x, layer["ln1"])
        q = _split_heads(_dense(h, layer["attn"]["q"]), cfg.n_text_head)  # [b, h, 1, hd]
        k1 = _split_heads(_dense(h, layer["attn"]["k"]), cfg.n_text_head)  # [b, h, 1, hd]
        v1 = _split_heads(_dense(h, layer["attn"]["v"]), cfg.n_text_head)
        # write column `pos` of the T-major caches
        new_k = jax.lax.dynamic_update_slice(
            new_k, k1.swapaxes(-1, -2)[None], (i, 0, 0, 0, pos)
        )
        new_v = jax.lax.dynamic_update_slice(
            new_v, v1.swapaxes(-1, -2)[None], (i, 0, 0, 0, pos)
        )
        attn = _tmaj_attend(q * scale, new_k[i] * scale, new_v[i], bias=mask)
        x = x + _dense(attn, layer["attn"]["o"])
        # cross attention against precomputed enc K/V (already T-major)
        hx = _layernorm(x, layer["ln_x"])
        qx = _split_heads(_dense(hx, layer["xattn"]["q"]), cfg.n_text_head)
        if cache.cross_quantized:
            # int8 K can't absorb the d**-0.25 — fold both scales into q
            xattn = _tmaj_attend(
                qx * (scale * scale), cache.xk[i], cache.xv[i],
                k_scale=cache.xk_scale[i], v_scale=cache.xv_scale[i],
            )
        else:
            xattn = _tmaj_attend(qx * scale, cache.xk[i] * scale, cache.xv[i])
        x = x + _dense(xattn, layer["xattn"]["o"])
        x = x + _mlp(_layernorm(x, layer["ln2"]), layer)
    x = _layernorm(x, d["ln"])
    logits = jnp.matmul(x[:, 0], d["tok_emb"].T.astype(x.dtype), preferred_element_type=jnp.float32)
    return logits, cache._replace(k=new_k, v=new_v, pos=pos + 1)
