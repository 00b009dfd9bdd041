# SPDX-License-Identifier: Apache-2.0
"""Kokoro TTS — a distinct StyleTTS2-class stack (NOT the VITS backend).

Parity target: ``plugins/native/kokoro`` (sherpa-onnx OfflineTts,
``kokoro_node.rs:25-123,444-532,705-709``). The reference's model-dir
contract, which this loader implements exactly:

* ``model.onnx``     — the acoustic model graph (kokoro_node.rs:705)
* ``voices.bin``     — raw f32 voice-style pack (kokoro_node.rs:706)
* ``tokens.txt``     — ``<token> <id>`` phoneme table (kokoro_node.rs:707)
* ``espeak-ng-data/``, ``dict/`` — G2P data dirs (kokoro_node.rs:708-709)

Kokoro (v1.x, 82M params) is StyleTTS2-derived: a phoneme text encoder
(convs + BiLSTM), a style-conditioned prosody predictor (duration / F0 /
energy), and an ISTFTNet-style decoder that predicts STFT magnitude+phase
frames inverted to 24 kHz audio. The **voice** is a 256-d style vector:
``voices.bin`` holds, per speaker, 510 style rows indexed by input phoneme
length (the public kokoro voicepack layout ``[510, 1, 256]`` per voice;
sherpa concatenates speakers → ``[n_speakers, 510, 256]``) — speaker_id
0..102 for v1.1 (config.rs:14).

This module implements that architecture TPU-natively in JAX:

* graph weights: random-init by default (zero-egress environment) with the
  documented layout, or loaded from ``weights.npz`` in the model dir when
  a converted checkpoint is provisioned (``tools/convert_kokoro.py`` maps
  the ONNX tensor names once weights can be shipped),
* ``voices.bin`` / ``tokens.txt`` are parsed for real — speaker selection,
  style lookup by phoneme length, and token mapping all follow the
  reference contract and are exercised against the synthetic golden pack
  in ``samples/kokoro-golden`` (``tools/make_fixtures.py``),
* G2P: the espeak-ng data dirs are accepted but this build uses the
  character-level fallback path for unknown words (espeak is not in the
  image); ``tokens.txt`` entries are matched longest-first.

Compute shape notes (TPU): per-sentence batch=1 synthesis is dominated by
the decoder convs over mel frames — all static-shaped per length bucket
(sentence frames round up to ``FRAME_BUCKETS``) so XLA compiles a handful
of programs, not one per sentence.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "KokoroConfig",
    "KokoroTokens",
    "load_voices_bin",
    "load_kokoro_dir",
    "kokoro_init_params",
    "kokoro_synthesize",
    "kokoro_durations_batch",
    "kokoro_core_batch",
    "kokoro_bucket",
    "HOP",
    "STYLE_DIM",
    "STYLE_ROWS",
]

STYLE_DIM = 256  # kokoro style vector width
STYLE_ROWS = 510  # style rows per voice, indexed by phoneme length
SAMPLE_RATE = 24_000

# iSTFT head (ISTFTNet-style): 20 ms frames at 24 kHz, 4x hop overlap
N_FFT = 480
HOP = 120
FRAME_BUCKETS = (64, 128, 256, 512)


@dataclass(frozen=True)
class KokoroConfig:
    n_tokens: int = 178  # kokoro v1.1 tokens.txt size
    hidden: int = 512
    style_dim: int = STYLE_DIM
    n_text_convs: int = 3
    sample_rate: int = SAMPLE_RATE
    max_dur: int = 24  # max frames one phoneme can expand to


class KokoroTokens:
    """``tokens.txt`` table: ``<token> <id>`` per line (sherpa format)."""

    def __init__(self, table: Dict[str, int]) -> None:
        self.table = table
        self._keys = sorted(table, key=len, reverse=True)  # longest-first

    @classmethod
    def load(cls, path: str) -> "KokoroTokens":
        table: Dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                # token may BE a space: "<tok> <id>" → rsplit once
                tok, _, idx = line.rpartition(" ")
                if tok == "":
                    tok = " "
                table[tok] = int(idx)
        return cls(table)

    @property
    def n_tokens(self) -> int:
        return max(self.table.values()) + 1

    def encode(self, text: str) -> List[int]:
        """Longest-match tokenization (char-level G2P fallback — see module
        docstring; unknown characters are skipped like sherpa's OOV rule)."""
        ids: List[int] = []
        i = 0
        low = text.lower()
        while i < len(low):
            for k in self._keys:
                if low.startswith(k, i):
                    ids.append(self.table[k])
                    i += len(k)
                    break
            else:
                i += 1
        return ids


def load_voices_bin(path: str, style_rows: int = STYLE_ROWS, style_dim: int = STYLE_DIM) -> np.ndarray:
    """``voices.bin`` → ``[n_speakers, style_rows, style_dim]`` f32.

    The file is a raw little-endian f32 concatenation of per-voice style
    packs (kokoro voicepack ``[510, 1, 256]`` per voice, squeezed)."""
    raw = np.fromfile(path, dtype="<f4")
    per_voice = style_rows * style_dim
    if raw.size == 0 or raw.size % per_voice != 0:
        raise ValueError(
            f"voices.bin size {raw.size} is not a multiple of one voice pack "
            f"({style_rows}x{style_dim})"
        )
    return raw.reshape(-1, style_rows, style_dim)


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------
def _dense_init(key, n_in, n_out, dtype):
    w = jax.random.normal(key, (n_in, n_out), dtype) * (n_in**-0.5)
    return {"w": w, "b": jnp.zeros((n_out,), dtype)}


def _conv_init(key, k, n_in, n_out, dtype):
    w = jax.random.normal(key, (k, n_in, n_out), dtype) * ((k * n_in) ** -0.5)
    return {"w": w, "b": jnp.zeros((n_out,), dtype)}


def _lstm_init(key, n_in, n_h, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "wx": jax.random.normal(k1, (n_in, 4 * n_h), dtype) * (n_in**-0.5),
        "wh": jax.random.normal(k2, (n_h, 4 * n_h), dtype) * (n_h**-0.5),
        "b": jnp.zeros((4 * n_h,), dtype),
    }


def kokoro_init_params(cfg: KokoroConfig, key, dtype=jnp.float32):
    """Random-init parameter pytree with the documented component layout."""
    keys = jax.random.split(key, 24)
    h, s = cfg.hidden, cfg.style_dim
    p: dict = {
        "embed": jax.random.normal(keys[0], (cfg.n_tokens, h), dtype) * 0.02,
        "text_convs": [
            _conv_init(keys[1 + i], 5, h, h, dtype) for i in range(cfg.n_text_convs)
        ],
        "text_lstm_f": _lstm_init(keys[5], h, h // 2, dtype),
        "text_lstm_b": _lstm_init(keys[6], h, h // 2, dtype),
        # prosody predictor: style-conditioned duration / F0 / energy
        "pred_in": _dense_init(keys[7], h + s, h, dtype),
        "pred_lstm_f": _lstm_init(keys[8], h, h // 2, dtype),
        "pred_lstm_b": _lstm_init(keys[9], h, h // 2, dtype),
        "dur_out": _dense_init(keys[10], h, cfg.max_dur, dtype),
        "f0_out": _dense_init(keys[11], h, 1, dtype),
        "energy_out": _dense_init(keys[12], h, 1, dtype),
        # decoder (ISTFTNet-style): frame convs + mag/phase heads
        "dec_in": _dense_init(keys[13], h + s + 2, h, dtype),  # +F0 +energy
        "dec_convs": [_conv_init(keys[14 + i], 5, h, h, dtype) for i in range(4)],
        "mag_out": _dense_init(keys[18], h, N_FFT // 2 + 1, dtype),
        "phase_out": _dense_init(keys[19], h, N_FFT // 2 + 1, dtype),
    }
    return p


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------
def _lstm_scan(cell, xs, reverse=False):
    n_h = cell["wh"].shape[0]

    def step(carry, x):
        hprev, cprev = carry
        gates = x @ cell["wx"] + hprev @ cell["wh"] + cell["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * cprev + jax.nn.sigmoid(i) * jnp.tanh(g)
        hn = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (hn, c), hn

    init = (jnp.zeros((n_h,), xs.dtype), jnp.zeros((n_h,), xs.dtype))
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return hs


def _bilstm(pf, pb, xs):
    return jnp.concatenate([_lstm_scan(pf, xs), _lstm_scan(pb, xs, reverse=True)], axis=-1)


def _conv1d_same(x, w, b):
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[0]
    return y + b


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames"))
def _kokoro_core(
    params,
    cfg: KokoroConfig,
    tokens: jnp.ndarray,  # [T] int32 (padded)
    t_mask: jnp.ndarray,  # [T] 1/0
    style: jnp.ndarray,  # [style_dim]
    frame_idx: jnp.ndarray,  # [n_frames] int32 — source phoneme per frame
    f_mask: jnp.ndarray,  # [n_frames] 1/0
    n_frames: int,
):
    """Frame-expanded synthesis: durations were computed by
    :func:`_predict_durations`; this expands text states per ``frame_idx``
    and decodes audio. Static shapes per (T-bucket, frame-bucket)."""
    x = params["embed"][tokens]  # [T, H]
    for conv in params["text_convs"]:
        x = jax.nn.relu(_conv1d_same(x, conv["w"], conv["b"]))
    x = _bilstm(params["text_lstm_f"], params["text_lstm_b"], x)
    x = x * t_mask[:, None]

    sty = jnp.broadcast_to(style, (x.shape[0], style.shape[0]))
    hp = jax.nn.relu(jnp.concatenate([x, sty], axis=-1) @ params["pred_in"]["w"] + params["pred_in"]["b"])
    hp = _bilstm(params["pred_lstm_f"], params["pred_lstm_b"], hp)
    f0 = jax.nn.softplus(hp @ params["f0_out"]["w"] + params["f0_out"]["b"])  # [T,1]
    energy = jax.nn.sigmoid(hp @ params["energy_out"]["w"] + params["energy_out"]["b"])

    # length-regulate: gather per-frame phoneme states + prosody
    frames = x[frame_idx]  # [F, H]
    f0_f = f0[frame_idx]
    en_f = energy[frame_idx]
    sty_f = jnp.broadcast_to(style, (frames.shape[0], style.shape[0]))
    d = jnp.concatenate([frames, sty_f, f0_f, en_f], axis=-1)
    d = jax.nn.relu(d @ params["dec_in"]["w"] + params["dec_in"]["b"])
    for conv in params["dec_convs"]:
        d = d + jax.nn.relu(_conv1d_same(d, conv["w"], conv["b"]))
    d = d * f_mask[:, None]

    mag = jnp.exp(jnp.clip(d @ params["mag_out"]["w"] + params["mag_out"]["b"], -8, 4))
    phase = d @ params["phase_out"]["w"] + params["phase_out"]["b"]
    spec = mag * jnp.exp(1j * phase.astype(jnp.float32))  # [F, N_FFT/2+1]

    # inverse STFT with Hann overlap-add
    frames_t = jnp.fft.irfft(spec, n=N_FFT, axis=-1)  # [F, N_FFT]
    win = jnp.hanning(N_FFT).astype(jnp.float32)
    frames_t = frames_t * win * f_mask[:, None]
    out_len = n_frames * HOP + N_FFT
    idx = (jnp.arange(n_frames) * HOP)[:, None] + jnp.arange(N_FFT)[None, :]
    audio = jnp.zeros((out_len,), jnp.float32).at[idx.reshape(-1)].add(frames_t.reshape(-1))
    norm = jnp.zeros((out_len,), jnp.float32).at[idx.reshape(-1)].add(
        jnp.broadcast_to(win * win, (n_frames, N_FFT)).reshape(-1)
    )
    audio = audio / jnp.maximum(norm, 1e-3)
    return audio, f0[:, 0]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _predict_durations(params, cfg: KokoroConfig, tokens, t_mask, style):
    """Per-phoneme frame counts: argmax over the duration-class head
    (StyleTTS2 predicts duration via classification over 1..max_dur)."""
    x = params["embed"][tokens]
    for conv in params["text_convs"]:
        x = jax.nn.relu(_conv1d_same(x, conv["w"], conv["b"]))
    x = _bilstm(params["text_lstm_f"], params["text_lstm_b"], x)
    sty = jnp.broadcast_to(style, (x.shape[0], style.shape[0]))
    hp = jax.nn.relu(jnp.concatenate([x, sty], axis=-1) @ params["pred_in"]["w"] + params["pred_in"]["b"])
    hp = _bilstm(params["pred_lstm_f"], params["pred_lstm_b"], hp)
    logits = hp @ params["dur_out"]["w"] + params["dur_out"]["b"]  # [T, max_dur]
    dur = jnp.argmax(logits, axis=-1) + 1
    return (dur * t_mask).astype(jnp.int32)


def _bucket(n: int, buckets=FRAME_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def kokoro_synthesize(
    params,
    cfg: KokoroConfig,
    tokens: List[int],
    style_pack: np.ndarray,  # [STYLE_ROWS, style_dim] — one speaker's pack
    speed: float = 1.0,
) -> np.ndarray:
    """One sentence → 24 kHz f32 audio. Style row selected by phoneme
    length (the kokoro voicepack contract); ``speed`` scales durations."""
    if not tokens:
        return np.zeros(0, np.float32)
    t = len(tokens)
    t_pad = _bucket(t, (64, 128, 256, 512))
    tok = np.zeros(t_pad, np.int32)
    tok[:t] = np.asarray(tokens, np.int32) % cfg.n_tokens
    t_mask = np.zeros(t_pad, np.float32)
    t_mask[:t] = 1.0
    style = jnp.asarray(style_pack[min(t, style_pack.shape[0] - 1)], jnp.float32)

    dur = np.asarray(
        _predict_durations(params, cfg, jnp.asarray(tok), jnp.asarray(t_mask), style)
    )
    dur = np.maximum(1, np.round(dur[:t] / max(speed, 1e-3))).astype(np.int64)
    frame_idx = np.repeat(np.arange(t, dtype=np.int32), dur)
    n = len(frame_idx)
    f_pad = _bucket(n)
    fi = np.zeros(f_pad, np.int32)
    fi[:n] = frame_idx[:f_pad]
    f_mask = np.zeros(f_pad, np.float32)
    f_mask[: min(n, f_pad)] = 1.0

    audio, _ = _kokoro_core(
        params, cfg, jnp.asarray(tok), jnp.asarray(t_mask), style,
        jnp.asarray(fi), jnp.asarray(f_mask), f_pad,
    )
    out = np.asarray(audio)[: min(n, f_pad) * HOP]
    peak = np.abs(out).max() or 1.0
    return (out / max(peak, 1.0) * 0.7).astype(np.float32)


def kokoro_bucket(n: int, buckets=None) -> int:
    """Public pow-2/bucket helper (token buckets pass (64,128,256,512))."""
    return _bucket(n, buckets) if buckets is not None else _bucket(n)


def kokoro_durations_batch(params, cfg: KokoroConfig, tok_b, t_mask_b, style_b):
    """Batched duration prediction: rows are independent (vmapped)."""
    return jax.vmap(_predict_durations, in_axes=(None, None, 0, 0, 0))(
        params, cfg, tok_b, t_mask_b, style_b
    )


def kokoro_core_batch(params, cfg: KokoroConfig, tok_b, t_mask_b, style_b,
                      fi_b, f_mask_b, f_pad: int):
    """Batched text-encode + frame-expand + decode (vmapped _kokoro_core;
    row-exact vs single-row — the cross-session batching device call)."""
    return jax.vmap(_kokoro_core, in_axes=(None, None, 0, 0, 0, 0, 0, None))(
        params, cfg, tok_b, t_mask_b, style_b, fi_b, f_mask_b, f_pad
    )


# ---------------------------------------------------------------------------
# model-dir loader (reference contract)
# ---------------------------------------------------------------------------
def load_kokoro_dir(model_dir: str, dtype=jnp.float32):
    """Load a kokoro model dir per the reference layout (kokoro_node.rs:705-709).

    Returns (cfg, params, tokens, voices). ``weights.npz`` (converted
    checkpoint) is used when present; otherwise params are random-init with
    a warning left to the caller — voices/tokens are always real."""
    tokens_path = os.path.join(model_dir, "tokens.txt")
    voices_path = os.path.join(model_dir, "voices.bin")
    for p in (tokens_path, voices_path):
        if not os.path.exists(p):
            raise FileNotFoundError(f"kokoro model dir missing {os.path.basename(p)}: {model_dir}")
    tokens = KokoroTokens.load(tokens_path)
    voices = load_voices_bin(voices_path)
    cfg = KokoroConfig(n_tokens=max(tokens.n_tokens, 1))
    npz = os.path.join(model_dir, "weights.npz")
    if os.path.exists(npz):
        flat = dict(np.load(npz))
        if "embed" in flat:
            # the checkpoint is authoritative for the token-table size
            # (tokens.txt may cover a subset of the trained vocabulary)
            cfg = KokoroConfig(n_tokens=max(cfg.n_tokens, flat["embed"].shape[0]))
        params = _unflatten_params(cfg, flat, dtype)
    else:
        params = kokoro_init_params(cfg, jax.random.PRNGKey(0), dtype)
    return cfg, params, tokens, voices


def _unflatten_params(cfg: KokoroConfig, flat: Dict[str, np.ndarray], dtype):
    """``weights.npz`` uses '/'-joined keys mirroring the param pytree
    (tools/convert_kokoro.py writes this layout)."""
    params = kokoro_init_params(cfg, jax.random.PRNGKey(0), dtype)

    def walk(node, prefix):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{prefix}/{i}") for i, v in enumerate(node)]
        key = prefix
        if key in flat:
            arr = np.asarray(flat[key])
            if arr.shape != tuple(node.shape):
                raise ValueError(f"weights.npz[{key}] shape {arr.shape} != {tuple(node.shape)}")
            return jnp.asarray(arr, dtype)
        return node

    return walk(params, "")
