# SPDX-License-Identifier: Apache-2.0
"""Incremental (streaming) Whisper for live partial transcripts.

Round-2 partials re-encoded the whole bucketed segment on every partial
(~40 ms encode + up to ~20 sequential decode steps per emission — a
350-450 ms device-time floor per coalesced call, PERF_NOTES.md). Here each
partial costs one *chunk* encode (8 encoder positions = 160 ms of audio)
plus a handful of decode steps, against per-session device-resident caches:

* **chunk-causal encoder** — a new 160 ms chunk's queries attend to the
  cached K/V of all previous chunk positions plus the full current chunk
  (block lookahead), appending its own K/V and the decoder cross K/V to the
  session's slot in HBM. The conv frontend is computed with exact left/right
  audio context gathered from the session's audio ring
  (:mod:`streamkit_tpu.engine.audio_ring`), so conv outputs match the
  full-window encoder bit-for-bit; only attention is causal-ized.
* **continuation decoder** — emitted tokens are *frozen* (their self-attn
  K/V stay cached); each partial tick re-feeds the newest token against the
  grown cross-attention context and appends tokens until it proposes
  ``<|eot|>`` — which is *held back*, since more audio may continue the
  utterance (standard streaming-ASR practice).
* **fused block step** (:func:`_stream_step`) — VAD scoring + ring append +
  chunk encode + decode continuation in ONE device call per VAD block.
  Separate calls measured fine on paper but saturated the serving host:
  every dispatch costs Python/GIL time plus a tunnel round trip, and the
  latency bench host has ONE core — the fused step cuts the per-block call
  chain from 3 to 1 and decodes against audio that arrived in the same
  call (tip staleness ≈ one chunk instead of a whole dispatch chain).

Approximations (partials only — segment FINALS still run the exact
bidirectional encoder via :func:`..decode.transcribe_ring`):

* encoder attention is chunk-causal, not bidirectional,
* the log-mel dynamic-range floor (``max - 8``) uses the chunk-local max
  rather than the window-global max,
* committed partial tokens are never revised.

The reference emits only whole segments (``plugins/native/whisper/src/
lib.rs:404-490``); live partials are this framework's extension, so the
streaming path has no reference counterpart to mirror.

Memory: one slot holds enc K/V + cross K/V ``[heads, head_dim, ENC_T]``
per layer and decoder K/V ``[heads, head_dim, DEC_T]`` per layer. At
large-v3 with ENC_T=512 (10.24 s streaming horizon) that is ~190 MB/slot
in bf16. The four ENC_T-sized caches (~178 of those MB) are therefore
stored **int8-quantized with per-column scales** by default
(``SK_STREAM_KV_INT8``, absmax over head_dim — the same scheme the bucket
path proved greedy-stable for cross-KV): ~110 MB/slot, so the default 64
slots (``SK_STREAM_SLOTS``) fit in ~7 GB HBM next to the large-v3 weights.
Decoder self-attention K/V stay in model dtype (small, and self-attn is
the quality-sensitive cache). Quantization happens at append time, and
attention *reads the quantized values* (XLA fuses the dequant into the
matmul operand load, so HBM traffic per decode step is int8 — the
bandwidth win is why this can also be slightly faster, not just smaller).
Caches are **flat chunk-row buffers** — one per cache kind, rows =
``(slot · L + layer) · n_chunks + chunk`` — so every append is ONE
contiguous row scatter per kind instead of hundreds of per-layer column
scatters (see the cache-representation note above :func:`_kv_enc_t` for
the on-chip measurements that force this). Sessions that fail to get a
slot fall back to the bucket re-decode partial path.
"""

from __future__ import annotations

import functools
import os
import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .model import Params, _dense, _layernorm, _merge_heads, _mlp, _split_heads
from ...ops.mel import HOP_LENGTH, N_FFT, _dft_bases, _mel_mat
from ...ops.vad import vad_frame_probs

__all__ = ["StreamTable", "CHUNK_SAMPLES", "CHUNK_POS", "RIGHT_CTX"]

# One streaming chunk: 8 encoder positions = 16 mel frames = 2560 samples
# (160 ms @16 kHz). Encoder position = 2 mel frames = 320 samples.
CHUNK_POS = 8
CHUNK_MEL = 2 * CHUNK_POS  # 16
CHUNK_SAMPLES = CHUNK_MEL * HOP_LENGTH  # 2560
# conv context: chunk enc positions p0..p0+7 need mel frames 2p0-2..2p0+16;
# mel frame t covers samples [t*160-200, t*160+200). Left: 2 mel frames +
# fft half-window = 520 → round up to 560 (3.5 hops) for hop alignment.
LEFT_CTX = 560
RIGHT_CTX = 200  # mel frame t0+16 reads 200 samples past the chunk end
GATHER = LEFT_CTX + CHUNK_SAMPLES + RIGHT_CTX  # 3320
_N_MEL_FRAMES = 19  # t0-2 .. t0+16


def _chunk_mel(audio: jnp.ndarray, n_mels: int, n_frames: int = _N_MEL_FRAMES) -> jnp.ndarray:
    """``[B, gather]`` audio → ``[B, n_frames, n_mels]`` log-mel for the
    chunk's conv context (frames t0-2..t0+16·n; local frame j starts at
    sample 40 + j*160). Dynamic-range floor uses the chunk-local max."""
    starts = 40 + np.arange(n_frames) * HOP_LENGTH
    idx = starts[:, None] + np.arange(N_FFT)[None, :]
    frames = audio[:, idx]  # [B, n_frames, 400]
    cos_b, sin_b = _dft_bases(N_FFT)
    re = jnp.matmul(frames, cos_b, preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, sin_b, preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.matmul(power, _mel_mat(n_mels), preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def _conv_valid(x, w, b, stride: int):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((0, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + b


# ---------------------------------------------------------------------------
# int8 KV cache (tuple pytree (q8 [.., hd, T], scale [.., 1, T]) vs plain array)
# ---------------------------------------------------------------------------
def _quant_cols(cols: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``[B, H, hd, c]`` float cols → (int8 cols, f32 per-column scales
    ``[B, H, 1, c]``). Scale = absmax over head_dim / 127."""
    f = cols.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(f), axis=2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _scores_vs_cache(qs, rows, op_scale, dtype):
    """``qs [B,H,c,hd]`` (pre-scaled) · cache rows → f32 scores ``[B,H,c,T]``.

    For quantized rows the per-column scale is applied AFTER the dot
    (scores[..,t] = (Σ_d q·k8) · s[t]): the int8 tensor feeds the matmul
    operand directly. A generic dequant-then-matmul materializes an ~84 MB
    bf16 buffer per tensor per layer (per decode step!) — measured as the
    bulk of the fused step's decode time at B=64."""
    if isinstance(rows, tuple):
        raw = jnp.matmul(
            qs, rows[0].astype(dtype) * op_scale, preferred_element_type=jnp.float32
        )
        return raw * rows[1][:, :, 0, :][:, :, None, :]
    return jnp.matmul(qs, rows * op_scale, preferred_element_type=jnp.float32)


def _attend_cache(probs, rows, dtype):
    """``probs [B,H,c,T]`` f32 · cache values → ``[B,H,c,hd]`` f32. For
    quantized rows the column scale folds into the probabilities
    (Σ_t p·v8·s = Σ_t (p·s)·v8), keeping the int8 operand on the einsum."""
    if isinstance(rows, tuple):
        p = (probs * rows[1][:, :, 0, :][:, :, None, :]).astype(dtype)
        return jnp.einsum(
            "bhqt,bhdt->bhqd", p, rows[0].astype(dtype), preferred_element_type=jnp.float32
        )
    return jnp.einsum(
        "bhqt,bhdt->bhqd", probs.astype(dtype), rows, preferred_element_type=jnp.float32
    )


# Cache representation: ONE flat chunk-row buffer per cache kind,
#
#     data  ``[(S · L · NCH), H·8·hd]``  (int8 or model dtype)
#     scale ``[(S · L), H, T]`` f32       (int8 kinds only; per-column)
#
# with s-major rows (``row = (s·L + l)·NCH + chunk``) so dp-sharding over
# slots stays a contiguous axis-0 split, and the head dim MAJOR inside the
# flat row so tp-sharding splits the lane dim at a head boundary. Three
# measured constraints force this (all real-chip, B=64, large-v3):
#
# * a monolithic ``[S, L, ...]`` buffer + whole-cache gather OOMs at B=64,
#   and per-layer ``.at[ids, li].set`` chains copy the WHOLE table once per
#   layer (195→850 ms going 8→64 slots at the same batch),
# * per-layer buffer LISTS fix the copies but pay ~0.5 ms of fixed
#   per-scatter cost × 256 write ops per fused step (~80 ms), and TPU 2-D
#   (row, col) scatters additionally cost ~0.6 µs per *index pair*,
# * chunk-aligned flat rows make every append ONE whole-row scatter per
#   cache kind — contiguous ``H·8·hd`` windows, no index pairs — which
#   measures at the dispatch floor (<5 ms for all four kinds together).
#   Encoder positions only advance in whole chunks (``adv = 8·commit``),
#   so chunk-row granularity is exact, not an approximation. Uncommitted
#   chunks and pad rows are dropped by pointing their scatter row out of
#   bounds (``mode="drop"``) instead of read-modify-writing old values.
#
# Per-column f32 scales stay exact; they are written by a dense
# select over the (small) scale buffer — one fused elementwise op per
# kind — not by scatter.


def _kv_enc_t(cache, L: int, S: int) -> int:
    """Columns (T) of a flat chunk-row cache."""
    if isinstance(cache, tuple):
        return cache[1].shape[-1]
    return (cache.shape[0] // (L * S)) * CHUNK_POS


def _hist_one(cache, L: int, li: int, H: int, hd: int, enc_t: int, ids):
    """Gather ONE layer's history rows for batch rows ``ids``:
    → ``(q8 [B,NCH,H,8,hd], scale [B,H,T])`` for int8 kinds, else
    ``[B,NCH,H,8,hd]`` in the cache dtype. Row gathers of contiguous
    flat rows measure at the dispatch floor; gathering per layer (instead
    of one stacked gather for all layers) keeps temp lifetimes to one
    layer — a stacked 2.7 GB gather of both K and V OOM'd at 64 slots."""
    nch = enc_t // CHUNK_POS
    b = ids.shape[0]
    base = (ids * L + li) * nch  # [B]
    rows = (base[:, None] + jnp.arange(nch, dtype=jnp.int32)).reshape(-1)
    if isinstance(cache, tuple):
        q8 = cache[0][rows].reshape(b, nch, H, CHUNK_POS, hd)
        sc = cache[1][ids * L + li]  # [B,H,T]
        return q8, sc
    return cache[rows].reshape(b, nch, H, CHUNK_POS, hd)


def _scores_hist(qs, hist_li, op_scale, dtype):
    """``qs [B,H,q,hd]`` (pre-scaled) · chunk-row history → f32 scores
    ``[B,H,q,T]``. int8 operands feed the einsum directly; the per-column
    scale multiplies the f32 scores afterwards."""
    if isinstance(hist_li, tuple):
        q8, sc = hist_li
        raw = jnp.einsum(
            "bhqd,bchkd->bhqck", qs, q8.astype(dtype) * op_scale,
            preferred_element_type=jnp.float32,
        )
        b, h, q = raw.shape[:3]
        return raw.reshape(b, h, q, -1) * sc[:, :, None, :]
    raw = jnp.einsum(
        "bhqd,bchkd->bhqck", qs, hist_li * op_scale,
        preferred_element_type=jnp.float32,
    )
    b, h, q = raw.shape[:3]
    return raw.reshape(b, h, q, -1)


def _attend_hist(probs, hist_li, dtype):
    """``probs [B,H,q,T]`` f32 · chunk-row history values → ``[B,H,q,hd]``
    f32. The column scale folds into the probabilities so the int8 operand
    stays on the einsum."""
    if isinstance(hist_li, tuple):
        q8, sc = hist_li
        nch = q8.shape[1]
        p = (probs * sc[:, :, None, :]).astype(dtype)
        b, h, q = p.shape[:3]
        p = p.reshape(b, h, q, nch, CHUNK_POS)
        return jnp.einsum(
            "bhqck,bchkd->bhqd", p, q8.astype(dtype), preferred_element_type=jnp.float32
        )
    nch = hist_li.shape[1]
    b, h, q = probs.shape[:3]
    p = probs.astype(dtype).reshape(b, h, q, nch, CHUNK_POS)
    return jnp.einsum(
        "bhqck,bchkd->bhqd", p, hist_li, preferred_element_type=jnp.float32
    )


def _cand_chunk_rows(cand, n_chunks: int):
    """Per-column candidates ``[L,B,H,hd,c]`` → chunk rows
    ``[L,B,n_chunks,H,8,hd]`` (the flat-row write layout)."""
    L, b, H, hd, c = cand.shape
    x = jnp.moveaxis(cand, -1, 2)  # [L,B,c,H,hd]
    x = x.reshape(L, b, n_chunks, CHUNK_POS, H, hd)
    return jnp.swapaxes(x, 3, 4)  # [L,B,n_chunks,H,8,hd]


def _write_kind(cache, cands, ids, pos, commit, enc_t: int, n_chunks: int):
    """Append every layer's candidate chunk K or V into a flat chunk-row
    cache with ONE row scatter (+ one dense scale select for int8 kinds).

    ``cands``: list over L of per-column candidates — ``(q8 [B,H,hd,c],
    scale [B,H,1,c])`` tuples (int8 cache) or plain ``[B,H,hd,c]`` arrays.
    ``commit [B]``: chunks to actually write per row (None = all);
    uncommitted chunks and pad rows scatter out of bounds → dropped."""
    nch = enc_t // CHUNK_POS
    b = ids.shape[0]
    quant = isinstance(cache, tuple)
    L = len(cands)
    cq = jnp.stack([c[0] if quant else c for c in cands])  # [L,B,H,hd,c]
    rows_v = _cand_chunk_rows(cq, n_chunks)  # [L,B,nc,H,8,hd]
    flat_v = rows_v.reshape(L * b * n_chunks, -1)

    c0 = pos // CHUNK_POS
    j = jnp.arange(n_chunks, dtype=jnp.int32)
    phys = (c0[:, None] + j[None, :]) % nch  # [B,nc]
    l = jnp.arange(L, dtype=jnp.int32)[:, None, None]
    rows = (ids[None, :, None] * L + l) * nch + phys[None]  # [L,B,nc]
    if commit is not None:
        # out-of-bounds rows are DROPPED by the scatter — no RMW needed
        n_rows = (cache[0] if quant else cache).shape[0]
        rows = jnp.where(j[None, None, :] < commit[None, :, None], rows, n_rows)
    flat = (cache[0] if quant else cache).at[rows.reshape(-1)].set(
        flat_v, mode="drop"
    )
    if not quant:
        return flat

    # scales: dense select over the [S·L, H, T] f32 buffer (one fused op)
    sc_buf = cache[1]
    S = sc_buf.shape[0] // L
    cs = jnp.stack([c[1][:, :, 0, :] for c in cands])  # [L,B,H,c]
    inv = jnp.zeros((S,), jnp.int32).at[ids].set(
        jnp.arange(b, dtype=jnp.int32), mode="drop"
    )
    own = jnp.zeros((S,), bool).at[ids].set(True, mode="drop")
    posS = pos[inv]
    t = jnp.arange(enc_t, dtype=jnp.int32)
    rel = (t[None, :] - posS[:, None]) % enc_t  # [S,T]
    c = cs.shape[-1]
    lim = (
        jnp.full((S,), c, jnp.int32)
        if commit is None
        else CHUNK_POS * commit[inv]
    )
    m = own[:, None] & (rel < lim[:, None])  # [S,T]
    relc = jnp.minimum(rel, c - 1)
    candS = jnp.moveaxis(cs, 0, 1)[inv]  # [S,L,H,c]
    g = jnp.take_along_axis(candS, relc[:, None, None, :], axis=-1)  # [S,L,H,T]
    new_sc = jnp.where(
        m[:, None, None, :], g, sc_buf.reshape(S, L, *sc_buf.shape[1:])
    ).reshape(sc_buf.shape)
    return flat, new_sc


def _quant_like(cache, cols_f: jnp.ndarray):
    """Candidate columns ``[B, H, hd, c]`` in the cache's representation:
    (q8, scale) when the cache is quantized, else cast to its dtype.
    Attention reads THESE (quantized) values so later reads of the stored
    cache see exactly what this call attended to."""
    if isinstance(cache, tuple):
        return _quant_cols(cols_f)
    return cols_f.astype(cache.dtype)


# ---------------------------------------------------------------------------
# traced cores (shared by the standalone jits and the fused block step)
# ---------------------------------------------------------------------------
def _encode_core(
    params: Params,
    cfg: WhisperConfig,
    ring: jnp.ndarray,
    slot_ids: jnp.ndarray,
    starts: jnp.ndarray,
    ek,  # flat chunk-row cache pytrees (see the cache-representation note)
    ev,
    xkr,
    xvr,
    stream_ids: jnp.ndarray,  # [B] rows into the tables
    pos_rows: jnp.ndarray,  # [B]
    n_chunks: int,
    enc_t: int,
    commit: Optional[jnp.ndarray] = None,  # [B] int32 chunks to commit (None = all)
):
    """Encode ``n_chunks`` consecutive chunks per row from the audio ring and
    append enc K/V + cross K/V into the tables at ``stream_ids``. With
    ``commit``, only each row's first ``commit[b]`` chunks are written (the
    rest are dropped by the scatter) and positions advance by
    ``8*commit[b]`` — rows may lag/lead each other inside one fused batched
    call.

    The four caches (``ek/ev/xkr/xvr``) are flat-or-(int8, scale) pytrees;
    attention reads the *quantized* values (dequant fused into the matmul),
    so later chunks see exactly what this chunk stored. Returns the updated
    tables + new positions."""
    dtype = params["enc"]["pos"].dtype
    ring_samples = ring.shape[1]
    n_pos = CHUNK_POS * n_chunks
    gather = LEFT_CTX + CHUNK_SAMPLES * n_chunks + RIGHT_CTX
    g0 = starts - LEFT_CTX
    idx = (g0[:, None] + jnp.arange(gather, dtype=jnp.int32)) % ring_samples
    audio = ring[slot_ids[:, None], idx].astype(jnp.float32) / 32768.0
    mel = _chunk_mel(audio, cfg.n_mels, 16 * n_chunks + 3).astype(dtype)

    e = params["enc"]
    x = jax.nn.gelu(_conv_valid(mel, e["conv1"]["w"], e["conv1"]["b"], 1), approximate=False)
    x = jax.nn.gelu(_conv_valid(x, e["conv2"]["w"], e["conv2"]["b"], 2), approximate=False)
    # x: [B, n_pos, d]; per-row segment-relative positions
    p = pos_rows[:, None] + jnp.arange(n_pos, dtype=jnp.int32)
    x = x + e["pos"].astype(dtype)[jnp.minimum(p, e["pos"].shape[0] - 1)]

    He = cfg.n_audio_head
    hde = cfg.n_audio_state // He
    hd_scale = hde ** -0.25
    col = jnp.arange(enc_t, dtype=jnp.int32)
    # split attention = history (cached rows, read in place) + candidates
    # (this call's n_pos new positions). History is visible to every query;
    # candidates are block-causal WITHIN the call: a query in chunk j sees
    # candidate j2 only when j2 < (j//8+1)*8 — exactly matching j
    # sequential 1-chunk calls (full lookahead inside each 160 ms chunk,
    # none across). Attention must see ALL candidates regardless of commit;
    # only the cache WRITE is commit-guarded.
    j = jnp.arange(n_pos, dtype=jnp.int32)
    qblk = (j // CHUNK_POS + 1) * CHUNK_POS
    hist_mask = jnp.where(
        col[None, :] < pos_rows[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)[:, None, None, :]  # [B,1,1,T]
    cand_mask = jnp.where(
        j[None, :] < qblk[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)[None, None, :, :]  # [1,1,n_pos,n_pos]

    Le = cfg.n_audio_layer
    cand_ks, cand_vs = [], []
    for li, layer in enumerate(e["layers"]):
        h = _layernorm(x, layer["ln1"])
        q = _split_heads(_dense(h, layer["attn"]["q"]), He)  # [B,H,c,hd]
        k = _split_heads(_dense(h, layer["attn"]["k"]), He)
        v = _split_heads(_dense(h, layer["attn"]["v"]), He)
        kq = _quant_like(ek, k.swapaxes(-1, -2))
        vq = _quant_like(ev, v.swapaxes(-1, -2))
        cand_ks.append(kq)
        cand_vs.append(vq)
        qs = q * hd_scale
        # history rows: pre-write state, gathered per layer (short-lived)
        ek_li = _hist_one(ek, Le, li, He, hde, enc_t, stream_ids)
        ev_li = _hist_one(ev, Le, li, He, hde, enc_t, stream_ids)
        scores_h = _scores_hist(qs, ek_li, hd_scale, dtype)
        scores_c = _scores_vs_cache(qs, kq, hd_scale, dtype)  # [B,H,c,n_pos]
        scores = jnp.concatenate(
            [scores_h + hist_mask, scores_c + cand_mask], axis=-1
        )
        probs = jax.nn.softmax(scores, axis=-1)
        p_h, p_c = probs[..., :enc_t], probs[..., enc_t:]
        out = (
            _attend_hist(p_h, ev_li, dtype)
            + _attend_cache(p_c, vq, dtype)
        ).astype(dtype)
        x = x + _dense(_merge_heads(out), layer["attn"]["o"])
        x = x + _mlp(_layernorm(x, layer["ln2"]), layer)
    enc_out = _layernorm(x, e["ln_post"])  # [B, c, d]

    cand_xk, cand_xv = [], []
    for layer in params["dec"]["layers"]:
        kx = _split_heads(_dense(enc_out, layer["xattn"]["k"]), cfg.n_text_head)
        vx = _split_heads(_dense(enc_out, layer["xattn"]["v"]), cfg.n_text_head)
        cand_xk.append(_quant_like(xkr, kx.swapaxes(-1, -2)))
        cand_xv.append(_quant_like(xvr, vx.swapaxes(-1, -2)))

    # ONE row scatter (+ scale select) per cache kind
    ek = _write_kind(ek, cand_ks, stream_ids, pos_rows, commit, enc_t, n_chunks)
    ev = _write_kind(ev, cand_vs, stream_ids, pos_rows, commit, enc_t, n_chunks)
    xkr = _write_kind(xkr, cand_xk, stream_ids, pos_rows, commit, enc_t, n_chunks)
    xvr = _write_kind(xvr, cand_xv, stream_ids, pos_rows, commit, enc_t, n_chunks)

    adv = n_pos if commit is None else CHUNK_POS * commit
    return ek, ev, xkr, xvr, pos_rows + adv


def _decode_core(
    params: Params,
    cfg: WhisperConfig,
    dk,  # [S, Ld, H, hd, DEC_T] table pytree (per-layer gathers, see above)
    dv,
    xkr,  # [S, Ld, H, hd, ENC_T] tables
    xvr,
    stream_ids: jnp.ndarray,  # [B] rows into the tables
    ep: jnp.ndarray,  # [B] encoder positions (cross-attn horizon)
    tok: jnp.ndarray,  # [B, DEC_T]
    fed_r: jnp.ndarray,
    n_r: jnp.ndarray,
    active0: jnp.ndarray,  # [B] bool — rows allowed to step at all
    max_steps: int,
    enc_t: int,
):
    """Greedy continuation scan. Per step a row feeds ``tokens[min(fed,
    n_tok-1)]`` (re-feeding the newest token when caught up refreshes its
    K/V and logits against new audio), then — once caught up — appends the
    argmax unless it is ``<|eot|>``, which is held back (the utterance may
    continue). Rows stop on eot; the next tick retries with more audio.

    Cost structure (measured): the scan-invariant cross K/V rows are
    gathered ONCE before the scan (they don't change during decode), and
    the decoder self K/V rows are gathered into batch-local working copies
    that the scan carries — per-step writes land on the small local buffer
    (one scatter for all layers; inactive rows scatter out of bounds and
    drop) and the big table is written back once after the scan."""
    d = params["dec"]
    dtype = params["enc"]["pos"].dtype
    eot = jnp.int32(cfg.token_eot)
    Ld = cfg.n_text_layer
    Ht = cfg.n_text_head
    hd = cfg.n_text_state // Ht
    dec_t = dk.shape[-1]
    scale = hd ** -0.25
    b = tok.shape[0]
    bi = jnp.arange(b)

    # batch-local self K/V working rows, carried through the scan
    l = jnp.arange(Ld, dtype=jnp.int32)[:, None]
    dkv_rows = (stream_ids[None, :] * Ld + l).reshape(-1)  # [Ld*B]
    dkl = dk[dkv_rows].reshape(Ld, b, Ht, hd, dec_t)
    dvl = dv[dkv_rows].reshape(Ld, b, Ht, hd, dec_t)

    xcol = jnp.arange(enc_t, dtype=jnp.int32)
    # max(ep, 1) keeps the softmax finite for not-yet-encoded rows (they are
    # masked inactive below; this only avoids NaN noise in the dead lanes)
    xmask = jnp.where(
        xcol[None, :] < jnp.maximum(ep, 1)[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)[:, None, None, :]
    dcol = jnp.arange(dec_t, dtype=jnp.int32)
    lb = jnp.arange(Ld * b)

    def step(carry, _):
        dkl, dvl, tok, fed_r, n_r, done = carry
        active = jnp.logical_and(~done, jnp.logical_and(n_r > 0, ep > 0))
        feed_idx = jnp.minimum(fed_r, n_r - 1)
        feed_idx = jnp.maximum(feed_idx, 0)
        cur = tok[bi, feed_idx]
        x = d["tok_emb"][cur][:, None, :] + d["pos_emb"][feed_idx][:, None, :]
        x = x.astype(dtype)
        # split self-attention: history (local rows, col < feed_idx) +
        # the current token's fresh K/V — no cache copies, no reads-back
        smask = jnp.where(
            dcol[None, :] < feed_idx[:, None], 0.0, -jnp.inf
        ).astype(jnp.float32)[:, None, None, :]
        kcols, vcols = [], []
        for li, layer in enumerate(d["layers"]):
            h = _layernorm(x, layer["ln1"])
            q = _split_heads(_dense(h, layer["attn"]["q"]), Ht)  # [B,H,1,hd]
            k1 = _split_heads(_dense(h, layer["attn"]["k"]), Ht)
            v1 = _split_heads(_dense(h, layer["attn"]["v"]), Ht)
            kcol = k1.swapaxes(-1, -2)  # [B,H,hd,1]
            vcol = v1.swapaxes(-1, -2)
            kcols.append(kcol)
            vcols.append(vcol)
            qs = q * scale
            scores_h = jnp.matmul(qs, dkl[li] * scale, preferred_element_type=jnp.float32)
            scores_c = jnp.matmul(qs, kcol * scale, preferred_element_type=jnp.float32)
            scores = jnp.concatenate([scores_h + smask, scores_c], axis=-1)
            probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
            p_h, p_c = probs[..., :dec_t], probs[..., dec_t:]
            attn = (
                jnp.einsum("bhqt,bhdt->bhqd", p_h, dvl[li], preferred_element_type=jnp.float32)
                + jnp.einsum("bhqt,bhdt->bhqd", p_c, vcol, preferred_element_type=jnp.float32)
            ).astype(dtype)
            x = x + _dense(_merge_heads(attn), layer["attn"]["o"])
            hx = _layernorm(x, layer["ln_x"])
            qx = _split_heads(_dense(hx, layer["xattn"]["q"]), Ht)
            # cross K/V rows: per-layer gathers (cheap; stacked pre-scan
            # gathers of both kinds held ~2.7 GB live and OOM'd at 64 slots)
            xk_li = _hist_one(xkr, Ld, li, Ht, hd, enc_t, stream_ids)
            xv_li = _hist_one(xvr, Ld, li, Ht, hd, enc_t, stream_ids)
            xs = _scores_hist(qx * scale, xk_li, scale, dtype)
            xp = jax.nn.softmax(xs + xmask, axis=-1)
            xa = _attend_hist(xp, xv_li, dtype).astype(dtype)
            x = x + _dense(_merge_heads(xa), layer["xattn"]["o"])
            x = x + _mlp(_layernorm(x, layer["ln2"]), layer)
        # deferred self-K/V append: ONE scatter per kind for all layers;
        # inactive rows point their column out of bounds → dropped
        wcol = jnp.where(active, feed_idx, dec_t)
        wcolL = jnp.tile(wcol, Ld)
        kstk = jnp.stack(kcols).reshape(Ld * b, Ht, hd)
        vstk = jnp.stack(vcols).reshape(Ld * b, Ht, hd)
        dkl = (
            dkl.reshape(Ld * b, Ht, hd, dec_t)
            .at[lb, :, :, wcolL]
            .set(kstk, mode="drop")
            .reshape(Ld, b, Ht, hd, dec_t)
        )
        dvl = (
            dvl.reshape(Ld * b, Ht, hd, dec_t)
            .at[lb, :, :, wcolL]
            .set(vstk, mode="drop")
            .reshape(Ld, b, Ht, hd, dec_t)
        )
        xfin = _layernorm(x, d["ln"])
        logits = jnp.matmul(
            xfin[:, 0], d["tok_emb"].T.astype(dtype), preferred_element_type=jnp.float32
        )  # [B, vocab]
        fed_new = jnp.where(active, feed_idx + 1, fed_r)
        proposing = jnp.logical_and(active, fed_new == n_r)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        append = jnp.logical_and(
            proposing, jnp.logical_and(nxt != eot, n_r < dec_t - 1)
        )
        wpos = jnp.minimum(n_r, dec_t - 1)
        tok = tok.at[bi, wpos].set(jnp.where(append, nxt, tok[bi, wpos]))
        n_new = n_r + append.astype(jnp.int32)
        done = jnp.logical_or(done, jnp.logical_and(proposing, ~append))
        done = jnp.logical_or(done, ~active)
        return (dkl, dvl, tok, fed_new, n_new, done), None

    done0 = ~active0
    (dkl, dvl, tok, fed_r, n_r, _), _ = jax.lax.scan(
        step, (dkl, dvl, tok, fed_r, n_r, done0), None, length=max_steps
    )
    # write the worked rows back to the big tables once
    dk = dk.at[dkv_rows].set(dkl.reshape(Ld * b, Ht, hd, dec_t))
    dv = dv.at[dkv_rows].set(dvl.reshape(Ld * b, Ht, hd, dec_t))
    return dk, dv, tok, fed_r, n_r


# ---------------------------------------------------------------------------
# jitted steps
# ---------------------------------------------------------------------------
@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_chunks", "enc_t"),
    donate_argnums=(1, 2, 3, 4, 5),
)
def _stream_encode(
    params: Params,
    enc_k,  # flat chunk-row cache pytrees (cache-representation note)
    enc_v,
    xk,
    xv,
    enc_pos: jnp.ndarray,  # [S] int32
    ring: jnp.ndarray,  # [slots, ring_samples] int16
    slot_ids: jnp.ndarray,  # [B] audio-ring slots
    stream_ids: jnp.ndarray,  # [B] stream-table slots
    starts: jnp.ndarray,  # [B] absolute chunk start samples
    cfg: WhisperConfig,
    n_chunks: int = 1,
    enc_t: int = 512,
):
    """Standalone batched chunk encode (the fused block step is the serving
    path; this remains for tools/tests and mixed pipelines)."""
    pos_rows = enc_pos[stream_ids]
    enc_k, enc_v, xk, xv, pos_new = _encode_core(
        params, cfg, ring, slot_ids, starts,
        enc_k, enc_v, xk, xv, stream_ids, pos_rows, n_chunks, enc_t,
    )
    enc_pos = enc_pos.at[stream_ids].set(pos_new)
    return enc_k, enc_v, xk, xv, enc_pos, pos_new


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_steps", "enc_t"),
    donate_argnums=(1, 2, 3, 4, 5),
)
def _stream_decode(
    params: Params,
    dec_k: jnp.ndarray,  # [S·Ld, H, hd, DEC_T]
    dec_v: jnp.ndarray,
    tokens: jnp.ndarray,  # [S, DEC_T] int32
    fed: jnp.ndarray,  # [S] int32 — tokens fed through the decoder
    n_tok: jnp.ndarray,  # [S] int32 — tokens in the buffer (incl. prefix)
    xk,
    xv,
    enc_pos: jnp.ndarray,
    stream_ids: jnp.ndarray,  # [B]
    cfg: WhisperConfig,
    max_steps: int,
    enc_t: int = 512,
):
    """Standalone batched decode continuation (see :func:`_decode_core`)."""
    b = stream_ids.shape[0]
    dec_k, dec_v, tok, fed_r, n_r = _decode_core(
        params, cfg,
        dec_k, dec_v, xk, xv, stream_ids, enc_pos[stream_ids],
        tokens[stream_ids], fed[stream_ids], n_tok[stream_ids],
        jnp.ones((b,), bool), max_steps, enc_t,
    )
    tokens = tokens.at[stream_ids].set(tok)
    fed = fed.at[stream_ids].set(fed_r)
    n_tok = n_tok.at[stream_ids].set(n_r)
    return dec_k, dec_v, tokens, fed, n_tok, tok, n_r


# meta vector layout for the fused step: ONE int32 array carries every
# per-row scalar so a batched call transfers 2 host arrays (meta + frames)
# instead of 9 — each per-argument transfer costs a full tunnel round trip
# (~24 ms on the serving host), and the scalars dominated the arg count.
META_COLS = 7  # slot, stream, wpos, cstart, n_req, do_dec, do_reset
META_PREFIX = 4  # decoder prefix tokens appended after the scalars


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_steps", "n_chunks", "enc_t"),
    donate_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11),
)
def _stream_step(
    params: Params,
    vad_state,  # donated pytree [S_ring, ...]
    enc_k,
    enc_v,
    xk,
    xv,
    enc_pos: jnp.ndarray,
    dec_k: jnp.ndarray,
    dec_v: jnp.ndarray,
    tokens: jnp.ndarray,
    fed: jnp.ndarray,
    n_tok: jnp.ndarray,
    ring: jnp.ndarray,  # NOT donated: decode snapshots may hold the old ref
    meta: jnp.ndarray,  # [B, META_COLS + META_PREFIX] int32 (layout above)
    frames_b: jnp.ndarray,  # [B, n_frames, VAD_FRAME] f32
    cfg: WhisperConfig,
    max_steps: int,
    n_chunks: int = 2,
    enc_t: int = 512,
):
    """Fused per-VAD-block streaming step: (optionally) open a new segment,
    score VAD frames, append them to the audio rings, encode up to
    ``n_chunks`` pending chunks (per-row commit counts), and advance the
    decode continuation — ONE device call per block instead of three-plus.
    The chunk gather happens AFTER the ring append, so a chunk ending inside
    this block decodes in the same call. The fused ``do_reset`` replaces the
    standalone :func:`_stream_reset` call on the serving path: at high
    session counts every utterance start would otherwise cost its own
    unbatched device dispatch.
    """
    slot_ids = meta[:, 0]
    stream_ids = meta[:, 1]
    wpos = meta[:, 2]
    cstart = meta[:, 3]
    n_req = meta[:, 4]
    do_dec = meta[:, 5] != 0
    do_reset = meta[:, 6] != 0
    prefix_b = meta[:, META_COLS:]
    # 0) per-row segment open (reset): prefix into the token buffer, counters
    # to zero. Caches need no clearing — masks bound every read. Duplicate
    # pad rows write identical values.
    p_len = prefix_b.shape[1]
    bi = jnp.arange(stream_ids.shape[0])
    tok_rows0 = tokens[stream_ids]
    tok_rows0 = jnp.where(
        do_reset[:, None],
        jax.lax.dynamic_update_slice_in_dim(
            jnp.zeros_like(tok_rows0), prefix_b, 0, axis=1
        ),
        tok_rows0,
    )
    tokens = tokens.at[stream_ids].set(tok_rows0)
    fed = fed.at[stream_ids].set(jnp.where(do_reset, 0, fed[stream_ids]))
    n_tok = n_tok.at[stream_ids].set(
        jnp.where(do_reset, p_len, n_tok[stream_ids])
    )
    enc_pos = enc_pos.at[stream_ids].set(
        jnp.where(do_reset, 0, enc_pos[stream_ids])
    )
    del bi

    # 1) VAD score + ring append (audio_ring._vad_append semantics; row-level
    # append per audio_ring.ring_append_rows — the element-indexed scatter
    # measured 65 ms at B=64)
    from ...engine.audio_ring import ring_append_rows

    rows = jax.tree.map(lambda s: s[slot_ids], vad_state)
    probs, new_rows = vad_frame_probs(rows, frames_b)
    vad_state = jax.tree.map(lambda s, r: s.at[slot_ids].set(r), vad_state, new_rows)
    b = frames_b.shape[0]
    flat = frames_b.reshape(b, -1)
    wire = jnp.clip(flat * 32768.0, -32768.0, 32767.0).astype(jnp.int16)
    ring = ring_append_rows(ring, slot_ids, wpos, wire)

    # 2) commit-guarded chunk encode against the freshly appended ring
    pos_rows = enc_pos[stream_ids]
    enc_k, enc_v, xk, xv, pos_new = _encode_core(
        params, cfg, ring, slot_ids, cstart,
        enc_k, enc_v, xk, xv, stream_ids, pos_rows, n_chunks, enc_t,
        commit=n_req,
    )

    # 3) decode continuation against the updated cross context
    dec_k, dec_v, tok, fed_r, n_r = _decode_core(
        params, cfg,
        dec_k, dec_v, xk, xv, stream_ids, pos_new,
        tokens[stream_ids], fed[stream_ids], n_tok[stream_ids],
        do_dec, max_steps, enc_t,
    )

    enc_pos = enc_pos.at[stream_ids].set(pos_new)
    tokens = tokens.at[stream_ids].set(tok)
    fed = fed.at[stream_ids].set(fed_r)
    n_tok = n_tok.at[stream_ids].set(n_r)
    return (
        vad_state, enc_k, enc_v, xk, xv, enc_pos,
        dec_k, dec_v, tokens, fed, n_tok, ring,
        probs, tok, n_r, pos_new,
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _stream_reset(tokens, fed, n_tok, enc_pos, stream_id, prefix):
    """Open a new segment on ``stream_id``: prefix into the token buffer,
    counters to zero. Caches need no clearing — masks bound every read."""
    tokens = tokens.at[stream_id, : prefix.shape[0]].set(prefix)
    fed = fed.at[stream_id].set(0)
    n_tok = n_tok.at[stream_id].set(prefix.shape[0])
    enc_pos = enc_pos.at[stream_id].set(0)
    return tokens, fed, n_tok, enc_pos


# ---------------------------------------------------------------------------
# slot table
# ---------------------------------------------------------------------------
class StreamTable:
    """Pool of device-resident streaming-decode slots for one model.

    Thread-safe like :class:`~streamkit_tpu.engine.audio_ring.SessionAudioRing`:
    donated table updates serialize under a step lock; dispatch is async so
    the lock is held only microseconds.
    """

    def __init__(
        self,
        cfg: WhisperConfig,
        dtype,
        max_slots: Optional[int] = None,
        enc_t: Optional[int] = None,
        dec_t: Optional[int] = None,
        kv_int8: Optional[bool] = None,
    ) -> None:
        self.cfg = cfg
        self.max_slots = max_slots or int(os.environ.get("SK_STREAM_SLOTS", "64"))
        # clamped to the model's position tables (tiny test configs have
        # short contexts; position gathers must stay in range)
        self.enc_t = min(enc_t or int(os.environ.get("SK_STREAM_ENC_T", "512")), cfg.n_audio_ctx)
        self.dec_t = min(dec_t or int(os.environ.get("SK_STREAM_DEC_T", "128")), cfg.n_text_ctx)
        # int8 + per-column scales for the four ENC_T caches (default on;
        # see module docstring for the memory math that makes 64 slots fit)
        self.kv_int8 = (
            kv_int8
            if kv_int8 is not None
            else os.environ.get("SK_STREAM_KV_INT8", "1") == "1"
        )
        # enc_t must be whole chunks (flat chunk-row cache layout)
        self.enc_t -= self.enc_t % CHUNK_POS
        s = self.max_slots
        he, hde = cfg.n_audio_head, cfg.n_audio_state // cfg.n_audio_head
        ht, hdt = cfg.n_text_head, cfg.n_text_state // cfg.n_text_head
        nch = self.enc_t // CHUNK_POS

        def enc_cache(layers, h, hd):
            # flat chunk-row buffer, s-major rows (see the
            # cache-representation note above _kv_enc_t)
            if self.kv_int8:
                return (
                    jnp.zeros((s * layers * nch, h * CHUNK_POS * hd), jnp.int8),
                    jnp.zeros((s * layers, h, self.enc_t), jnp.float32),
                )
            return jnp.zeros((s * layers * nch, h * CHUNK_POS * hd), dtype)

        self._enc_k = enc_cache(cfg.n_audio_layer, he, hde)
        self._enc_v = enc_cache(cfg.n_audio_layer, he, hde)
        self._xk = enc_cache(cfg.n_text_layer, ht, hdt)
        self._xv = enc_cache(cfg.n_text_layer, ht, hdt)
        self._dec_k = jnp.zeros((s * cfg.n_text_layer, ht, hdt, self.dec_t), dtype)
        self._dec_v = jnp.zeros((s * cfg.n_text_layer, ht, hdt, self.dec_t), dtype)
        self._tokens = jnp.zeros((s, self.dec_t), jnp.int32)
        self._fed = jnp.zeros((s,), jnp.int32)
        self._n_tok = jnp.zeros((s,), jnp.int32)
        self._enc_pos = jnp.zeros((s,), jnp.int32)
        self._free = list(range(s - 1, -1, -1))
        self._alloc_lock = threading.Lock()
        self._step_lock = threading.Lock()

    # -- slot lifecycle ------------------------------------------------------
    def try_alloc(self) -> Optional[int]:
        with self._alloc_lock:
            return self._free.pop() if self._free else None

    def free(self, slot: int) -> None:
        with self._alloc_lock:
            self._free.append(slot)

    # -- steps ----------------------------------------------------------------
    def reset(self, stream_id: int, prefix: np.ndarray) -> None:
        with self._step_lock:
            self._tokens, self._fed, self._n_tok, self._enc_pos = _stream_reset(
                self._tokens, self._fed, self._n_tok, self._enc_pos,
                jnp.asarray(stream_id, jnp.int32), jnp.asarray(prefix, jnp.int32),
            )

    def encode_chunks(
        self, params: Params, ring, slot_ids, stream_ids, starts, n_chunks: int = 1
    ) -> np.ndarray:
        """Batched: encode ``n_chunks`` consecutive chunks per row → per-row
        new enc position."""
        with self._step_lock:
            (
                self._enc_k, self._enc_v, self._xk, self._xv, self._enc_pos, new_pos
            ) = _stream_encode(
                params,
                self._enc_k, self._enc_v, self._xk, self._xv, self._enc_pos,
                ring,
                jnp.asarray(slot_ids, jnp.int32),
                jnp.asarray(stream_ids, jnp.int32),
                jnp.asarray(starts, jnp.int32),
                self.cfg,
                n_chunks,
                self.enc_t,
            )
        return new_pos

    def decode_steps(self, params: Params, stream_ids, max_steps: int):
        """Batched: advance each row's greedy continuation → (tokens [B, DEC_T],
        n_tok [B]); new tokens this segment are ``tokens[4:n_tok]``."""
        with self._step_lock:
            (
                self._dec_k, self._dec_v, self._tokens, self._fed, self._n_tok,
                tok_rows, n_rows,
            ) = _stream_decode(
                params,
                self._dec_k, self._dec_v, self._tokens, self._fed, self._n_tok,
                self._xk, self._xv, self._enc_pos,
                jnp.asarray(stream_ids, jnp.int32),
                self.cfg,
                max_steps,
                self.enc_t,
            )
        return tok_rows, n_rows

    def step(
        self,
        params: Params,
        audio_ring,  # SessionAudioRing — VAD state + audio rings live there
        slot_ids,
        stream_ids,
        wpos,
        cstart,
        n_req,
        do_dec,
        frames_b,
        max_steps: int,
        do_reset=None,
        prefix_b=None,
    ):
        """Fused per-block step (VAD + ring append + encode + decode) — ONE
        device call. Takes both tables' step locks (ring first, then stream —
        the only place both are held, so the order cannot deadlock) and
        exchanges the ring's buffers in place, mirroring
        ``SessionAudioRing.vad_append`` semantics (ring not donated).

        Accepts either per-field arrays (built into the packed meta vector
        here) or, when ``slot_ids`` is 2-D, a pre-packed ``meta`` array of
        shape ``[B, META_COLS + META_PREFIX]`` (the serving path packs on the
        host to cut per-call transfers)."""
        sl = np.asarray(slot_ids)
        if sl.ndim == 2:
            meta = sl.astype(np.int32)
        else:
            b = sl.shape[0]
            if do_reset is None:
                do_reset = np.zeros((b,), bool)
            if prefix_b is None:
                prefix_b = np.zeros((b, META_PREFIX), np.int32)
            meta = np.concatenate(
                [
                    np.stack(
                        [
                            np.asarray(slot_ids, np.int32),
                            np.asarray(stream_ids, np.int32),
                            np.asarray(wpos, np.int32),
                            np.asarray(cstart, np.int32),
                            np.asarray(n_req, np.int32),
                            np.asarray(do_dec, np.int32),
                            np.asarray(do_reset, np.int32),
                        ],
                        axis=1,
                    ),
                    np.asarray(prefix_b, np.int32).reshape(b, META_PREFIX),
                ],
                axis=1,
            )
        with audio_ring._step_lock:
            with self._step_lock:
                (
                    audio_ring._vad_state,
                    self._enc_k, self._enc_v, self._xk, self._xv, self._enc_pos,
                    self._dec_k, self._dec_v, self._tokens, self._fed, self._n_tok,
                    audio_ring._ring,
                    probs, tok_rows, n_rows, pos_new,
                ) = _stream_step(
                    params,
                    audio_ring._vad_state,
                    self._enc_k, self._enc_v, self._xk, self._xv, self._enc_pos,
                    self._dec_k, self._dec_v, self._tokens, self._fed, self._n_tok,
                    audio_ring._ring,
                    jnp.asarray(meta),
                    frames_b,
                    self.cfg,
                    max_steps,
                    enc_t=self.enc_t,
                )
        return probs, tok_rows, n_rows, pos_new

    # -- canonical views (tests / tools) -------------------------------------
    def cache_view(self, which: str):
        """Materialize a cache kind in the canonical ``[S, L, H, hd, T]``
        layout (int8 kinds → ``(q8, scale [S, L, H, 1, T])``) — the flat
        chunk-row layout is a performance encoding, not an interface."""
        cfg = self.cfg
        if which in ("enc_k", "enc_v"):
            cache = self._enc_k if which == "enc_k" else self._enc_v
            L, H = cfg.n_audio_layer, cfg.n_audio_head
            hd = cfg.n_audio_state // H
        elif which in ("xk", "xv"):
            cache = self._xk if which == "xk" else self._xv
            L, H = cfg.n_text_layer, cfg.n_text_head
            hd = cfg.n_text_state // H
        else:
            cache = self._dec_k if which == "dec_k" else self._dec_v
            L, H = cfg.n_text_layer, cfg.n_text_head
            hd = cfg.n_text_state // H
            arr = np.asarray(cache).reshape(self.max_slots, L, H, hd, self.dec_t)
            return arr
        nch = self.enc_t // CHUNK_POS

        def to_canon(flat):
            a = np.asarray(flat).reshape(self.max_slots, L, nch, H, CHUNK_POS, hd)
            # [S,L,nch,H,8,hd] → [S,L,H,hd,T]
            return np.ascontiguousarray(
                a.transpose(0, 1, 3, 5, 2, 4)
            ).reshape(self.max_slots, L, H, hd, self.enc_t)

        if isinstance(cache, tuple):
            q8 = to_canon(cache[0])
            sc = np.asarray(cache[1]).reshape(
                self.max_slots, L, H, 1, self.enc_t
            )
            return q8, sc
        return to_canon(cache)


# process-wide tables keyed by model tag (mirrors _get_audio_ring)
_TABLES: Dict[str, StreamTable] = {}
_TABLES_LOCK = threading.Lock()


def get_stream_table(tag: str, cfg: WhisperConfig, dtype) -> StreamTable:
    with _TABLES_LOCK:
        tbl = _TABLES.get(tag)
        if tbl is None:
            tbl = StreamTable(cfg, dtype)
            _TABLES[tag] = tbl
        return tbl
