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
Caches are **canonical matmul-native buffers** ``[L, S, H, hd, T]`` read
by strided slice (identity mode) or row gather and written by ONE
windowed scatter per kind (see the cache-representation note above
:func:`_read_layer` for the on-chip measurements that force this).
Sessions that fail to get a slot fall back to the bucket re-decode
partial path.
"""

from __future__ import annotations

import functools
import os
import threading
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .model import Params, _dense, _layernorm, _merge_heads, _mlp, _split_heads
from ...ops.mel import HOP_LENGTH, N_FFT, _dft_bases, _mel_mat, frame_signal
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


def _pallas_writes_enabled() -> bool:
    """True when the Pallas windowed cache writes may be used.

    Auto mode (default) requires a single-device TPU process: in a
    multi-device process the stream tables may be dp/tp-sharded
    (parallel/serving.py) and the kernel would force a gather to one
    device — the select-merge path handles sharded operands natively.
    SK_PALLAS_WRITES=1/0 force-overrides.
    """
    if jax.default_backend() != "tpu":
        return False
    env = os.environ.get("SK_PALLAS_WRITES", "auto")
    return env == "1" or (env == "auto" and jax.device_count() == 1)


def _chunk_mel(audio: jnp.ndarray, n_mels: int, n_frames: int = _N_MEL_FRAMES) -> jnp.ndarray:
    """``[B, gather]`` audio → ``[B, n_frames, n_mels]`` log-mel for the
    chunk's conv context (frames t0-2..t0+16·n; local frame j starts at
    sample 40 + j*160). Dynamic-range floor uses the chunk-local max.

    Frame extraction is reshape+static-slice only (:func:`...ops.mel.
    frame_signal`) — the equivalent 2-D index gather (``audio[:, idx]``,
    n_frames·400 element pairs × B rows) measured ~0.5 µs/pair on v5e,
    tens of ms per call."""
    frames = frame_signal(audio, n_frames, offset=40)  # [B, n_frames, 400]
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
# int8 KV cache (tuple pytree (q8 [.., hd, T], scale [.., H, T]) vs array)
# ---------------------------------------------------------------------------
def _quant_cols(cols: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``[B, H, hd, c]`` float cols → (int8 cols, f32 per-column scales
    ``[B, H, c]``). Scale = absmax over head_dim / 127."""
    f = cols.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(f), axis=2)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(f / scale[:, :, None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_like(cache, cols_f: jnp.ndarray):
    """Candidate columns ``[B, H, hd, c]`` in the cache's representation:
    (q8, scale [B,H,c]) when the cache is quantized, else cast to its dtype.
    Attention reads THESE (quantized) values so later reads of the stored
    cache see exactly what this call attended to."""
    if isinstance(cache, tuple):
        return _quant_cols(cols_f)
    return cols_f.astype(cache.dtype)


def _scores_rows(qs, rows, op_scale, dtype):
    """``qs [B,H,q,hd]`` (pre-scaled) · K rows ``[B,H,hd,T]`` → f32 scores
    ``[B,H,q,T]``.

    For quantized rows the per-column scale is applied AFTER the dot
    (scores[..,t] = (Σ_d q·k8) · s[t]): the int8 tensor feeds the matmul
    operand directly (XLA fuses the dequant into the operand load), and the
    ``[.., hd, T]`` layout means the dot needs NO transposes — a generic
    dequant-then-matmul or a transposing einsum materializes an ~84 MB
    buffer per tensor per layer (per decode step!), measured as the bulk
    of the fused step's decode time at B=64."""
    if isinstance(rows, tuple):
        raw = jnp.matmul(
            qs, rows[0].astype(dtype) * op_scale, preferred_element_type=jnp.float32
        )
        return raw * rows[1][:, :, None, :]
    return jnp.matmul(qs, rows * op_scale, preferred_element_type=jnp.float32)


def _attend_rows(probs, rows, dtype):
    """``probs [B,H,q,T]`` f32 · V rows ``[B,H,hd,T]`` → ``[B,H,q,hd]`` f32.
    For quantized rows the column scale folds into the probabilities
    (Σ_t p·v8·s = Σ_t (p·s)·v8), keeping the int8 operand on the einsum."""
    if isinstance(rows, tuple):
        p = (probs * rows[1][:, :, None, :]).astype(dtype)
        return jnp.einsum(
            "bhqt,bhdt->bhqd", p, rows[0].astype(dtype), preferred_element_type=jnp.float32
        )
    return jnp.einsum(
        "bhqt,bhdt->bhqd", probs.astype(dtype), rows, preferred_element_type=jnp.float32
    )


# Cache representation: canonical matmul-native buffers,
#
#     data  ``[L, S, H, hd, T]``  (int8 or model dtype; time minor)
#     scale ``[L, S, H, T]`` f32  (int8 kinds only; per-column)
#
# LAYER-major: the hot consumer is the per-layer slice (every layer of
# every call reads its own K/V rows), and with L as the major axis that
# slice — ``cache[li]`` — is contiguous in the default row-major layout,
# so XLA never has to relayout the buffer. The round-4 slot-major form
# ``[S, L, ...]`` was semantically identical but XLA's layout assignment
# chose {4,3,2,0,1} (L-major) for the slice consumers while the Pallas
# write kernel pinned the default {4,3,2,1,0} — ~19 ms/call of relayout
# copies shuttling the multi-GB tables between the two (xplane profile,
# tools/xplane_top.py). dp-sharding over slots is now an axis-1 split and
# tp still splits the head axis (see parallel/serving.py). History READS
# dominate — the fused step reads every cache once (encode) to 3+ times
# (decode steps) per call but writes each chunk exactly once — so the
# layout makes a layer's rows a direct matmul operand:
#
# * identity mode (serving: batch row b IS stream slot b, B = S): a layer's
#   K/V is ``cache[li]`` — a contiguous static slice, zero gathers — and
#   scores are ``q [B,H,q,hd] @ k [B,H,hd,T]`` with no transposes. Measured
#   at the HBM floor (~2 ms per 1.34 GB kind sweep at B=64, large-v3, vs
#   76 ms for round-3's flat chunk-row layout whose reads each paid an
#   84 MB/layer transpose to feed the einsum).
# * general mode (tests/tools, arbitrary ids): one row gather per layer
#   (``cache[li, ids]``) — per-layer so temp lifetimes stay one layer (a
#   stacked all-layer gather of K and V held ~2.7 GB live and OOM'd at 64
#   slots).
#
# WRITES are ONE windowed ``lax.scatter`` per kind per call with a
# ``[L, H, hd, 8]`` window per committed chunk — the window spans ALL
# LAYERS (every layer writes the same (slot, col) chunk), so the scatter
# carries only B·n_chunks (≤128) index pairs. Windowed-scatter cost is per
# INDEX (~14 µs/window measured on v5e — a [H,hd,8] per-layer-window
# formulation with L·B·nc = 4096 windows cost ~190 ms/call; element-indexed
# scatters at ~0.6 µs per element pair are ruinous long before that). A
# single scatter per buffer also keeps XLA's donation aliasing: the round-2
# failure mode was CHAINED per-layer scatters, where XLA cannot prove
# in-place aliasing mid-chain and copies the whole multi-GB table once per
# layer (195→850 ms going 8→64 slots at the same batch). Encoder positions
# only advance in whole chunks (``adv = 8·commit``), so chunk-window
# granularity is exact. Uncommitted chunks and pad rows point their scatter
# row out of bounds and are dropped (FILL_OR_DROP), not read-modify-written.


def _read_layer(cache, L: int, li: int, ids):
    """One layer's K or V rows as a direct matmul operand: ``[B, H, hd, T]``
    (+ scale ``[B, H, T]`` for int8 kinds).

    ``ids=None`` is identity mode — batch row b IS table slot b (B = S):
    the layer is a contiguous static slice of the layer-major buffer, no
    gather (see the cache-representation note)."""
    quant = isinstance(cache, tuple)
    arr = cache[0] if quant else cache
    if ids is None:
        if quant:
            return arr[li], cache[1][li]
        return arr[li]
    rows = arr[li, ids]
    if quant:
        return rows, cache[1][li, ids]
    return rows


def _select_merge_chunks(cache_arr, upd, pos, commit, n_chunks: int):
    """Identity-mode chunk write as a full-buffer select merge.

    ``upd [L, S, H, hd, c]`` (c = 8*n_chunks candidate columns, time minor)
    lands at columns ``pos[s] + j (mod T)`` of ``cache[:, s]`` for
    ``j < 8*commit[s]``.

    Why not ``lax.scatter``: XLA TPU lowers windowed scatters to a SERIAL
    while-loop over index pairs — profiled at 41 ms per cache kind per
    fused call (164 ms of a 307 ms call for the four kinds). Why not a
    Pallas windowed DMA: Mosaic requires lane-dim slices to be 128-aligned
    (the window is 8 wide). The merge instead positions the candidate
    columns with a one-hot matmul over the tiny c dimension (MXU,
    ~0.1 ms) and selects them into the cache in ONE fused elementwise
    pass: traffic = read + write of the buffer (~2.7 GB for the int8
    caches, ~3.4 ms at HBM bandwidth), layout-preserving, donation-
    aliasing-friendly, and bit-exact (one nonzero f32 product per output
    column; int8/bf16 -> f32 -> back roundtrips exactly).
    """
    L, S, H, hd, T = cache_arr.shape
    c = upd.shape[-1]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    delta = (t_idx[None, :] - pos[:, None]) % T  # [S, T]
    lim = jnp.full((S,), c, jnp.int32) if commit is None else CHUNK_POS * commit
    write = delta < jnp.minimum(lim, c)[:, None]  # [S, T]
    onehot = (delta[:, None, :] == jnp.arange(c, dtype=jnp.int32)[None, :, None])
    onehot = onehot.astype(jnp.float32)  # [S, c, T]
    cand = jnp.einsum(
        "lsxc,sct->lsxt",
        upd.reshape(L, S, H * hd, c).astype(jnp.float32),
        onehot,
        preferred_element_type=jnp.float32,
    ).reshape(L, S, H, hd, T).astype(cache_arr.dtype)
    return jnp.where(write[None, :, None, None, :], cand, cache_arr)


def _select_merge_scales(scale_arr, upd, pos, commit, n_chunks: int):
    """Scale-cache variant of :func:`_select_merge_chunks`:
    ``upd [L, S, H, c]`` -> ``scale [L, S, H, T]``."""
    L, S, H, T = scale_arr.shape
    c = upd.shape[-1]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    delta = (t_idx[None, :] - pos[:, None]) % T
    lim = jnp.full((S,), c, jnp.int32) if commit is None else CHUNK_POS * commit
    write = delta < jnp.minimum(lim, c)[:, None]
    onehot = (delta[:, None, :] == jnp.arange(c, dtype=jnp.int32)[None, :, None])
    onehot = onehot.astype(jnp.float32)
    cand = jnp.einsum(
        "lsxc,sct->lsxt",
        upd.reshape(L, S, H, c).astype(jnp.float32),
        onehot,
        preferred_element_type=jnp.float32,
    ).reshape(L, S, H, T).astype(scale_arr.dtype)
    return jnp.where(write[None, :, None, :], cand, scale_arr)


def _write_chunks(cache, cands, ids, pos, commit, n_chunks: int, sorted_rows: bool = False):
    """Append every layer's candidate chunk K or V into a canonical cache
    with ONE windowed scatter (+ one for scales on int8 kinds), window
    ``[L, H, hd, 8]`` per committed chunk — B·n_chunks index pairs total.

    ``cands``: list over L of per-column candidates — ``(q8 [B,H,hd,c],
    scale [B,H,c])`` tuples (int8 cache) or plain ``[B,H,hd,c]`` arrays,
    ``c = 8·n_chunks`` columns with time minor. ``commit [B]``: chunks to
    actually write per row (None = all); uncommitted chunks and pad rows
    point their scatter row out of bounds → dropped (FILL_OR_DROP).

    unique_indices is always passed: every live (row, col) pair is distinct
    by construction, and dropped pairs get DISTINCT out-of-bounds rows
    (S + flat index) so the guarantee holds for them too. Without it, XLA
    TPU must assume colliding windows and lowers the scatter to a SERIAL
    128-iteration while-loop over the full multi-GB cache — profiled at
    41 ms per kind per fused call (4 kinds = 164 ms of the 307 ms call).
    ``sorted_rows``: pass True when ``ids`` is ascending (identity mode) so
    ``indices_are_sorted`` can kick in as well."""
    quant = isinstance(cache, tuple)
    arr = cache[0] if quant else cache
    L, S, H, hd, T = arr.shape
    b = ids.shape[0]
    cq = jnp.stack([c[0] if quant else c for c in cands])  # [L,B,H,hd,c]
    j = jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
    rows = jnp.broadcast_to(ids[:, None], (b, n_chunks))
    cols = (pos[:, None] + j * CHUNK_POS) % T
    if sorted_rows and b == S:
        # identity mode (row b IS slot b): no scatter at all. On a
        # single-device TPU the write is a Pallas 2×128-column
        # read-modify-write per (slot, layer-group) —
        # ops/cache_write.py windowed_write_groups, ~20× less traffic than
        # the select merge; everywhere else (CPU tests, multi-device
        # processes where the caches may be dp/tp-sharded) the one-hot
        # select merge (_select_merge_chunks) executes the identical
        # semantics. SK_PALLAS_WRITES=1/0 force-overrides the auto gate.
        # The candidate stack [L,B,H,hd,c] is already layer-major — no
        # transpose on the hot path.
        from ...ops import cache_write

        c_cols = cq.shape[-1]
        use_pallas = _pallas_writes_enabled() and cache_write.supports(
            T, c_cols
        )
        lim = (
            jnp.full((S,), c_cols, jnp.int32)
            if commit is None
            else jnp.minimum(CHUNK_POS * commit, c_cols)
        )
        if use_pallas:
            new_arr = cache_write.windowed_write_groups(
                arr.reshape(L, S, H * hd, T),
                cq.reshape(L, S, H * hd, c_cols),
                pos, lim,
            ).reshape(L, S, H, hd, T)
        else:
            new_arr = _select_merge_chunks(arr, cq, pos, commit, n_chunks)
        if not quant:
            return new_arr
        supd = jnp.stack([c[1] for c in cands])  # [L,B,H,c]
        if use_pallas:
            new_sc = cache_write.windowed_write_groups(
                cache[1], supd, pos, lim,
            )
        else:
            new_sc = _select_merge_scales(cache[1], supd, pos, commit, n_chunks)
        return new_arr, new_sc
    # general mode: chunk windows [B,nc,L,H,hd,8] (c = nc·8, time minor →
    # pure reshape of the [L,B,...] stack)
    upd = jnp.transpose(
        cq.reshape(L, b, H, hd, n_chunks, CHUNK_POS), (1, 4, 0, 2, 3, 5)
    )
    if commit is not None:
        flat = jnp.arange(b * n_chunks, dtype=jnp.int32).reshape(b, n_chunks)
        rows = jnp.where(j < commit[:, None], rows, S + flat)
    idx = jnp.stack([rows.reshape(-1), cols.reshape(-1)], axis=-1)
    # operand is layer-major [L,S,H,hd,T]: the scatter indexes (slot, col)
    # = operand dims (1, 4); each update window spans ALL layers [L,H,hd,8]
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1, 4),
    )
    new_arr = jax.lax.scatter(
        arr, idx, upd.reshape(b * n_chunks, L, H, hd, CHUNK_POS), dn,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        unique_indices=True, indices_are_sorted=sorted_rows,
    )
    if not quant:
        return new_arr
    cs = jnp.stack([c[1] for c in cands])  # [L,B,H,c]
    supd = jnp.transpose(
        cs.reshape(L, b, H, n_chunks, CHUNK_POS), (1, 3, 0, 2, 4)
    )  # [B,nc,L,H,8]
    sdn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1, 3),
    )
    new_sc = jax.lax.scatter(
        cache[1], idx, supd.reshape(b * n_chunks, L, H, CHUNK_POS), sdn,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        unique_indices=True, indices_are_sorted=sorted_rows,
    )
    return new_arr, new_sc


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
    identity: bool = False,  # batch row b IS table slot b (B = S): sliced reads
):
    """Encode ``n_chunks`` consecutive chunks per row from the audio ring and
    append enc K/V + cross K/V into the tables at ``stream_ids``. With
    ``commit``, only each row's first ``commit[b]`` chunks are written (the
    rest are dropped by the scatter) and positions advance by
    ``8*commit[b]`` — rows may lag/lead each other inside one fused batched
    call.

    The four caches (``ek/ev/xkr/xvr``) are canonical-or-(int8, scale)
    pytrees (cache-representation note); attention reads the *quantized*
    values (dequant fused into the matmul), so later chunks see exactly
    what this chunk stored. Returns the updated tables + new positions."""
    dtype = params["enc"]["pos"].dtype
    ring_samples = ring.shape[1]
    n_pos = CHUNK_POS * n_chunks
    gather = LEFT_CTX + CHUNK_SAMPLES * n_chunks + RIGHT_CTX
    g0 = (starts - LEFT_CTX) % ring_samples
    if gather > ring_samples:
        # tiny test rings only: the window laps the ring, which a single
        # padded copy can't express — element-indexed mod gather
        idx = (g0[:, None] + jnp.arange(gather, dtype=jnp.int32)) % ring_samples
        audio = ring[slot_ids[:, None], idx].astype(jnp.float32) / 32768.0
    else:
        # windowed gather (B index pairs) over a wrap-padded ring copy — the
        # element-indexed form (``ring[slot_ids[:,None], idx]``, B·gather
        # pairs) measured ~150 ms at B=64 on v5e; the pad copy is ~0.2 ms
        ringx = jnp.concatenate([ring, ring[:, :gather]], axis=1)
        gidx = jnp.stack([slot_ids, g0], axis=-1)
        gdn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0, 1)
        )
        audio = jax.lax.gather(
            ringx, gidx, gdn, slice_sizes=(1, gather)
        ).astype(jnp.float32) / 32768.0
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
    hist_ids = None if identity else stream_ids
    # fused Pallas attention (TPU, int8 caches, identity mode): score
    # matmuls + masks + softmax + both attends in VMEM per (row, head
    # block) — the XLA formulation below materializes the f32 score/prob
    # matrices to HBM per layer, profiled at ~half the fused call
    # (ops/stream_attention.py module docstring)
    from ...ops import stream_attention

    # Opt-in only (SK_ATTN_KERNEL=1): the fused kernel wins standalone
    # (~0.4 ms/layer, 32-layer chain ~13 ms device) but LOSES in the full
    # program — B=64 steps=2 fused call measured 142/134 ms (mean/min) with
    # it vs 136/114 without on v5e (PERF_NOTES round-5 A/B). Each pallas
    # call is a fusion barrier: XLA re-lays-out the per-layer Q/K/V around
    # it 32×, costing more than the score-matrix HBM traffic it saves.
    attn_env = os.environ.get("SK_ATTN_KERNEL", "0")
    use_attn_kernel = (
        attn_env == "1"
        and identity
        and isinstance(ek, tuple)
        and stream_attention.supports(He, hde, enc_t, n_pos)
    )
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
        # history rows: pre-write state, sliced/gathered per layer
        ek_li = _read_layer(ek, Le, li, hist_ids)
        ev_li = _read_layer(ev, Le, li, hist_ids)
        if use_attn_kernel:
            out = stream_attention.history_attention(
                qs, ek_li[0], ek_li[1], ev_li[0], ev_li[1],
                kq[0], kq[1], vq[0], vq[1], pos_rows, float(hd_scale),
            ).astype(dtype)
        else:
            scores_h = _scores_rows(qs, ek_li, hd_scale, dtype)
            scores_c = _scores_rows(qs, kq, hd_scale, dtype)  # [B,H,c,n_pos]
            scores = jnp.concatenate(
                [scores_h + hist_mask, scores_c + cand_mask], axis=-1
            )
            probs = jax.nn.softmax(scores, axis=-1)
            p_h, p_c = probs[..., :enc_t], probs[..., enc_t:]
            out = (
                _attend_rows(p_h, ev_li, dtype)
                + _attend_rows(p_c, vq, dtype)
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

    # ONE windowed scatter (+ scale scatter) per cache kind
    ek = _write_chunks(ek, cand_ks, stream_ids, pos_rows, commit, n_chunks, identity)
    ev = _write_chunks(ev, cand_vs, stream_ids, pos_rows, commit, n_chunks, identity)
    xkr = _write_chunks(xkr, cand_xk, stream_ids, pos_rows, commit, n_chunks, identity)
    xvr = _write_chunks(xvr, cand_xv, stream_ids, pos_rows, commit, n_chunks, identity)

    adv = n_pos if commit is None else CHUNK_POS * commit
    return ek, ev, xkr, xvr, pos_rows + adv


def _fold_cols(cache5, delta5, pos, count):
    """Fold per-step delta columns into a layer-major cache
    ``[L, B, ..., T]``: ``cache[:, b, ..., pos[b]+i] = delta[:, b, ..., i]``
    for ``i < count[b]``. One Pallas grouped windowed write on TPU; the
    equivalent one-hot select merge elsewhere (same semantics as
    :func:`_select_merge_chunks`, generic column count)."""
    from ...ops import cache_write

    L, B = cache5.shape[0], cache5.shape[1]
    F = int(np.prod(cache5.shape[2:-1]))
    T = cache5.shape[-1]
    c = delta5.shape[-1]
    if _pallas_writes_enabled() and cache_write.supports(T, c):
        return cache_write.windowed_write_groups(
            cache5.reshape(L, B, F, T), delta5.reshape(L, B, F, c),
            pos, count,
        ).reshape(cache5.shape)
    t_idx = jnp.arange(T, dtype=jnp.int32)
    delta = (t_idx[None, :] - pos[:, None]) % T  # [B, T]
    write = delta < jnp.minimum(count, c)[:, None]
    onehot = (
        delta[:, None, :] == jnp.arange(c, dtype=jnp.int32)[None, :, None]
    ).astype(jnp.float32)  # [B, c, T]
    cand = jnp.einsum(
        "lbxc,bct->lbxt",
        delta5.reshape(L, B, F, c).astype(jnp.float32),
        onehot,
        preferred_element_type=jnp.float32,
    ).astype(cache5.dtype)
    bcast = write.reshape((1, B) + (1,) * (cache5.ndim - 3) + (T,))
    return jnp.where(bcast, cand.reshape(cache5.shape), cache5)


def _decode_core(
    params: Params,
    cfg: WhisperConfig,
    dk,  # [Ld, S, H, hd, DEC_T] tables (cache-representation note)
    dv,
    xkr,  # layer-major [Ld, S, H, hd, ENC_T] cache pytrees
    xvr,
    stream_ids: jnp.ndarray,  # [B] rows into the tables
    ep: jnp.ndarray,  # [B] encoder positions (cross-attn horizon)
    tok: jnp.ndarray,  # [B, DEC_T]
    fed_r: jnp.ndarray,
    n_r: jnp.ndarray,
    active0: jnp.ndarray,  # [B] bool — rows allowed to step at all
    max_steps: int,
    enc_t: int,
    identity: bool = False,  # batch row b IS table slot b (B = S)
    suppress_bias=None,  # [vocab] f32: whisper.cpp suppress_nst set
    begin_bias=None,  # [vocab] f32 applied to the FIRST sampled token only
):
    """Greedy continuation scan. Per step a row feeds ``tokens[min(fed,
    n_tok-1)]`` (re-feeding the newest token when caught up refreshes its
    K/V and logits against new audio), then — once caught up — appends the
    argmax unless it is ``<|eot|>``, which is held back (the utterance may
    continue). Rows stop on eot; the next tick retries with more audio.

    Cost structure (measured): cross K/V rows are read per layer per step
    (scan-variant reads are unavoidable — each new token attends again),
    so the read must be free of gathers/transposes: identity mode slices
    the canonical cache directly into the score matmul. Decoder self K/V
    history is a LOOP INVARIANT: per-step writes go to a tiny delta
    buffer ``[Ld, B, H, hd, max_steps]`` at the UNIFORM column = step
    index (one cheap dynamic_update_slice — every active row's write
    column advances in lockstep: feed_idx == feed0 + step), and the
    deltas fold into the big cache ONCE after the scan at each row's
    start column. The previous form carried the full caches through the
    scan and select-appended per step — a full read+write of both
    multi-GB buffers per step (4 ms/step at 64 slots, v5e) plus 4×2 ms
    carry relayout copies in/out of the loop."""
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
    hist_ids = None if identity else stream_ids

    # self K/V working rows [Ld, B, H, hd, dec_t] (the table itself in
    # identity mode — no gather, no write-back)
    if identity:
        dkl, dvl = dk, dv
    else:
        dkl = dk[:, stream_ids]
        dvl = dv[:, stream_ids]

    xcol = jnp.arange(enc_t, dtype=jnp.int32)
    # max(ep, 1) keeps the softmax finite for not-yet-encoded rows (they are
    # masked inactive below; this only avoids NaN noise in the dead lanes)
    xmask = jnp.where(
        xcol[None, :] < jnp.maximum(ep, 1)[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)[:, None, None, :]
    dcol = jnp.arange(dec_t, dtype=jnp.int32)

    # every active row's feed column advances in lockstep from feed0 (the
    # append logic increments fed exactly once per active step), so the
    # in-call writes live at delta columns 0..max_steps-1 — uniform across
    # rows — and the big caches stay loop-invariant
    feed0 = jnp.maximum(jnp.minimum(fed_r, n_r - 1), 0)
    smask0 = jnp.where(
        dcol[None, :] < feed0[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)[:, None, None, :]
    kd0 = jnp.zeros((Ld, b, Ht, hd, max_steps), dtype)
    vd0 = jnp.zeros((Ld, b, Ht, hd, max_steps), dtype)
    scol = jnp.arange(max_steps, dtype=jnp.int32)

    def step(carry, _):
        i, kd, vd, tok, fed_r, n_r, done, fold_n = carry
        active = jnp.logical_and(~done, jnp.logical_and(n_r > 0, ep > 0))
        fold_n = fold_n + active.astype(jnp.int32)
        feed_idx = jnp.minimum(feed0 + i, dec_t - 1)
        cur = tok[bi, feed_idx]
        x = d["tok_emb"][cur][:, None, :] + d["pos_emb"][feed_idx][:, None, :]
        x = x.astype(dtype)
        # deltas valid for an active row at step i: exactly cols < i
        # (done-ness is sticky, so an active row was active at every j < i)
        dmask = jnp.where(scol < i, 0.0, -jnp.inf).astype(jnp.float32).reshape(
            1, 1, 1, max_steps
        )
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
            # split self-attention: invariant history (col < feed0) +
            # this call's deltas (col < i) + the current token's fresh K/V
            scores_h = jnp.matmul(qs, dkl[li] * scale, preferred_element_type=jnp.float32)
            scores_d = jnp.matmul(qs, kd[li] * scale, preferred_element_type=jnp.float32)
            scores_c = jnp.matmul(qs, kcol * scale, preferred_element_type=jnp.float32)
            scores = jnp.concatenate(
                [scores_h + smask0, scores_d + dmask, scores_c], axis=-1
            )
            probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
            p_h = probs[..., :dec_t]
            p_d = probs[..., dec_t : dec_t + max_steps]
            p_c = probs[..., dec_t + max_steps :]
            attn = (
                jnp.einsum("bhqt,bhdt->bhqd", p_h, dvl[li], preferred_element_type=jnp.float32)
                + jnp.einsum("bhqt,bhdt->bhqd", p_d, vd[li], preferred_element_type=jnp.float32)
                + jnp.einsum("bhqt,bhdt->bhqd", p_c, vcol, preferred_element_type=jnp.float32)
            ).astype(dtype)
            x = x + _dense(_merge_heads(attn), layer["attn"]["o"])
            hx = _layernorm(x, layer["ln_x"])
            qx = _split_heads(_dense(hx, layer["xattn"]["q"]), Ht)
            # cross K/V: per-layer slice (identity) or row gather — per
            # layer so temp lifetimes stay one layer (a stacked all-layer
            # gather of both kinds held ~2.7 GB live and OOM'd at 64 slots)
            xk_li = _read_layer(xkr, Ld, li, hist_ids)
            xv_li = _read_layer(xvr, Ld, li, hist_ids)
            xs = _scores_rows(qx * scale, xk_li, scale, dtype)
            xp = jax.nn.softmax(xs + xmask, axis=-1)
            xa = _attend_rows(xp, xv_li, dtype).astype(dtype)
            x = x + _dense(_merge_heads(xa), layer["xattn"]["o"])
            x = x + _mlp(_layernorm(x, layer["ln2"]), layer)
        # delta append: ONE uniform-column dynamic_update_slice per kind
        # (column = step index; inactive rows write dead lanes that the
        # fold's per-row count skips)
        kstk = jnp.stack(kcols, axis=0)  # [Ld, B, H, hd, 1]
        vstk = jnp.stack(vcols, axis=0)
        kd = jax.lax.dynamic_update_slice_in_dim(kd, kstk, i, axis=4)
        vd = jax.lax.dynamic_update_slice_in_dim(vd, vstk, i, axis=4)
        xfin = _layernorm(x, d["ln"])
        logits = jnp.matmul(
            xfin[:, 0], d["tok_emb"].T.astype(dtype), preferred_element_type=jnp.float32
        )  # [B, vocab]
        if suppress_bias is not None:
            logits = logits + suppress_bias
        if begin_bias is not None:
            # first sampled token = the one appended right after the 4-token
            # forced prefix (META_PREFIX)
            logits = logits + jnp.where((n_r == 4)[:, None], begin_bias, 0.0)
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
        return (i + 1, kd, vd, tok, fed_new, n_new, done, fold_n), None

    done0 = ~active0
    (_, kd, vd, tok, fed_r, n_r, _, fold_n), _ = jax.lax.scan(
        step,
        (
            jnp.int32(0), kd0, vd0, tok, fed_r, n_r, done0,
            jnp.zeros((b,), jnp.int32),
        ),
        None,
        length=max_steps,
    )
    # fold the per-step delta columns into the big caches ONCE, at each
    # row's start column. fold_n counts ACTIVE steps per row — a row that
    # never stepped folds nothing (its fed/feed0 gap says nothing: a row
    # entering caught-up-and-done has fed == n > feed0)
    dkl = _fold_cols(dkl, kd, feed0, fold_n)
    dvl = _fold_cols(dvl, vd, feed0, fold_n)
    if identity:
        dk, dv = dkl, dvl
    else:
        # write the worked rows back to the big tables once
        dk = dk.at[:, stream_ids].set(dkl)
        dv = dv.at[:, stream_ids].set(dvl)
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
    enc_k,  # canonical cache pytrees (cache-representation note)
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
    dec_k: jnp.ndarray,  # [Ld, S, H, hd, DEC_T]
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
    suppress_bias=None,
    begin_bias=None,
):
    """Standalone batched decode continuation (see :func:`_decode_core`)."""
    b = stream_ids.shape[0]
    dec_k, dec_v, tok, fed_r, n_r = _decode_core(
        params, cfg,
        dec_k, dec_v, xk, xv, stream_ids, enc_pos[stream_ids],
        tokens[stream_ids], fed[stream_ids], n_tok[stream_ids],
        jnp.ones((b,), bool), max_steps, enc_t,
        suppress_bias=suppress_bias, begin_bias=begin_bias,
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
    static_argnames=("cfg", "max_steps", "n_chunks", "enc_t", "identity"),
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
    frames_b: jnp.ndarray,  # [B, n_frames, VAD_FRAME] int16 wire (pcm_to_wire)
    cfg: WhisperConfig,
    max_steps: int,
    n_chunks: int = 2,
    enc_t: int = 512,
    identity: bool = False,
    suppress_bias=None,
    begin_bias=None,
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

    ``identity=True`` is the dense-serving contract: B = S and batch row b
    IS stream slot b (the engine scatters submissions into slot order and
    fills gaps with inert rows) — every cache read is then a strided slice
    and every per-slot state update a dense select, zero gathers
    (cache-representation note).
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
    if identity:
        fresh = jax.lax.dynamic_update_slice_in_dim(
            jnp.zeros_like(tokens), prefix_b, 0, axis=1
        )
        tokens = jnp.where(do_reset[:, None], fresh, tokens)
        fed = jnp.where(do_reset, 0, fed)
        n_tok = jnp.where(do_reset, p_len, n_tok)
        enc_pos = jnp.where(do_reset, 0, enc_pos)
    else:
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

    # 1) VAD score + ring append (audio_ring._vad_append semantics; row-level
    # append per audio_ring.ring_append_rows — the element-indexed scatter
    # measured 65 ms at B=64). Frames arrive as int16 wire: half the
    # host→device bytes, and VAD scores exactly what the ring stores.
    from ...engine.audio_ring import ring_append_rows

    rows = jax.tree.map(lambda s: s[slot_ids], vad_state)
    if frames_b.dtype == jnp.int16:
        wire3 = frames_b
    else:  # f32 callers: same wire semantics, quantized on device
        wire3 = jnp.clip(frames_b * 32768.0, -32768.0, 32767.0).astype(jnp.int16)
    frames_f = wire3.astype(jnp.float32) / 32768.0
    probs, new_rows = vad_frame_probs(rows, frames_f)
    vad_state = jax.tree.map(lambda s, r: s.at[slot_ids].set(r), vad_state, new_rows)
    b = frames_b.shape[0]
    ring = ring_append_rows(ring, slot_ids, wpos, wire3.reshape(b, -1))

    # 2) commit-guarded chunk encode against the freshly appended ring
    pos_rows = enc_pos if identity else enc_pos[stream_ids]
    enc_k, enc_v, xk, xv, pos_new = _encode_core(
        params, cfg, ring, slot_ids, cstart,
        enc_k, enc_v, xk, xv, stream_ids, pos_rows, n_chunks, enc_t,
        commit=n_req, identity=identity,
    )

    # 3) decode continuation against the updated cross context
    dec_k, dec_v, tok, fed_r, n_r = _decode_core(
        params, cfg,
        dec_k, dec_v, xk, xv, stream_ids, pos_new,
        tokens if identity else tokens[stream_ids],
        fed if identity else fed[stream_ids],
        n_tok if identity else n_tok[stream_ids],
        do_dec, max_steps, enc_t, identity=identity,
        suppress_bias=suppress_bias, begin_bias=begin_bias,
    )

    if identity:
        enc_pos, tokens, fed, n_tok = pos_new, tok, fed_r, n_r
    else:
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
        suppress_bias=None,  # [vocab] f32 (whisper.cpp suppress_nst set)
        begin_bias=None,  # [vocab] f32, first sampled token per segment
    ) -> None:
        self.cfg = cfg
        self.suppress_bias = None if suppress_bias is None else jnp.asarray(suppress_bias)
        self.begin_bias = None if begin_bias is None else jnp.asarray(begin_bias)
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
        # enc_t must be whole chunks (chunk-windowed cache writes)
        self.enc_t -= self.enc_t % CHUNK_POS
        s = self.max_slots
        he, hde = cfg.n_audio_head, cfg.n_audio_state // cfg.n_audio_head
        ht, hdt = cfg.n_text_head, cfg.n_text_state // cfg.n_text_head

        def enc_cache(layers, h, hd):
            # canonical matmul-native buffer, layer-major (see the
            # cache-representation note above _read_layer)
            if self.kv_int8:
                return (
                    jnp.zeros((layers, s, h, hd, self.enc_t), jnp.int8),
                    jnp.zeros((layers, s, h, self.enc_t), jnp.float32),
                )
            return jnp.zeros((layers, s, h, hd, self.enc_t), dtype)

        self._enc_k = enc_cache(cfg.n_audio_layer, he, hde)
        self._enc_v = enc_cache(cfg.n_audio_layer, he, hde)
        self._xk = enc_cache(cfg.n_text_layer, ht, hdt)
        self._xv = enc_cache(cfg.n_text_layer, ht, hdt)
        self._dec_k = jnp.zeros((cfg.n_text_layer, s, ht, hdt, self.dec_t), dtype)
        self._dec_v = jnp.zeros((cfg.n_text_layer, s, ht, hdt, self.dec_t), dtype)
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
        n_chunks: int = 2,
    ):
        """Fused per-block step (VAD + ring append + encode + decode) — ONE
        device call. Takes both tables' step locks (ring first, then stream —
        the only place both are held, so the order cannot deadlock) and
        exchanges the ring's buffers in place, mirroring
        ``SessionAudioRing.vad_append`` semantics (ring not donated).

        Accepts either per-field arrays (built into the packed meta vector
        here) or, when ``slot_ids`` is 2-D, a pre-packed ``meta`` array of
        shape ``[B, META_COLS + META_PREFIX]`` (the serving path packs on the
        host to cut per-call transfers).

        When the meta batch is in slot order (B = max_slots and
        ``meta[:, 1] == arange`` — the dense-serving engine's packing), the
        step compiles in identity mode: zero cache gathers (see
        :func:`_stream_step`)."""
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
        identity = bool(
            meta.shape[0] == self.max_slots
            and np.array_equal(meta[:, 1], np.arange(self.max_slots))
        )
        if isinstance(frames_b, np.ndarray):  # device arrays convert in-jit
            from ...engine.audio_ring import pcm_to_wire

            frames_b = pcm_to_wire(frames_b)
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
                    n_chunks=n_chunks,
                    enc_t=self.enc_t,
                    identity=identity,
                    suppress_bias=self.suppress_bias,
                    begin_bias=self.begin_bias,
                )
        return probs, tok_rows, n_rows, pos_new

    def identity_step_fn(
        self,
        params: Params,
        audio_ring,
        trash_slot: int,
        max_steps: int,
        n_chunks: int = 2,
        trace_calls: Optional[list] = None,
    ):
        """Batcher-ready fused-step closure in IDENTITY packing: submitted
        meta rows (host arrays, ``host_inputs=True`` kinds) are scattered
        into slot order so batch row p IS stream slot p — every cache read
        compiles to a strided slice, zero gathers (cache-representation
        note). Gap rows become inert: ring writes park on ``trash_slot``,
        ``n_req=0/do_dec=0/do_reset=0`` leaves absent sessions' state
        untouched (commit-guarded writes). Shared by the dense serving
        engine and the WhisperNode graph path so both compile ONE program.
        """
        from ...engine.audio_ring import pcm_to_wire

        n_slots = self.max_slots

        def batched_sstep(meta, frames):
            t_in = time.monotonic() if trace_calls is not None else 0.0
            perm = meta[:, 1].astype(np.int64)
            meta_s = np.zeros((n_slots, meta.shape[1]), np.int32)
            meta_s[:, 0] = trash_slot
            meta_s[:, 1] = np.arange(n_slots)  # row p IS slot p (identity)
            # int16 wire: half the per-call host→device bytes
            frames_s = np.zeros((n_slots,) + frames.shape[1:], np.int16)
            meta_s[perm] = meta
            frames_s[perm] = pcm_to_wire(frames)
            out = self.step(
                params, audio_ring, meta_s, None, None, None, None, None,
                frames_s, max_steps, n_chunks=n_chunks,
            )
            # ONE fetch, then map rows back to submission order on the host
            t_fetch = time.monotonic() if trace_calls is not None else 0.0
            probs, tok_rows, n_rows, pos_new = jax.device_get(out)
            if trace_calls is not None:
                trace_calls.append(
                    (t_in, meta.shape[0], t_fetch, time.monotonic())
                )
            return probs[perm], tok_rows[perm], n_rows[perm], pos_new[perm]

        return batched_sstep

    # -- canonical views (tests / tools) -------------------------------------
    def cache_view(self, which: str):
        """Materialize a cache kind in the canonical external ``[S, L, H,
        hd, T]`` view (int8 kinds → ``(q8, scale [S, L, H, 1, T])``).
        Storage is layer-major ``[L, S, ...]`` (cache-representation note);
        this view transposes back for tests/tools."""
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
            return np.asarray(cache).transpose(1, 0, 2, 3, 4)
        if isinstance(cache, tuple):
            q8 = np.asarray(cache[0]).transpose(1, 0, 2, 3, 4)
            sc = np.asarray(cache[1]).transpose(1, 0, 2, 3).reshape(
                self.max_slots, L, H, 1, self.enc_t
            )
            return q8, sc
        return np.asarray(cache).transpose(1, 0, 2, 3, 4)


# process-wide tables keyed by model tag (mirrors _get_audio_ring)
_TABLES: Dict[str, StreamTable] = {}
_TABLES_LOCK = threading.Lock()


def get_stream_table(tag: str, cfg: WhisperConfig, dtype, **kw) -> StreamTable:
    """Process-wide table per model tag; ``kw`` (max_slots, enc_t, ...)
    applies only at first creation (single-flight semantics — the first
    creator sizes the table; a second table per model would double the
    multi-GB KV residency). A later caller whose sizing request conflicts
    gets the existing table and a logged warning: too-small capacity
    surfaces as clean ``try_alloc``/``open_session`` failures and the
    bucket-path fallback, not silent corruption."""
    with _TABLES_LOCK:
        tbl = _TABLES.get(tag)
        if tbl is None:
            tbl = StreamTable(cfg, dtype, **kw)
            _TABLES[tag] = tbl
        else:
            got = {"max_slots": tbl.max_slots, "enc_t": tbl.enc_t, "dec_t": tbl.dec_t}
            diff = {
                k: v for k, v in kw.items()
                if k in got and v is not None and got.get(k) != v
            }
            if diff:
                import logging

                logging.getLogger(__name__).warning(
                    "stream table %s already sized %s; ignoring request %s "
                    "(first creator wins)", tag, got, diff,
                )
        return tbl
