# SPDX-License-Identifier: Apache-2.0
"""Pallas flash-attention kernel for TPU.

Used by the Whisper encoder (1500-token windows): XLA's attention
materializes the ``[heads, T, T]`` score matrix in HBM (20 heads × 1500² ×
4 B ≈ 180 MB per large-v3 layer); this kernel keeps the softmax running
statistics in VMEM and streams K/V blocks, so HBM traffic is O(T·d) and
larger session batches fit per chip.

Design (per the Pallas TPU guide):
* grid = (batch*heads, Tq/BLOCK_Q); the kernel loops over K blocks with
  ``jax.lax.fori_loop`` carrying (acc, row_max, row_sum) — static shapes,
* blocks are (128, head_dim): lane-aligned; query blocks pad to 128 and a
  mask kills the padded tail,
* matmuls use ``preferred_element_type=f32`` (MXU bf16×bf16→f32 path).

Falls back to plain XLA attention off-TPU (CPU tests run the `interpret`
path for numerical verification instead).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["flash_attention", "attention_reference"]

BLOCK_Q = 256
BLOCK_K = 256
_NEG_INF = -1e30


def attention_reference(q, k, v, scale: float) -> jnp.ndarray:
    """Plain XLA attention (fallback + test oracle). q/k/v: [..., T, d]."""
    scores = jnp.matmul(
        q * scale, k.swapaxes(-1, -2) * scale, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.matmul(probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


_LOG2E = math.log2(math.e)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    """One (batch·head, q-block) program: stream K/V blocks, online softmax.

    Mosaic-performance notes:
    * scores via ``dot_general`` contracting the last dim of BOTH operands —
      a ``k.T`` inside the kernel lowers to a vector-shuffle relayout that
      dominates runtime,
    * softmax in base-2 (``exp2``; scores pre-multiplied by log2 e) — exp2
      is the native VPU transcendental,
    * the padded-tail mask only runs on the final K block (``lax.cond``),
      not every iteration.
    """
    # fold both scales and the log2(e) softmax base-change into q
    q = q_ref[0] * jnp.asarray(scale * scale * _LOG2E, q_ref.dtype)
    head_dim = q.shape[-1]
    num_kv_blocks = pl.cdiv(kv_len, BLOCK_K)
    full_blocks = kv_len // BLOCK_K  # blocks that need no tail mask

    def body(kb, carry):
        acc, row_max, row_sum = carry
        k_blk = k_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :]
        v_blk = v_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :]
        # q [BQ, d] · k [BK, d] contracted on d: no transpose materialized
        scores = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = jax.lax.cond(
            kb >= full_blocks,
            lambda s: jnp.where(
                kb * BLOCK_K
                + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                < kv_len,
                s,
                _NEG_INF,
            ),
            lambda s: s,
            scores,
        )
        new_max = jnp.maximum(row_max, jnp.max(scores, axis=-1))
        correction = jnp.exp2(row_max - new_max)
        probs = jnp.exp2(scores - new_max[:, None])
        acc = acc * correction[:, None] + jnp.dot(
            probs.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        row_sum = row_sum * correction + jnp.sum(probs, axis=-1)
        return acc, new_max, row_sum

    acc0 = jnp.zeros((q.shape[0], head_dim), jnp.float32)
    max0 = jnp.full((q.shape[0],), _NEG_INF, jnp.float32)
    sum0 = jnp.zeros((q.shape[0],), jnp.float32)
    acc, _, row_sum = jax.lax.fori_loop(0, num_kv_blocks, body, (acc0, max0, sum0))
    o_ref[0] = (acc / row_sum[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_call(q, k, v, scale: float, interpret: bool = False):
    """q: [bh, Tq, d]; k/v: [bh, Tkv, d] (Tq multiple of BLOCK_Q, padded)."""
    bh, tq, d = q.shape
    kv_len = k.shape[1]
    kv_pad = (BLOCK_K - kv_len % BLOCK_K) % BLOCK_K
    if kv_pad:
        k = jnp.pad(k, ((0, 0), (0, kv_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kv_pad), (0, 0)))
    grid = (bh, tq // BLOCK_Q)
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=kv_len),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, k.shape[1], d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, k.shape[1], d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v)


_LIB_BLOCK = 512  # tuned on v5e at whisper-large encoder shape (B·H=400, T=1536, d=64)


def _lib_flash(q, k, v, scale: float) -> jnp.ndarray:
    """Route through JAX's pipelined TPU flash kernel
    (``jax.experimental.pallas.ops.tpu.flash_attention``).

    2.8× faster than the single-buffered kernel below at the whisper
    encoder shape (4.6 ms vs 12.5 ms per large-v3 layer, batch 20): its
    grid streams K/V blocks through the Pallas pipeline (double-buffered
    DMA) instead of an in-kernel ``fori_loop`` of synchronous loads.
    Pads T to a block multiple; padded KV columns are masked via segment
    ids, padded Q rows are sliced off.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as lib_fa,
    )

    b, h, tq, d = q.shape
    kv_len = k.shape[2]
    tq_p = -(-tq // _LIB_BLOCK) * _LIB_BLOCK
    kv_p = -(-kv_len // _LIB_BLOCK) * _LIB_BLOCK
    if tq_p != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    seg = None
    if kv_p != kv_len:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, kv_p - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, kv_p - kv_len), (0, 0)))
        kv_ids = (jnp.arange(kv_p) >= kv_len).astype(jnp.float32)
        seg = SegmentIds(
            q=jnp.zeros((b, tq_p), jnp.float32),
            kv=jnp.broadcast_to(kv_ids, (b, kv_p)),
        )
    bs = BlockSizes(
        block_q=min(_LIB_BLOCK, tq_p),
        block_k_major=min(_LIB_BLOCK, kv_p),
        block_k=min(_LIB_BLOCK, kv_p),
        block_b=1,
    )
    out = lib_fa(q, k, v, segment_ids=seg, sm_scale=scale * scale, block_sizes=bs)
    return out[:, :, :tq].astype(q.dtype)


def flash_attention(q, k, v, scale: float, interpret: bool = False) -> jnp.ndarray:
    """Flash attention over ``[batch, heads, T, d]`` (non-causal).

    ``scale`` is applied to both q and k (whisper's ``d**-0.25`` convention).
    On real TPU backends this dispatches to the pipelined library kernel
    (see :func:`_lib_flash`); the in-repo kernel serves the interpret path
    (CPU numerical tests) and as a fallback.
    """
    if not interpret:
        try:
            return _lib_flash(q, k, v, scale)
        except Exception:  # noqa: BLE001 — fall back to the in-repo kernel
            pass
    b, h, tq, d = q.shape
    kv_len = k.shape[2]
    q2 = q.reshape(b * h, tq, d)
    k2 = k.reshape(b * h, kv_len, d)
    v2 = v.reshape(b * h, kv_len, d)
    q_pad = (BLOCK_Q - tq % BLOCK_Q) % BLOCK_Q
    if q_pad:
        q2 = jnp.pad(q2, ((0, 0), (0, q_pad), (0, 0)))
    out = _flash_call(q2, k2, v2, scale, interpret)
    if q_pad:
        out = out[:, :tq]
    return out.reshape(b, h, tq, d)


def use_flash_attention() -> bool:
    """Flash kernel only on real TPU backends (CPU uses the XLA fallback)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False
