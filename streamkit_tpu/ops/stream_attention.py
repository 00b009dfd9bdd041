# SPDX-License-Identifier: Apache-2.0
"""Fused int8-history attention for the streaming encoder (Pallas, TPU).

The fused stream step's encoder attends each call's new chunk positions
(``c = 8·n_chunks`` queries per row) over (a) the row's cached int8 K/V
history (``T = enc_t`` columns, per-column f32 scales) and (b) this call's
own candidate columns (block-causal within the call). Expressed in XLA
(``models/whisper/streaming.py _encode_core``), every layer materializes the
f32 score/probability matrices ``[B, H, c, T]`` to HBM between the score
matmul, the masked softmax, and the attend — at B=64, H=20, c=64, T=512
that is ~94 MB written and re-read several times per layer, profiled at
~0.8 ms/layer × 32 layers ≈ half the fused call's device time
(xplane: the ``fusion.28xx`` family, PERF_NOTES round-5).

This kernel runs the whole block — dequantized score matmuls, history +
candidate masks, the combined softmax, and both attends — in VMEM per
(batch row, head block): probabilities never touch HBM, history K/V is read
exactly once. The attention math matches ``_scores_rows``/``_attend_rows``:

* history scores  ``(qs · (k8·hd_scale)) · k_scale[t]`` (dequant fused into
  the operand; per-column scale applied after the dot),
* candidate scores the same against this call's quantized columns,
* history mask ``col < pos[b]``; candidate mask ``j2 < (j//8+1)·8``
  (full lookahead inside each 160 ms chunk, none across),
* attend folds the column scale into the probabilities
  (``Σ_t (p·s)·v8``), accumulating in f32.

Numerics: same operations as the XLA path in a different schedule — results
match to f32 rounding (tested ≤1e-5 rel in interpret mode), not bit-exact;
the gate (:func:`use_fused_attention`) keeps each backend self-consistent.

Shapes (one transformer layer, one call):
    qs       [B, H, c, hd]   model dtype, pre-scaled by hd**-0.25
    k8/v8    [B, H, hd, T]   int8 history (identity-mode slice of the table)
    ks/vs    [B, H, T]       f32 per-column scales
    ck8/cv8  [B, H, hd, c]   int8 candidate columns (this call)
    cks/cvs  [B, H, c]       f32 candidate scales
    pos      [B]             int32 valid-history bound per row
    out      [B, H, c, hd]   f32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["history_attention", "history_attention_reference", "supports"]


def supports(H: int, hd: int, T: int, c: int) -> bool:
    """Kernel preconditions: lane-dim sizes must be tileable and the head
    axis must split into whole blocks."""
    return T % 128 == 0 and hd % 8 == 0 and c % 8 == 0 and H % _head_block(H) == 0


def _head_block(H: int) -> int:
    for hb in (4, 5, 2, 1):
        if H % hb == 0:
            return hb
    return 1


def _kernel(pos_ref, qs_ref, k8_ref, ks_ref, v8_ref, vs_ref,
            ck_ref, cks_ref, cv_ref, cvs_ref, out_ref, *, op_scale, T, c):
    b = pl.program_id(0)
    pos = pos_ref[b]
    hb = qs_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    hist_ok = col < pos  # [1, T]
    j = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)  # query position
    j2 = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)  # candidate column
    cand_ok = j2 < (j // 8 + 1) * 8  # block-causal within the call
    for h in range(hb):
        qs = qs_ref[0, h]  # [c, hd]
        kd = k8_ref[0, h].astype(qs.dtype) * op_scale  # [hd, T]
        s_h = jax.lax.dot_general(
            qs, kd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * ks_ref[0, h]  # scale block is [1, T] — broadcasts over [c, T]
        ckd = ck_ref[0, h].astype(qs.dtype) * op_scale  # [hd, c]
        s_c = jax.lax.dot_general(
            qs, ckd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * cks_ref[0, h]  # [1, c]
        s_h = jnp.where(hist_ok, s_h, -jnp.inf)
        s_c = jnp.where(cand_ok, s_c, -jnp.inf)
        # combined softmax over [T + c] without concatenating
        m = jnp.maximum(
            jnp.max(s_h, axis=-1, keepdims=True), jnp.max(s_c, axis=-1, keepdims=True)
        )
        p_h = jnp.exp(s_h - m)
        p_c = jnp.exp(s_c - m)
        denom = jnp.sum(p_h, axis=-1, keepdims=True) + jnp.sum(p_c, axis=-1, keepdims=True)
        p_h = p_h / denom
        p_c = p_c / denom
        # attend: fold the column scale into the probabilities, int8 operand
        # stays on the matmul (Σ_t (p·s)·v8)
        ph = (p_h * vs_ref[0, h]).astype(qs.dtype)  # [c, T]
        pc = (p_c * cvs_ref[0, h]).astype(qs.dtype)  # [c, c]
        o = jax.lax.dot_general(
            ph, v8_ref[0, h].astype(qs.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o + jax.lax.dot_general(
            pc, cv_ref[0, h].astype(qs.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, h] = o


@functools.partial(jax.jit, static_argnames=("op_scale", "interpret"))
def history_attention(
    qs: jnp.ndarray,  # [B, H, c, hd] (pre-scaled queries)
    k8: jnp.ndarray,  # [B, H, hd, T] int8
    ks: jnp.ndarray,  # [B, H, T] f32
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    ck8: jnp.ndarray,  # [B, H, hd, c] int8
    cks: jnp.ndarray,  # [B, H, c] f32
    cv8: jnp.ndarray,
    cvs: jnp.ndarray,
    pos: jnp.ndarray,  # [B] int32
    op_scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, c, hd = qs.shape
    T = k8.shape[-1]
    hb = _head_block(H)
    grid = (B, H // hb)

    # Mosaic tiling rule: a block's last two dims must be 8/128-divisible OR
    # equal to the array dims. The per-column scales are [B, H, T]-shaped; a
    # (1, hb, T) block puts hb (=4 for H=20) in the sublane slot and fails to
    # lower. A trailing singleton axis makes the block (1, hb, 1, T) whose
    # last two dims (1, T) match the array exactly — the reshape is a free
    # bitcast under jit.
    ks4 = ks[:, :, None, :]
    vs4 = vs[:, :, None, :]
    cks4 = cks[:, :, None, :]
    cvs4 = cvs[:, :, None, :]

    def row_idx(b, h, pos_ref):
        return (b, h, 0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, op_scale=op_scale, T=T, c=c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, c, hd), row_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, hd, T), row_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, 1, T), row_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, hd, T), row_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, 1, T), row_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, hd, c), row_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, 1, c), row_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, hd, c), row_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, 1, c), row_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hb, c, hd), row_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, c, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * c * hd * (T + c) * 2,
            bytes_accessed=2 * B * H * hd * T + 2 * B * H * T * 4
            + qs.size * qs.dtype.itemsize + B * H * c * hd * 4,
            transcendentals=B * H * c * (T + c),
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), qs, k8, ks4, v8, vs4, ck8, cks4, cv8, cvs4)
    return out


def history_attention_reference(
    qs, k8, ks, v8, vs, ck8, cks, cv8, cvs, pos, op_scale
):
    """XLA reference with the exact `_encode_core` formulation (for tests)."""
    dtype = qs.dtype
    T = k8.shape[-1]
    c = qs.shape[2]
    s_h = jnp.matmul(
        qs, k8.astype(dtype) * op_scale, preferred_element_type=jnp.float32
    ) * ks[:, :, None, :]
    s_c = jnp.matmul(
        qs, ck8.astype(dtype) * op_scale, preferred_element_type=jnp.float32
    ) * cks[:, :, None, :]
    col = jnp.arange(T, dtype=jnp.int32)
    hist_mask = jnp.where(col[None, :] < pos[:, None], 0.0, -jnp.inf).astype(
        jnp.float32
    )[:, None, None, :]
    j = jnp.arange(c, dtype=jnp.int32)
    cand_mask = jnp.where(
        j[None, :] < ((j // 8 + 1) * 8)[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)[None, None, :, :]
    scores = jnp.concatenate([s_h + hist_mask, s_c + cand_mask], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    p_h, p_c = probs[..., :T], probs[..., T:]
    out = jnp.einsum(
        "bhqt,bhdt->bhqd", (p_h * vs[:, :, None, :]).astype(dtype),
        v8.astype(dtype), preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bhqt,bhdt->bhqd", (p_c * cvs[:, :, None, :]).astype(dtype),
        cv8.astype(dtype), preferred_element_type=jnp.float32,
    )
    return out
