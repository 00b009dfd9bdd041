# SPDX-License-Identifier: Apache-2.0
"""Pallas TPU kernel: per-row windowed KV-cache write.

The streaming Whisper tables append each fused call's candidate chunk
columns at a per-slot ring position: ``cache[s, ..., (pos[s]+i) % T] =
upd[s, ..., i]`` for ``i < lim[s]``. XLA offers no efficient lowering for
this on TPU:

* ``lax.scatter`` (windowed, even with ``unique_indices``) lowers to a
  SERIAL while-loop over index pairs — profiled at 41 ms per cache kind
  per fused call on v5e (PERF_NOTES round-4 xplane profile);
* the one-hot select merge (``_select_merge_chunks``) is fully parallel
  but rewrites the ENTIRE multi-GB buffer and materializes candidate
  buffers of the same size: ~32 ms per call across the four int8 caches
  (9 ms candidate einsums + 23 ms select pass) for a write that touches
  ≤16 columns per row.

The kernel below does the write as a read-modify-write of exactly TWO
128-column blocks per (row, feature-group) — the minimal lane-aligned
window covering ``pos[s] .. pos[s]+lim[s]`` including ring wrap-around
(lane-dim slices must be 128-aligned on Mosaic, so an 8-wide chunk window
cannot be DMA'd directly; a 128-wide aligned RMW window is the next-best
form). Traffic per cache: ``S × F × 256`` elements read + written
(~0.7 GB for a large-v3 int8 enc cache) vs ``3 × S × F × T`` for the
select merge (~15 GB across candidates+select) — ~20× less.

Per-row positions are runtime values, so block index maps use
``PrefetchScalarGridSpec`` scalar prefetch (the paged-attention pattern):
``pos`` is prefetched to SMEM and the cache BlockSpec's index map picks
block column ``(pos[s]//128 + j) % (T//128)`` for ``j ∈ {0, 1}``.

In-kernel, candidates are positioned with a tiny one-hot matmul
(``[F_blk, c] @ [c, 128]`` — MXU, exact: one nonzero f32 product per
output column; int8/bf16 → f32 → back roundtrips bit-exactly) and merged
with a masked select. ``lim[s] = 0`` rows (inert/pad rows in the identity
batch) write the block back unchanged, which aliasing makes a no-op
read+write of 2×128 columns.

``input_output_aliases`` keeps the update in place under jit donation —
the caller donates the tables into the fused step, so no copy of the
cache ever exists.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["windowed_write", "windowed_write_groups", "supports"]

_LANE = 128


def supports(T: int, c: int) -> bool:
    """Shapes the kernel handles: the candidate window must fit in two
    column blocks, and T must tile into whole lane blocks (or be a single
    sub-lane block)."""
    if T % _LANE == 0:
        return c <= _LANE
    return T <= _LANE  # single block covers the whole (padded) ring


def _kernel(pos_ref, lim_ref, upd_ref, cache_ref, out_ref, *, T, c, cb, nb):
    s = pl.program_id(0)
    j = pl.program_id(1)
    pos = pos_ref[s]
    lim = lim_ref[s]
    base = ((pos // cb + j) % nb) * cb
    # delta(l) = how far column (base + l) is past pos, in ring order
    col = base + jax.lax.broadcasted_iota(jnp.int32, (1, cb), 1)
    delta = (col - pos) % T
    write = delta < lim  # [1, cb]
    onehot = (
        delta == jax.lax.broadcasted_iota(jnp.int32, (c, cb), 0)
    ).astype(jnp.float32) * write.astype(jnp.float32)
    upd = upd_ref[0].astype(jnp.float32)  # [F_blk, c]
    cand = jax.lax.dot_general(
        upd, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)  # [F_blk, cb]
    out_ref[0] = jnp.where(write, cand, cache_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret", "fb"))
def windowed_write(
    cache: jnp.ndarray,  # [S, F, T] (any dtype; donated/aliased in place)
    upd: jnp.ndarray,  # [S, F, c] candidate columns, time minor
    pos: jnp.ndarray,  # [S] int32 start column (ring position)
    lim: jnp.ndarray,  # [S] int32 columns to write (0 = inert row)
    interpret: bool = False,
    fb: int = 8192,  # feature rows per block (VMEM budget knob)
) -> jnp.ndarray:
    """``cache[s, f, (pos[s]+i) % T] = upd[s, f, i]`` for ``i < lim[s]``,
    in place. Callers flatten feature dims to one axis (a free reshape of
    contiguous major dims) and must satisfy :func:`supports`."""
    S, F, T = cache.shape
    c = upd.shape[-1]
    assert supports(T, c), (T, c)
    cb = _LANE if T % _LANE == 0 else T  # column block width
    nb = T // cb
    nj = min(nb, 2)
    while F % fb:
        fb //= 2
    grid = (S, nj, F // fb)

    def cache_idx(s, j, g, pos_ref, lim_ref):
        return (s, g, (pos_ref[s] // cb + j) % nb)

    def upd_idx(s, j, g, pos_ref, lim_ref):
        return (s, g, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, T=T, c=c, cb=cb, nb=nb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, fb, c), upd_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, fb, cb), cache_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, fb, cb), cache_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # input index: [pos, lim, upd, cache] → cache is input 3
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * nj * F * c * cb,
            bytes_accessed=2 * S * nj * F * cb * cache.dtype.itemsize
            + S * F * c * upd.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), lim.astype(jnp.int32), upd, cache)
    return out


def _kernel4(pos_ref, lim_ref, upd_ref, cache_ref, out_ref, *, T, c, cb, nb):
    s = pl.program_id(0)
    j = pl.program_id(1)
    pos = pos_ref[s]
    lim = lim_ref[s]
    base = ((pos // cb + j) % nb) * cb
    col = base + jax.lax.broadcasted_iota(jnp.int32, (1, cb), 1)
    delta = (col - pos) % T
    write = delta < lim  # [1, cb]
    onehot = (
        delta == jax.lax.broadcasted_iota(jnp.int32, (c, cb), 0)
    ).astype(jnp.float32) * write.astype(jnp.float32)
    gb, _, fb, _ = upd_ref.shape
    upd = upd_ref[:, 0].astype(jnp.float32).reshape(gb * fb, c)
    cand = jax.lax.dot_general(
        upd, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(gb, fb, cb).astype(out_ref.dtype)
    out_ref[:, 0] = jnp.where(write[None], cand, cache_ref[:, 0])


@functools.partial(jax.jit, static_argnames=("interpret", "gb"))
def windowed_write_groups(
    cache: jnp.ndarray,  # [G, S, F, T] (G groups share each row's window)
    upd: jnp.ndarray,  # [G, S, F, c] candidate columns, time minor
    pos: jnp.ndarray,  # [S] int32 start column (ring position)
    lim: jnp.ndarray,  # [S] int32 columns to write (0 = inert row)
    interpret: bool = False,
    gb: int = 0,  # groups per block (0 = auto from a ~2 MB VMEM budget)
) -> jnp.ndarray:
    """Grouped :func:`windowed_write`: ``cache[g, s, f, (pos[s]+i) % T] =
    upd[g, s, f, i]`` for ``i < lim[s]``, in place.

    This is the layer-major cache form ``[L, S, H·hd, T]`` — every layer
    (group) of a slot writes the same column window, so blocking ``gb``
    groups into one VMEM block keeps the grid at ``S × 2 × G/gb`` steps
    instead of the ``G·S × 2`` a flattened-row :func:`windowed_write` call
    would cost (measured: grid-step overhead ≈ µs-scale — a 32× larger
    grid of 32× smaller DMAs erases the win the layer-major layout buys).
    """
    G, S, F, T = cache.shape
    c = upd.shape[-1]
    assert supports(T, c), (T, c)
    cb = _LANE if T % _LANE == 0 else T
    nb = T // cb
    nj = min(nb, 2)
    if not gb:
        # Live VMEM per group per grid step: cache-in + out blocks (F·cb each)
        # plus the upd block (F·c), all double-buffered by Mosaic.
        per_group = 2 * (
            2 * F * cb * cache.dtype.itemsize + F * c * upd.dtype.itemsize
        )
        budget = 2 * 1024 * 1024 // per_group
        gb = max(1, min(G, budget))
    while G % gb:
        gb -= 1
    grid = (S, nj, G // gb)

    def cache_idx(s, j, g, pos_ref, lim_ref):
        return (g, s, 0, (pos_ref[s] // cb + j) % nb)

    def upd_idx(s, j, g, pos_ref, lim_ref):
        return (g, s, 0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel4, T=T, c=c, cb=cb, nb=nb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((gb, 1, F, c), upd_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, 1, F, cb), cache_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((gb, 1, F, cb), cache_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # input index: [pos, lim, upd, cache] → cache is input 3
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * S * nj * F * c * cb,
            bytes_accessed=2 * G * S * nj * F * cb * cache.dtype.itemsize
            + G * S * F * c * upd.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), lim.astype(jnp.int32), upd, cache)
    return out
