# SPDX-License-Identifier: Apache-2.0
"""Shared pow-2-bucketed greedy-decode scaffolding for text seq2seq nodes.

One definition of the bucket/pad/jit/batch plumbing used by the NLLB and
Marian translation nodes: source token ids pad to pow-2 buckets (clamped
to the model's position table), the decode callable is jitted once (XLA
specializes per bucket/batch shape), and with an engine batcher texts from
all sessions sharing a model coalesce per bucket. Extra per-row inputs
(e.g. NLLB target-language tokens) ride the batch.
"""

from __future__ import annotations

import weakref
from typing import Callable, Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["BucketedGreedy"]

# one jitted decode per kind_tag, shared across node instances: N sessions
# on one model must not compile N identical XLA programs (30-60 s each over
# a device tunnel). kind_tag embeds id(params); the anchor (the model's cfg
# object, loaded alongside the params by the ResourceManager) is weakref'd
# to guard against id() reuse after the original load is collected.
_JIT_CACHE: Dict[str, Tuple[weakref.ref, object]] = {}


def _shared_jit(kind_tag: str, anchor, decode: Callable):
    # sweep entries whose anchor died: the jitted fn closes over the model
    # params, so stale entries would pin evicted weights forever
    for k in [k for k, (ref, _) in _JIT_CACHE.items() if ref() is None]:
        del _JIT_CACHE[k]
    hit = _JIT_CACHE.get(kind_tag)
    if hit is not None:
        ref, fn = hit
        if ref() is anchor:
            return fn
    fn = jax.jit(decode)
    try:
        _JIT_CACHE[kind_tag] = (weakref.ref(anchor), fn)
    except TypeError:  # unweakrefable anchor: skip sharing
        pass
    return fn


class BucketedGreedy:
    """``decode(src [b, t], *extras [b, ...]) -> (tokens [b, T], lengths [b])``."""

    def __init__(
        self,
        kind_tag: str,
        max_positions: int,
        pad_id: int,
        decode: Callable,
        max_batch: int = 16,
        share_anchor=None,
    ) -> None:
        self.kind_tag = kind_tag
        self.max_positions = max_positions
        self.pad_id = pad_id
        self.max_batch = max_batch
        if share_anchor is not None:
            self._jit = _shared_jit(kind_tag, share_anchor, decode)
        else:
            self._jit = jax.jit(decode)

    def _bucketed(self, ids):
        n = min(len(ids), self.max_positions)
        # the pow-2 bucket must not overrun the position table
        tb = min(1 << max(4, (max(1, n) - 1).bit_length()), self.max_positions)
        n = min(n, tb)
        padded = np.full(tb, self.pad_id, np.int32)
        padded[:n] = ids[:n]
        return tb, padded

    def run_single(self, ids, *extras):
        """Direct path: one row. Returns (tokens row, length)."""
        _, padded = self._bucketed(ids)
        toks, lens = self._jit(
            jnp.asarray(padded[None]),
            *[jnp.asarray(np.asarray(e)[None]) for e in extras],
        )
        return np.asarray(toks[0]), int(lens[0])

    def _batch_fn(self, src_b: np.ndarray, *extra_b: np.ndarray):
        toks, lens = self._jit(
            jnp.asarray(src_b), *[jnp.asarray(e) for e in extra_b]
        )
        return np.asarray(toks), np.asarray(lens)

    async def run_batched(self, batcher, ids, *extras):
        """Cross-session path through the engine batcher."""
        tb, padded = self._bucketed(ids)
        kind = f"{self.kind_tag}:{tb}"
        batcher.register(kind, self._batch_fn, max_batch=self.max_batch, transient=True)
        toks, n = await batcher.submit(
            kind, padded, *[np.asarray(e) for e in extras]
        )
        return np.asarray(toks), int(n)
