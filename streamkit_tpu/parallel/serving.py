# SPDX-License-Identifier: Apache-2.0
"""Sharded serving: place the streaming STT state (stream table, audio
ring) and Whisper weights on a ``(dp, tp)`` mesh so the fused per-block
stream step runs multi-chip.

Layout (the scaling-book recipe: annotate shardings, let XLA insert the
collectives over ICI):

* **weights** — Megatron TP per :func:`..parallel.mesh.whisper_param_sharding`
  (column-parallel q/k/v/mlp1, row-parallel o/mlp2 → one psum per block),
* **KV caches** ``[L, S, H, hd, T]`` (layer-major storage) — heads over
  ``tp`` (each chip holds the K/V of its own attention heads: attention is
  embarrassingly parallel over heads until the output projection's psum)
  and **session slots (axis 1) over ``dp``** (each chip group owns a shard
  of the live sessions),
* **audio rings / VAD state** ``[S, ...]`` — slots over ``dp``,
* **batched step inputs** ``[B, ...]`` — rows over ``dp``.

Slot-indexed gathers (``table[stream_ids]``) against a dp-sharded S axis
compile to XLA gather-with-collectives; when the serving layer assigns
sessions to slots round-robin over dp groups (the allocator's default
low-first order approximates this), most rows resolve shard-locally.

Single-chip behavior is untouched: sharding is opt-in via
:func:`shard_serving_state` (the engine and tests call it only when a mesh
is supplied). Exercised multi-chip by ``__graft_entry__.dryrun_multichip``
on the virtual 8-CPU mesh and by ``tests/test_parallel_serving.py``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import shard_params

__all__ = ["shard_serving_state", "serving_input_shardings"]


def _put(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_stream_table(mesh: Mesh, table) -> None:
    """Reshard a :class:`~streamkit_tpu.models.whisper.streaming.StreamTable`
    in place: slots over dp, KV heads over tp. Caches are canonical
    ``[L, S, H, hd, T]`` buffers (streaming.py cache-representation note),
    layer-major, so dp over the slot axis is an axis-1 split and tp splits
    the head axis directly (requires ``heads % tp == 0``)."""
    vec = P("dp")

    def put_kv(cache):
        if isinstance(cache, tuple):  # int8: ([L,S,H,hd,T], scale [L,S,H,T])
            return (
                _put(cache[0], mesh, P(None, "dp", "tp", None, None)),
                _put(cache[1], mesh, P(None, "dp", "tp", None)),
            )
        return _put(cache, mesh, P(None, "dp", "tp", None, None))

    table._enc_k = put_kv(table._enc_k)
    table._enc_v = put_kv(table._enc_v)
    table._xk = put_kv(table._xk)
    table._xv = put_kv(table._xv)
    # decoder self K/V: [Ld, S, H, hd, DEC_T]
    table._dec_k = _put(table._dec_k, mesh, P(None, "dp", "tp", None, None))
    table._dec_v = _put(table._dec_v, mesh, P(None, "dp", "tp", None, None))
    table._tokens = _put(table._tokens, mesh, P("dp", None))
    table._fed = _put(table._fed, mesh, vec)
    table._n_tok = _put(table._n_tok, mesh, vec)
    table._enc_pos = _put(table._enc_pos, mesh, vec)


def shard_audio_ring(mesh: Mesh, ring) -> None:
    """Reshard a :class:`~streamkit_tpu.engine.audio_ring.SessionAudioRing`
    in place: slots over dp."""
    ring._ring = _put(ring._ring, mesh, P("dp", None))
    ring._vad_state = jax.tree.map(
        lambda a: _put(a, mesh, P(*(("dp",) + (None,) * (a.ndim - 1)))),
        ring._vad_state,
    )


def shard_serving_state(mesh: Mesh, params, table=None, ring=None):
    """Place Whisper weights (TP) and, when given, the stream table and
    audio ring (slots over dp, heads over tp) onto ``mesh``. Returns the
    sharded params; tables are resharded in place."""
    params = shard_params(mesh, params)
    if table is not None:
        shard_stream_table(mesh, table)
    if ring is not None:
        shard_audio_ring(mesh, ring)
    return params


def serving_input_shardings(mesh: Mesh):
    """(meta, frames) shardings for the fused stream step's batched inputs:
    rows over dp."""
    return (
        NamedSharding(mesh, P("dp", None)),
        NamedSharding(mesh, P("dp", None, None)),
    )
