# SPDX-License-Identifier: Apache-2.0
"""Device-mesh sharding for the model stack (data + tensor parallel).

The reference has no multi-device compute (SURVEY.md §2.9) — its scale axis
is client↔server transport. Here, scale-out follows the TPU recipe: pick a
mesh, annotate shardings, let XLA insert collectives over ICI.

Axes:
* ``dp`` — data parallel over the session/batch axis (continuous batcher
  shards live sessions across chips),
* ``tp`` — tensor parallel over heads/ffn for Whisper-large-class models
  whose per-chip batch would otherwise be HBM-bound.

Whisper param layout rules (applied by :func:`whisper_param_sharding`):
attention q/k/v and mlp1 shard their output dim over ``tp``; attn.o and
mlp2 shard their input dim (row-parallel) so each pair needs a single
psum per block; embeddings shard over the vocab axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "whisper_param_sharding", "seq2seq_param_sharding", "shard_params", "data_sharding"]


def make_mesh(n_devices: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    """Create a ``(dp, tp)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if n % tp != 0:
        raise ValueError(f"n_devices {n} not divisible by tp {tp}")
    dp = n // tp
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _spec_for_path(path: str) -> P:
    """PartitionSpec for a whisper param, keyed by its pytree path.

    Paths look like ``['enc']/['layers']/[0]/['attn']/['q']/['w']``.
    """
    is_w = path.endswith("['w']")
    # column-parallel: shard output features over tp
    if any(f"['{k}']" in path for k in ("q", "k", "v", "mlp1")):
        if is_w:
            return P(None, "tp")
        return P("tp")  # bias follows the sharded output dim
    # row-parallel: shard input features over tp (output replicated via psum)
    if any(f"['{k}']" in path for k in ("o", "mlp2")):
        if is_w:
            return P("tp", None)
        return P()  # bias replicated
    if "tok_emb" in path:
        return P("tp", None)  # vocab axis
    if "conv" in path and is_w:
        return P(None, None, "tp")  # [k, in, out] — shard out features
    if "conv" in path and path.endswith("['b']"):
        return P("tp")
    return P()  # layernorms, positions: replicated


def _path_str(path) -> str:
    return "/".join(str(p) for p in path)


def _fits(spec: P, shape, mesh: Mesh) -> bool:
    """A spec fits iff every sharded dim divides by its mesh-axis size."""
    for i, axis in enumerate(spec):
        if axis is None:
            continue
        if i >= len(shape) or shape[i] % mesh.shape[axis] != 0:
            return False
    return True


def _seq2seq_spec_for_path(path: str) -> P:
    """PartitionSpec for a Marian/NLLB param (models/marian.py, nllb.py
    layer layout). Megatron pairing: q/k/v + fc1 column-parallel, o + fc2
    row-parallel; the tied embedding shards its vocab axis (serves as both
    lookup table and output projection — XLA inserts the gather/psum)."""
    is_w = path.endswith("['w']")
    if any(f"['{k}']" in path for k in ("q", "k", "v", "fc1")):
        return P(None, "tp") if is_w else P("tp")
    if any(f"['{k}']" in path for k in ("o", "fc2")):
        return P("tp", None) if is_w else P()
    if path.endswith("['emb']"):
        return P("tp", None)
    if path.endswith("['logits_bias']"):
        return P("tp")  # follows the vocab axis of emb.T
    return P()  # pos table, layernorms: replicated


def seq2seq_param_sharding(mesh: Mesh, params):
    """NamedSharding pytree for a Marian/NLLB param pytree (same
    replicate-on-misfit fallback as the whisper rules)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        spec = _seq2seq_spec_for_path(_path_str(path))
        if not _fits(spec, np.shape(leaf), mesh):
            spec = P()
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, specs)


def whisper_param_sharding(mesh: Mesh, params):
    """Build a NamedSharding pytree matching the whisper param pytree.

    Leaves whose sharded dim does not divide by the mesh axis (e.g. the
    51865-token vocab embedding under tp=2) fall back to replication —
    correctness first; pad-to-multiple is a later optimization."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        spec = _spec_for_path(_path_str(path))
        if not _fits(spec, np.shape(leaf), mesh):
            spec = P()
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(mesh: Mesh, params):
    """Place a host param pytree onto the mesh with TP layout."""
    shardings = whisper_param_sharding(mesh, params)
    return jax.device_put(params, shardings)


def data_sharding(mesh: Mesh, *batch_axes_specs) -> NamedSharding:
    """Batch tensors shard over dp, replicated over tp."""
    return NamedSharding(mesh, P("dp", *batch_axes_specs))
