# SPDX-License-Identifier: Apache-2.0
"""Device-resident session state tables.

SURVEY.md §2.9 maps the reference's per-session bounded channels to
"HBM-resident state indexed by session slot". This module implements that:
recurrent per-session state (VAD state, resampler phase, …) lives in HBM
arrays of shape ``[max_slots, ...]``; a batched step gathers the submitting
sessions' rows, applies the kernel, and scatters updates back — all inside
ONE jitted call with the state buffers donated, so per-session state never
crosses the host↔device boundary after allocation.

Versus carrying state through batcher submissions, this removes the state
upload+download per call (the dominant per-call cost over a remote/tunneled
device, and real DMA traffic even locally).

Collision rule: one batch must not contain the same slot twice. The
continuous batcher guarantees this structurally — a session awaits its
result before submitting again.
"""

from __future__ import annotations

import functools
import threading
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SlotTable"]


class SlotTable:
    """A pool of device-resident state rows keyed by slot index."""

    def __init__(self, init_row_fn: Callable[[], Any], max_slots: int = 256) -> None:
        """``init_row_fn() -> pytree`` of per-session state (no batch dim)."""
        self.max_slots = max_slots
        row = init_row_fn()
        # state: [max_slots, ...] per leaf, initialized by broadcasting the row
        self._state = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (max_slots,) + jnp.asarray(x).shape).copy(),
            row,
        )
        self._init_row = jax.tree.map(jnp.asarray, row)
        self._free: List[int] = list(range(max_slots - 1, -1, -1))
        self._lock = threading.Lock()
        # steps donate the state buffers: concurrent steps on one table would
        # race on the donated arrays — serialize them
        self._step_lock = threading.Lock()

    # -- slot lifecycle ---------------------------------------------------------
    def alloc(self) -> int:
        """Acquire a slot; its row is reset on acquire (so stray writes to
        unallocated slots — e.g. warmup submissions — can't leak state)."""
        with self._lock:
            if not self._free:
                raise RuntimeError(f"slot table exhausted ({self.max_slots} slots)")
            slot = self._free.pop()
        with self._step_lock:
            self._state = self._reset_row(
                self._state, jnp.asarray(slot, jnp.int32), self._init_row
            )
        return slot

    def free(self, slot: int) -> None:
        with self._lock:
            self._free.append(slot)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _reset_row(self, state, slot, init_row):
        return jax.tree.map(lambda s, r: s.at[slot].set(r), state, init_row)

    @property
    def in_use(self) -> int:
        with self._lock:
            return self.max_slots - len(self._free)

    # -- batched stepping -------------------------------------------------------
    def make_step(self, fn: Callable) -> Callable:
        """Build a batched step for the continuous batcher.

        ``fn(state_rows, *inputs) -> (new_state_rows, *outputs)`` where
        ``state_rows`` is the gathered per-row pytree with a leading batch
        dim. The returned callable has signature ``(slot_ids [B], *inputs)``
        and returns the outputs; state stays in HBM (donated in/out).
        """

        @functools.partial(jax.jit, donate_argnums=0)
        def _apply(state, slot_ids, *inputs):
            rows = jax.tree.map(lambda s: s[slot_ids], state)
            result = fn(rows, *inputs)
            new_rows, outputs = result[0], result[1:]
            new_state = jax.tree.map(lambda s, r: s.at[slot_ids].set(r), state, new_rows)
            return new_state, outputs

        def step(slot_ids, *inputs):
            with self._step_lock:
                self._state, outputs = _apply(
                    self._state, jnp.asarray(slot_ids, jnp.int32), *inputs
                )
            return outputs if len(outputs) > 1 else outputs[0]

        return step
