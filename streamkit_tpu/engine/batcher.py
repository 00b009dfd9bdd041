# SPDX-License-Identifier: Apache-2.0
"""Continuous batcher: one device call per node *type*, batched over sessions.

This is the TPU-native replacement for the reference's actor-per-node data
plane (SURVEY.md §2.9): instead of each session's node dispatching its own
tiny device call, nodes submit work items to a process-wide batcher which

* groups submissions by ``(kind, input shapes)``,
* ticks on a micro-batch cadence (default 5 ms — well inside the 20 ms
  audio frame budget, so batching adds no audible latency) or fires early
  when a group reaches ``max_batch``,
* stacks inputs to ``[B, ...]``, runs ONE jitted call, and scatters the
  per-item results back to the awaiting nodes.

Per-session recurrent state (VAD state, resampler phase, KV caches) travels
with the submission and comes back updated — device-resident slot tables
are a later optimization; the batching win (MXU utilization, dispatch
amortization) is already captured here.

Correctness contract: registered functions must be batch-invariant (row i
of the batched result equals the unbatched computation — guaranteed for
jit-of-vmappable functions; tested for whisper in test_whisper_model.py).
"""

from __future__ import annotations

import asyncio
import logging
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["DeviceBatcher", "BatchKind"]


@dataclass
class BatchKind:
    """A registered batched computation.

    ``fn(stacked_inputs: tuple[jax.Array, ...]) -> tuple[jax.Array, ...]``
    where every array has a leading batch dim. ``fn`` should be jitted.
    """

    name: str
    fn: Callable[..., Any]
    max_batch: int = 64
    # pad every dispatch to exactly this size (when the chunk fits): ONE
    # XLA program per kind+shape instead of log2(max_batch) — compiles are
    # 30-60 s each over a remote device, so latency-critical kinds want this
    pad_to: Optional[int] = None
    # hold a partial batch up to this long waiting for co-arriving sessions
    # (classic gather window). 0 = dispatch at the next tick. Expensive kinds
    # (whisper partial decode) coalesce far better with a small window: N
    # sessions' partials land within one window -> one padded call instead
    # of N half-empty ones.
    gather_ms: float = 0.0
    # pass the stacked batch to fn as HOST numpy arrays instead of device
    # arrays: kinds that re-pack the batch on the host before dispatch
    # (the dense STT engine scatters rows into slot order) would otherwise
    # pay a device upload + fetch per call just to reorder
    host_inputs: bool = False
    # transient kinds re-register before every submit (the per-sentence /
    # per-segment ML paths) and may be TTL-purged when idle; durable kinds
    # (engine stream/ring kinds registered once at startup) never are
    transient: bool = False
    last_used: float = field(default_factory=time.monotonic)
    # co-paced coalescing target: when the caller knows how many sessions
    # submit per cadence period (the dense STT engine does), a partial
    # batch reaching `expected` fires IMMEDIATELY — the gather window then
    # only bounds the wait for stragglers instead of being the trigger.
    # Without it, a window shorter than the arrival spread under load
    # splits each period into several partial calls and the call rate
    # multiplies (measured: 32 paced sessions -> mean batch 14, 2x calls,
    # p50 4 s — PERF_NOTES round-3 chip campaign). None = size-triggered
    # dispatch at pad_to/max_batch as before.
    expected: Optional[int] = None


@dataclass
class _Item:
    inputs: Tuple[np.ndarray, ...]
    future: asyncio.Future
    t: float = field(default_factory=time.monotonic)


class DeviceBatcher:
    """Micro-batching dispatcher for device work."""

    def __init__(self, tick_ms: float = 5.0, kind_ttl_secs: float = 900.0) -> None:
        self.tick_secs = tick_ms / 1000.0
        # idle kinds are purged after this TTL: registered fns close over
        # full model param trees (and their jit executables), so a kind
        # registry with no eviction would pin every retired model's weights
        # for the process lifetime even after ResourceManager LRU eviction.
        # Re-registration after a purge is cheap (recompile on next use).
        self.kind_ttl_secs = kind_ttl_secs
        self._last_purge = time.monotonic()
        self._kinds: Dict[str, BatchKind] = {}
        self._pending: Dict[Tuple, List[_Item]] = defaultdict(list)
        self._shape_groups: Dict[str, set] = {}
        self.shape_group_warn_threshold = 12
        self._wake = asyncio.Event()
        self._task: Optional[asyncio.Task] = None
        self._running = False
        self._inflight_tasks: set = set()
        # observability
        self.submissions = 0
        self.device_calls = 0
        self.batched_items = 0
        # per-kind: [calls, items, total_dispatch_wall_s] — dispatch wall
        # time approximates device occupancy (the device executes calls
        # serially; concurrent dispatches overlap only in queueing)
        self.kind_stats: Dict[str, list] = defaultdict(lambda: [0, 0, 0.0])

    # -- registration --------------------------------------------------------
    def register(
        self,
        name: str,
        fn: Callable[..., Any],
        max_batch: int = 64,
        pad_to: Optional[int] = None,
        gather_ms: float = 0.0,
        host_inputs: bool = False,
        transient: bool = False,
    ) -> None:
        """Idempotent: re-registering a kind keeps the first fn."""
        if name not in self._kinds:
            # with a fixed pad, oversize groups must split into pad-sized
            # chunks: splitting by a larger max_batch would dispatch shapes
            # above the pad — each a fresh 30-60 s XLA compile mid-run (and
            # an OOM risk at large decode batches)
            if pad_to is not None:
                max_batch = min(max_batch, pad_to)
            self._kinds[name] = BatchKind(
                name, fn, max_batch, pad_to, gather_ms, host_inputs, transient
            )

    def is_registered(self, name: str) -> bool:
        return name in self._kinds

    def registered_kinds(self) -> Dict[str, BatchKind]:
        """Snapshot of registered kinds (read-only use: warmup drivers and
        observability — benches must not reach into ``_kinds``)."""
        return dict(self._kinds)

    def set_expected(self, name: str, n: Optional[int]) -> None:
        """Update a kind's co-paced coalescing target (see BatchKind.expected).
        0/None clears it. Safe to call every cadence period."""
        kind = self._kinds.get(name)
        if kind is not None:
            kind.expected = n or None

    # -- lifecycle --------------------------------------------------------------
    def start(self) -> None:
        if self._task is None or self._task.done():
            self._running = True
            self._task = asyncio.ensure_future(self._run())

    def stop(self) -> None:
        self._running = False
        self._wake.set()

    # -- submission ----------------------------------------------------------
    async def submit(self, kind: str, *inputs: np.ndarray):
        """Submit one item; returns the per-item output tuple (or single
        value if the fn returns one array)."""
        return await self.submit_nowait(kind, *inputs)

    def submit_nowait(self, kind: str, *inputs: np.ndarray) -> asyncio.Future:
        """Enqueue one item synchronously and return the result future.

        Lets a single task (the serving engine's ingest drain loop) submit
        a whole co-paced cohort in one event-loop step: with per-worker
        submits, the wakeup jitter between N workers on a loaded host
        splits each cadence period's batch into partial calls (measured:
        149 calls vs 117 ideal at 64 paced sessions — PERF_NOTES round 4)."""
        if kind not in self._kinds:
            raise KeyError(f"batch kind not registered: {kind}")
        if self._task is None or self._task.done():
            self.start()
        self.submissions += 1
        self._kinds[kind].last_used = time.monotonic()
        key = (kind,) + tuple(np.asarray(x).shape for x in inputs)
        # shape-group hygiene: every distinct input-shape tuple is its own
        # XLA program (30-60 s compile each on a remote device) AND its own
        # coalescing group. A kind accumulating many groups is a node
        # submitting un-bucketed variable shapes — warn once so it gets
        # pad_to/bucketing treatment instead of a silent compile storm.
        groups = self._shape_groups.setdefault(kind, set())
        if key not in groups:
            groups.add(key)
            if len(groups) == self.shape_group_warn_threshold:
                logger.warning(
                    "batch kind %r has accumulated %d distinct input-shape "
                    "groups — submissions are un-bucketed (each group is a "
                    "separate XLA program and batches separately); pad or "
                    "bucket this kind's inputs",
                    kind, len(groups),
                )
        fut = asyncio.get_running_loop().create_future()
        group = self._pending[key]
        group.append(_Item(tuple(np.asarray(x) for x in inputs), fut))
        k = self._kinds[kind]
        if len(group) >= min(k.max_batch, k.expected or k.max_batch):
            self._wake.set()
        return fut

    # -- dispatcher loop ---------------------------------------------------------
    async def _run(self) -> None:
        loop = asyncio.get_running_loop()
        while self._running:
            try:
                await asyncio.wait_for(self._wake.wait(), timeout=self.tick_secs)
            except asyncio.TimeoutError:
                pass
            self._wake.clear()
            now = time.monotonic()
            if self.kind_ttl_secs > 0 and now - self._last_purge > 60.0:
                self._last_purge = now
                busy = {key[0] for key in self._pending}
                for name in [
                    n for n, k in self._kinds.items()
                    if k.transient and n not in busy
                    and now - k.last_used > self.kind_ttl_secs
                ]:
                    del self._kinds[name]
            if not self._pending:
                continue
            batches = self._pending
            self._pending = defaultdict(list)
            dispatches = []
            now = time.monotonic()
            for key, items in batches.items():
                kind = self._kinds[key[0]]
                full = kind.pad_to or kind.max_batch
                if kind.expected is not None:
                    full = min(full, kind.expected)
                if (
                    kind.gather_ms > 0
                    and len(items) < full
                    and (now - items[0].t) * 1000.0 < kind.gather_ms
                ):
                    # hold the partial batch for co-arriving sessions
                    self._pending[key].extend(items)
                    continue
                # oversize groups split into max_batch chunks
                for i in range(0, len(items), kind.max_batch):
                    chunk = items[i : i + kind.max_batch]
                    dispatches.append(self._dispatch(loop, kind, chunk))
            # dispatch groups CONCURRENTLY and WITHOUT blocking the tick loop:
            # a slow kind (whisper decode) must not head-of-line-block cheap
            # kinds (VAD scoring) arriving at the next tick. Per-session
            # ordering is safe: a submitter awaits its result before
            # submitting again, so no session has two batches in flight.
            for d in dispatches:
                task = asyncio.ensure_future(d)
                self._inflight_tasks.add(task)
                task.add_done_callback(self._inflight_tasks.discard)

    async def _dispatch(self, loop, kind: BatchKind, items: List[_Item]) -> None:
        # pad the batch (repeating the last row): every distinct batch size is
        # a separate XLA compilation. Kinds with pad_to get ONE fixed size;
        # otherwise power-of-2 bucketing caps compiles at log2(max_batch).
        # Repeated rows are safe for slot-table kinds: duplicates gather the
        # same state and scatter identical values.
        n = len(items)
        if kind.host_inputs:
            # host-repack kinds shape their own device batch — padding here
            # would only stack duplicate rows the fn immediately collapses
            padded = n
        elif kind.pad_to is not None and n <= kind.pad_to:
            padded = kind.pad_to
        else:
            padded = 1 << (n - 1).bit_length() if n > 1 else 1
        rows = items + [items[-1]] * (padded - n)
        to_dev = (lambda a: a) if kind.host_inputs else jnp.asarray
        stacked = tuple(
            to_dev(np.stack([it.inputs[j] for it in rows]))
            for j in range(len(items[0].inputs))
        )
        self.device_calls += 1
        self.batched_items += len(items)

        def run_batch():
            out = kind.fn(*stacked)
            if not isinstance(out, tuple):
                out = (out,)
            # ONE device_get for all outputs: per-array fetches each pay a
            # full transfer round trip (~24 ms over the axon tunnel)
            return tuple(jax.device_get(out))

        t0 = time.monotonic()
        try:
            outputs = await loop.run_in_executor(None, run_batch)
        except Exception as e:  # noqa: BLE001 — propagate to every waiter
            for it in items:
                if not it.future.done():
                    it.future.set_exception(e)
            return
        ks = self.kind_stats[kind.name]
        ks[0] += 1
        ks[1] += len(items)
        ks[2] += time.monotonic() - t0
        for idx, it in enumerate(items):
            row = tuple(o[idx] for o in outputs)
            if not it.future.done():
                it.future.set_result(row if len(row) > 1 else row[0])

    # -- stats ------------------------------------------------------------------
    def stats(self) -> dict:
        return {
            "submissions": self.submissions,
            "device_calls": self.device_calls,
            "batched_items": self.batched_items,
            "mean_batch": (self.batched_items / self.device_calls) if self.device_calls else 0.0,
            "kinds": {
                k: {"calls": v[0], "items": v[1], "dispatch_s": round(v[2], 2)}
                for k, v in sorted(self.kind_stats.items())
            },
        }
