# SPDX-License-Identifier: Apache-2.0
"""Dense multi-session streaming STT serving.

:class:`SttServingEngine` serves N concurrent realtime speech-to-text
sessions over ONE shared Whisper model. It is the high-density form of
:class:`~streamkit_tpu.nodes.ml.whisper_node.WhisperNode`: the node is the
graph-pipeline citizen (channels in, packets out, one node per session);
this engine is what the serving host runs when the session count is the
workload — the BASELINE north star (≥64 realtime sessions/chip, <300 ms
p50 partials) is served here.

The division of labor per 256 ms VAD block and session:

* **C++** (:class:`~streamkit_tpu.engine.ingest.IngestPool`): packet
  pacing, buffering, block assembly. The Python loop does ONE coalesced
  drain per tick regardless of session count — per-packet asyncio work is
  what measurably collapsed a 1-core host at 16 sessions (PERF_NOTES).
* **TPU** (:func:`~streamkit_tpu.models.whisper.streaming._stream_step`
  via the :class:`~streamkit_tpu.engine.batcher.DeviceBatcher`): VAD
  scoring + ring append + chunk-causal encode + decode continuation +
  segment-open reset, fused into ONE batched call covering every co-paced
  session.
* **Python** (here): the per-session segmentation state machine
  (:class:`~streamkit_tpu.nodes.ml.vad_node.SpeechSegmenter` — the
  reference's VAD gating contract, ``plugins/native/whisper/src/
  lib.rs:404-490``), cursor planning for the fused step, and event
  emission. Cost: a few hundred Python ops per session per 256 ms.

Finals come in two modes (the node's ``final_from_stream`` knob):

* ``final_mode="stream"`` — the continuation decode has already consumed
  the utterance plus the VAD hangover; its newest tokens ARE the final.
  Zero device work at segment close.
* ``final_mode="exact"`` — the reference's contract: re-decode the whole
  segment with the exact bidirectional encoder (bucketed ring decode).
  The session's worker awaits it inline, serializing that session for the
  decode duration, exactly like the reference's per-session plugin call
  (``plugin-native/src/wrapper.rs`` spawn_blocking).
"""

from __future__ import annotations

import asyncio
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core import ResourceKey, ResourceManager
from ..models.whisper import (
    WHISPER_CONFIGS,
    WhisperDetokenizer,
    init_params,
    load_pretrained,
)
from ..models.whisper.config import language_index
from ..models.whisper.streaming import (
    CHUNK_POS,
    CHUNK_SAMPLES,
    RIGHT_CTX,
    get_stream_table,
)
from ..ops import VAD_FRAME
from .batcher import DeviceBatcher
from .ingest import IngestPool

__all__ = ["SttServingEngine"]

_SR = 16_000


@dataclass
class _Session:
    sid: int
    vad_slot: int
    stream_id: int
    on_event: Callable[[dict], None]
    seg: object
    q: asyncio.Queue = field(default_factory=asyncio.Queue)
    worker: Optional[asyncio.Task] = None
    written: int = 0
    st_tip: int = 0
    st_pos: int = 0
    st_ready: bool = False
    st_last_dec: float = 0.0
    st_last_tok: Optional[tuple] = None
    pending_reset: bool = False
    seq: int = 0
    # True while the worker is blocked awaiting an exact-final ring decode —
    # it submits no stream steps then and must not count toward `expected`
    awaiting_final: bool = False
    # True while the worker is mid-item (between q.get and completion).
    # The drain loop may group-submit a block directly ONLY when the
    # session has nothing queued and nothing processing — per-session
    # block ordering is the correctness contract (asyncio is single-
    # threaded, so this flag is only observed at await points).
    processing: bool = False


class SttServingEngine:
    """N realtime STT sessions over one shared model (module docstring)."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        model_size: str = "tiny",
        language: str = "en",
        dtype: str = "bfloat16",
        max_sessions: int = 64,
        vad_block_frames: int = 8,
        vad_threshold: float = 0.5,
        min_silence_ms: float = 700.0,
        max_segment_secs: float = 30.0,
        partial_interval_ms: float = 250.0,
        final_mode: str = "stream",  # "stream" | "exact"
        window_buckets: Optional[List[float]] = None,  # exact-final buckets
        max_tokens: int = 32,
        batcher: Optional[DeviceBatcher] = None,
        resources: Optional[ResourceManager] = None,
        mesh=None,
        ingest_queue_cap: int = 4096,
    ) -> None:
        if final_mode not in ("stream", "exact"):
            raise ValueError(f"final_mode must be stream|exact, got {final_mode}")
        self.model_path = model_path
        self.model_size = model_size
        self.language = language
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.max_sessions = max_sessions
        self.vad_block = vad_block_frames
        self.block_samples = vad_block_frames * VAD_FRAME
        self.vad_threshold = vad_threshold
        self.min_silence_ms = min_silence_ms
        self.max_segment_secs = max_segment_secs
        self.partial_interval = partial_interval_ms / 1000.0
        self.final_mode = final_mode
        self.window_buckets = sorted(window_buckets or [4.0, 8.0, 30.0])
        self.max_tokens = max_tokens
        self.batcher = batcher or DeviceBatcher(
            tick_ms=float(os.environ.get("SK_STT_TICK_MS", "5"))
        )
        self._own_batcher = batcher is None
        self.resources = resources
        # optional (dp, tp) jax.sharding.Mesh: weights go TP, KV slot tables
        # dp(slots)×tp(heads), audio rings dp — parallel/serving.py layout.
        # None = single chip (default; no behavior change).
        self.mesh = mesh
        # ingest block-queue depth: realtime serving needs little (blocks
        # drain every tick); full-speed replay benches must hold the whole
        # backlog or the pool's drop-oldest backpressure loses blocks
        self.ingest_queue_cap = ingest_queue_cap
        self.pool: Optional[IngestPool] = None
        self._sessions: Dict[int, _Session] = {}
        self._workers: set = set()  # all live worker tasks (for stop())
        self._drain_task: Optional[asyncio.Task] = None
        self._running = False
        # filled by start()
        self._params = None
        self._cfg = None
        self._detok = None
        self._ring = None
        self._tbl = None
        self._prefix = None
        self._sstep_kind = None
        self._stt_kind = None
        self._stream_steps = int(os.environ.get("SK_STREAM_STEPS", "3"))
        # group submit: the drain loop plans + submits a whole co-paced
        # cohort's stream steps in one synchronous sweep (see _drain_loop);
        # SK_STREAM_GROUP_SUBMIT=0 reverts to per-worker submits
        self._group_submit = os.environ.get("SK_STREAM_GROUP_SUBMIT", "1") == "1"
        # SK_STT_TRACE=1: per-block stage timestamps (arrival→dequeue→
        # submit→return) + per-fused-call (start, batch, end) — the
        # latency-debug instrument behind the <300 ms north star. Rows:
        # blocks: (sid, arrival_mono, t_dequeue, t_submit, t_return)
        # calls:  (t_start, batch_rows, t_end)
        self.trace_blocks: Optional[list] = (
            [] if os.environ.get("SK_STT_TRACE") == "1" else None
        )
        self.trace_calls: Optional[list] = (
            [] if os.environ.get("SK_STT_TRACE") == "1" else None
        )
        # finals served from the stream table vs exact-decode fallbacks
        # (horizon froze / segment closed before any decode)
        self.finals_stream = 0
        self.finals_fallback = 0

    # -- lifecycle -----------------------------------------------------------
    async def start(self) -> None:
        loop = asyncio.get_running_loop()

        def build():
            if self.model_path and os.path.isdir(self.model_path):
                cfg, params = load_pretrained(self.model_path, self.dtype)
                tok = WhisperDetokenizer.from_model_dir(self.model_path)
            else:
                cfg = WHISPER_CONFIGS[self.model_size]
                params = init_params(cfg, jax.random.PRNGKey(0), self.dtype)
                tok = WhisperDetokenizer()
            return cfg, params, tok

        if self.resources is not None:
            key = ResourceKey.from_params(
                "whisper",
                {"path": self.model_path, "size": self.model_size, "dtype": str(self.dtype)},
            )

            async def loader():
                return await loop.run_in_executor(None, build)

            self._cfg, self._params, self._detok = await self.resources.get_or_create(
                key, loader
            )
        else:
            self._cfg, self._params, self._detok = await loop.run_in_executor(None, build)

        lang_index = language_index(self.language)
        self._lang_index = lang_index
        self._prefix = np.asarray(
            [
                self._cfg.token_sot,
                self._cfg.token_language(lang_index),
                self._cfg.token_transcribe,
                self._cfg.token_no_timestamps,
            ],
            np.int32,
        )
        # shared audio ring + stream table (same process-wide instances the
        # whisper node uses, so both serving forms share compiled programs)
        from ..nodes.ml.whisper_node import _get_audio_ring

        self._ring = _get_audio_ring()
        model_tag = f"{self.model_path or self.model_size}:{lang_index}:{self.max_tokens}"
        # table width = engine capacity (capped by the HBM budget env): the
        # identity-packed fused step is B = table width, so a small engine
        # must not pay a 64-wide device call per block
        # dec_t sized to the token budget (prefix + max_tokens + headroom,
        # 64-aligned): decoder self-KV is read fully per decode step, so a
        # 128-deep default pays 2x the HBM for a 32-token budget
        p_len = len(self._prefix)
        dec_t = min(
            int(os.environ.get("SK_STREAM_DEC_T", "128")),
            max(64, -(-(p_len + self.max_tokens + 8) // 64) * 64),
        )
        self._tbl = get_stream_table(
            model_tag, self._cfg, self.dtype,
            max_slots=min(
                self.max_sessions, int(os.environ.get("SK_STREAM_SLOTS", "64"))
            ),
            dec_t=dec_t,
        )
        if self.mesh is not None:
            from ..parallel.serving import shard_serving_state

            self._params = shard_serving_state(
                self.mesh, self._params, table=self._tbl, ring=self._ring
            )
        self._sstep_kind = f"stream_step:{model_tag}:{self.vad_block}"
        # stream-final mode: force-cut segments at the stream horizon (the
        # reference's 30 s forced cut, bounded by our encoder table) minus an
        # 8-chunk catch-up margin — segments that outgrow the horizon freeze
        # the tip and every such final pays an exact-decode fallback
        # (measured: 17% fallbacks on synth speech whose short pauses chain
        # utterances past 10.24 s; the fallback bucket decodes dominated the
        # device). Exact mode keeps the configured cut.
        if self.final_mode == "stream":
            horizon_secs = (self._tbl.enc_t // CHUNK_POS - 8) * CHUNK_SAMPLES / _SR
            self.max_segment_secs = min(self.max_segment_secs, horizon_secs)
        params, cfg, ring, tbl = self._params, self._cfg, self._ring, self._tbl
        # inert rows in the identity-packed batch park their ring writes on
        # the process-shared trash slot (duplicate writes of garbage, never
        # read; shared with the WhisperNode stream path)
        trash = ring.trash_slot()

        # chunk budget per fused call: sustained encode rate must cover the
        # block rate (block_samples per call), rounded up to whole chunks —
        # 8-frame blocks (4096 smp) need 2 chunks/call, 16-frame (8192) 4.
        self._n_chunks = max(2, -(-self.block_samples // CHUNK_SAMPLES))
        batched_sstep = tbl.identity_step_fn(
            params, ring, trash, self._stream_steps,
            n_chunks=self._n_chunks, trace_calls=self.trace_calls,
        )

        stream_pad = int(os.environ.get("SK_STREAM_PAD", str(min(64, self._tbl.max_slots))))
        # gather window defaults to 0.8x the block period: with `expected`
        # coalescing (below) a healthy co-paced period fires the moment all
        # active sessions' blocks are in, so the window only bounds how long
        # stragglers can hold the batch — a wide window caps the call rate
        # at ~1/period under phase drift instead of letting partial
        # dispatches multiply it (PERF_NOTES round-3 chip campaign: 30 ms
        # window at 32 paced sessions -> mean batch 14, 2x calls, p50 4 s).
        block_ms = self.block_samples * 1000.0 / _SR
        self.batcher.register(
            self._sstep_kind,
            batched_sstep,
            pad_to=stream_pad,
            gather_ms=float(os.environ.get("SK_STREAM_GATHER_MS", str(0.8 * block_ms))),
            host_inputs=True,
        )

        # exact bucketed ring decode: the primary path in "exact" mode, the
        # correctness FALLBACK in "stream" mode (a frozen stream horizon or
        # a never-decoded segment re-decodes exactly instead of emitting an
        # empty/stale final)
        from ..models.whisper.decode import transcribe_ring

        self._stt_kind = f"whisper_ring:{model_tag}"
        pad_stt = int(os.environ.get("SK_STT_PAD_TO", "0")) or None
        gather_ms = float(os.environ.get("SK_STT_GATHER_MS", "150"))

        def make_ring_stt(window: int, tok_budget: int):
            # (slot, start, length, lang) rows — the same signature as the
            # WhisperNode ring kinds so warmup_batched_kinds covers both
            def batched_stt(slot_ids, starts, lengths, lang_rows):
                return transcribe_ring(
                    params, cfg, ring.ring_ref(), slot_ids, starts, lengths,
                    window_samples=window,
                    language_index=np.asarray(lang_rows, np.int32),
                    max_tokens=tok_budget,
                )

            return batched_stt

        for b in self.window_buckets:
            tok_budget = min(self.max_tokens, max(12, int(b * 4) + 8))
            self.batcher.register(
                f"{self._stt_kind}:{int(b * _SR)}",
                make_ring_stt(int(b * _SR), tok_budget),
                pad_to=pad_stt,
                gather_ms=gather_ms,
            )

        self.pool = IngestPool(
            self.max_sessions, self.block_samples,
            queue_cap=self.ingest_queue_cap,
        )
        self.batcher.start()
        self._running = True
        self._drain_task = asyncio.ensure_future(self._drain_loop())

    async def stop(self) -> None:
        self._running = False
        for s in list(self._sessions.values()):
            self.close_session(s.sid)
        if self._drain_task is not None:
            try:
                await asyncio.wait_for(self._drain_task, timeout=5)
            except (asyncio.TimeoutError, asyncio.CancelledError):
                self._drain_task.cancel()
        # reap every worker task (workers remove themselves from _sessions,
        # so the reap list must be independent of it)
        if self._workers:
            done, pending = await asyncio.wait(self._workers, timeout=5)
            for t in pending:
                t.cancel()
            if pending:
                await asyncio.gather(*pending, return_exceptions=True)
        self._workers.clear()
        self._sessions.clear()
        if self._own_batcher:
            self.batcher.stop()
        if self.pool is not None:
            self.pool.close()

    # -- sessions ------------------------------------------------------------
    def open_session(self, on_event: Callable[[dict], None]) -> int:
        """Open one STT session; returns its id (also the ingest session id
        for :meth:`push`/:meth:`start_replay`). ``on_event`` receives dicts
        ``{type: partial|final|speech_start|speech_end, text?, start_ms?,
        end_ms?, seq}`` from the event loop thread."""
        from ..nodes.ml.vad_node import SpeechSegmenter

        vad_slot = self._ring.alloc()
        if vad_slot is None:
            raise RuntimeError("audio ring full")
        stream_id = self._tbl.try_alloc()
        if stream_id is None:
            self._ring.free(vad_slot)
            raise RuntimeError("stream table full")
        sid = self.pool.open()
        s = _Session(
            sid=sid,
            vad_slot=vad_slot,
            stream_id=stream_id,
            on_event=on_event,
            seg=SpeechSegmenter(
                self.vad_threshold, self.min_silence_ms, self.max_segment_secs,
                store_samples=False,  # finals decode from the device ring
            ),
        )
        s.worker = asyncio.ensure_future(self._session_worker(s))
        self._workers.add(s.worker)
        s.worker.add_done_callback(self._workers.discard)
        self._sessions[sid] = s
        return sid

    def close_session(self, sid: int) -> None:
        s = self._sessions.get(sid)
        if s is None:
            return
        self.pool.close_session(sid)
        s.q.put_nowait(None)

    def idle(self) -> bool:
        """True when no session workers are live (all slots freed) — the
        public form of "drained" for benches/tests awaiting slot reuse."""
        return not self._sessions

    def push(self, sid: int, pcm: np.ndarray) -> None:
        self.pool.push(sid, pcm)

    def start_replay(self, sid: int, audio: np.ndarray, **kw) -> None:
        self.pool.start_replay(sid, audio, **kw)

    # -- serving loops -------------------------------------------------------
    async def _drain_loop(self) -> None:
        loop = asyncio.get_running_loop()
        pool = self.pool
        # active-session estimate for co-paced coalescing: a session counts
        # as active while it produced a block within the last 2 periods.
        # Feeds BatchKind.expected so the fused step fires the instant every
        # active session's block is in (idle/paused sessions only cost the
        # gather-window bound, never a permanent stall).
        last_seen: Dict[int, float] = {}
        period = self.block_samples / _SR
        while self._running:
            ids, arrivals, blocks = await loop.run_in_executor(
                None, pool.drain, None, 20_000
            )
            now = time.monotonic()
            for i in range(len(ids)):
                if int(ids[i]) in self._sessions:
                    last_seen[int(ids[i])] = now
            # prune + refresh on EVERY drain (including empty ones): a stale
            # nonzero `expected` after ingest goes idle would otherwise
            # persist indefinitely (ADVICE r3)
            horizon = now - 2.0 * period
            for sid in [
                k for k, t in last_seen.items()
                if t < horizon or k not in self._sessions
            ]:
                del last_seen[sid]
            # sessions blocked awaiting an exact-final ring decode submit no
            # stream steps; counting them active would make every fused
            # batch wait the full straggler window while a final is in
            # flight (ADVICE r3)
            expected = 0
            for k in last_seen:
                s = self._sessions.get(k)
                if s is not None and not s.awaiting_final:
                    expected += 1
            # SK_STREAM_COHORTS=n splits each block period's fused batch
            # into n deliberate cohorts: the batch fires at ceil(active/n)
            # instead of waiting for every co-paced session, trading batch
            # fullness for gather wait (the device call is ~batch-size-
            # insensitive, so 2 phase-locked half-calls per period can beat
            # 1 full call + stragglers — measured A/B, PERF_NOTES round 4)
            cohorts = max(1, int(os.environ.get("SK_STREAM_COHORTS", "1")))
            # expected BEFORE the submits below: the whole cohort then lands
            # in one event-loop step and the batcher fires on count
            self.batcher.set_expected(
                self._sstep_kind, -(-expected // cohorts) if expected else 0
            )
            for i in range(len(ids)):
                s = self._sessions.get(int(ids[i]))
                if s is None:
                    continue
                item = (int(arrivals[i]), blocks[i])
                if self._group_submit and s.q.empty() and not s.processing:
                    # group submit: plan + enqueue the device work HERE, in
                    # one synchronous sweep over the whole cohort — the
                    # per-session workers then only post-process results.
                    # Per-worker submits pay one event-loop wakeup per
                    # session between block arrival and submission; on a
                    # loaded single-core host that jitter splits the
                    # co-paced gather into partial calls (149 calls vs 117
                    # ideal at 64 sessions — PERF_NOTES round 4).
                    fut, ctx = self._plan_block(s, blocks[i], item[0])
                    s.q.put_nowait(("p", fut, ctx))
                else:
                    s.q.put_nowait(item)

    async def _session_worker(self, s: _Session) -> None:
        try:
            while True:
                item = await s.q.get()
                if item is None:
                    break
                s.processing = True
                try:
                    if item[0] == "p":
                        _, fut, ctx = item
                        await self._finish_block(s, ctx, await fut)
                    else:
                        arrival_ns, block = item
                        await self._handle_block(s, block, arrival_ns)
                finally:
                    s.processing = False
            # stream flush: close any open segment
            for ev in s.seg.flush():
                await self._segment_closed(s, ev[2], ev[3], flush=True)
        finally:
            self._tbl.free(s.stream_id)
            self._ring.free(s.vad_slot)
            self._sessions.pop(s.sid, None)

    async def _handle_block(self, s: _Session, block: np.ndarray, arrival_ns: int = 0) -> None:
        fut, ctx = self._plan_block(s, block, arrival_ns)
        await self._finish_block(s, ctx, await fut)

    def _plan_block(self, s: _Session, block: np.ndarray, arrival_ns: int = 0):
        """Plan + submit one block's fused stream step (synchronous).

        Returns ``(result_future, ctx)`` for :meth:`_finish_block`. Cursor
        state advances HERE (the submitted meta row snapshot is what the
        device will apply), so per-session call ordering — enforced by the
        queue-empty/processing gate in the drain loop and the worker —
        is the only sequencing requirement."""
        t_deq = time.monotonic() if self.trace_blocks is not None else 0.0
        block2 = block.reshape(self.vad_block, VAD_FRAME)
        # plan the fused step (same cursor math as the whisper node)
        if s.seg.in_speech and s.st_ready:
            avail = s.written + block.size - RIGHT_CTX - s.st_tip
            room = (self._tbl.enc_t - s.st_pos) // 8
            n_req = max(0, min(avail // CHUNK_SAMPLES, self._n_chunks))
            if room < n_req:
                n_req = 0  # horizon full: partials freeze
            now = time.monotonic()
            do_dec = s.st_pos + 8 * n_req > 0 and now - s.st_last_dec >= self.partial_interval
            if do_dec:
                s.st_last_dec = now
        else:
            n_req = 0
            do_dec = False
        do_rst = s.pending_reset
        s.pending_reset = False
        rs = self._ring.ring_samples
        meta_row = np.concatenate(
            [
                np.asarray(
                    [
                        s.vad_slot,
                        s.stream_id,
                        s.written % rs,
                        s.st_tip % rs,
                        n_req,
                        int(do_dec),
                        int(do_rst),
                    ],
                    np.int32,
                ),
                self._prefix,
            ]
        )
        t_sub = time.monotonic() if self.trace_blocks is not None else 0.0
        fut = self.batcher.submit_nowait(self._sstep_kind, meta_row, block2)
        s.written += block.size
        s.st_tip += n_req * CHUNK_SAMPLES
        s.st_pos += n_req * 8
        return fut, (arrival_ns, t_deq, t_sub, block2, n_req, do_dec)

    async def _finish_block(self, s: _Session, ctx, result) -> None:
        arrival_ns, t_deq, t_sub, block2, n_req, do_dec = ctx
        probs, tok_row, ntk, _ = result
        if self.trace_blocks is not None:
            self.trace_blocks.append(
                (s.sid, arrival_ns / 1e9, t_deq, t_sub, time.monotonic())
            )
        partial_emit = None
        if do_dec:
            partial_emit = (tok_row, int(ntk), s.st_tip // VAD_FRAME)
            s.st_last_tok = (tok_row, int(ntk))

        probs = np.asarray(probs)
        for i in range(self.vad_block):
            for kind, _samples, start_f, end_f in s.seg.push(block2[i], float(probs[i])):
                if kind == "speech_start":
                    s.on_event({"type": "speech_start", "seq": s.seq})
                    s.pending_reset = True
                    s.st_tip = start_f * VAD_FRAME
                    s.st_pos = 0
                    s.st_ready = True
                    s.st_last_tok = None
                else:
                    s.st_ready = False
                    await self._segment_closed(s, start_f, end_f)
                    s.st_last_tok = None
        # fused-step partial AFTER segment events (a closing block's partial
        # is superseded by the final)
        if (
            partial_emit is not None
            and s.seg.in_speech
            and s.st_ready
            and partial_emit[1] > len(self._prefix)
        ):
            tok_row, ntk, end_f = partial_emit
            text = self._detok.decode(tok_row[len(self._prefix) : ntk])
            self._emit(s, "partial", text, s.seg._segment_start_frame, end_f)

    async def _segment_closed(self, s: _Session, start_f: int, end_f: int, flush=False) -> None:
        s.on_event({"type": "speech_end", "seq": s.seq})
        stream_ok = (
            s.st_last_tok is not None
            and s.st_last_tok[1] > len(self._prefix)
            and s.st_tip >= end_f * VAD_FRAME - 2 * CHUNK_SAMPLES
        )
        if self.final_mode == "stream" and stream_ok:
            self.finals_stream += 1
            text = self._detok.decode(s.st_last_tok[0][len(self._prefix) : s.st_last_tok[1]])
            self._emit(s, "final", text, start_f, end_f)
            return
        # exact (or stream-fallback) final: bucketed ring re-decode
        self.finals_fallback += 1
        n = min((end_f - start_f) * VAD_FRAME, int(self.window_buckets[-1] * _SR))
        window = next(
            (int(b * _SR) for b in self.window_buckets if n <= int(b * _SR)),
            int(self.window_buckets[-1] * _SR),
        )
        rs = self._ring.ring_samples
        s.awaiting_final = True
        try:
            tokens, length = await self.batcher.submit(
                f"{self._stt_kind}:{window}",
                np.int32(s.vad_slot),
                np.int32((start_f * VAD_FRAME) % rs),
                np.int32(n),
                np.int32(self._lang_index),
            )
        finally:
            s.awaiting_final = False
        self._emit(s, "final", self._detok.decode(tokens[: int(length)]), start_f, end_f)

    def _emit(self, s: _Session, typ: str, text: str, start_f: int, end_f: int) -> None:
        s.on_event(
            {
                "type": typ,
                "text": text,
                "start_ms": start_f * VAD_FRAME * 1000 // _SR,
                "end_ms": end_f * VAD_FRAME * 1000 // _SR,
                "seq": s.seq,
            }
        )
        s.seq += 1
