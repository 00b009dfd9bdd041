# SPDX-License-Identifier: Apache-2.0
"""Streaming STT latency benchmark (BASELINE config #3).

Measures live partial-transcript latency: N concurrent dynamic sessions each
feed 20 ms PCM frames at real-time pace into a whisper node with
``partial_transcripts`` enabled; latency of a partial = emission wall time −
arrival wall time of the newest audio it covers. Final-segment latency is
measured the same way at VAD close.

Run on the real chip:  python benchmarks/latency_bench.py
Env: SK_LAT_MODEL (tiny|base|...|large-v3, default large-v3),
     SK_LAT_SESSIONS (default 8), SK_LAT_SECONDS (default 30),
     SK_LAT_INGEST (cpp|py, default cpp), SK_LAT_FINAL (stream|exact),
     SK_LAT_REPEATS (consecutive timed runs sharing one warmup, default 1).

Two ingestion modes:

* ``cpp`` (default) — the serving path: C++ ingest pool paces every
  session from native threads and assembles VAD blocks; the
  SttServingEngine drives one fused batched device step per block
  (engine/stt_serving.py). This is the configuration the ≥64-session
  north star is served with.
* ``py`` — round-2's per-session asyncio feeders through WhisperNode;
  kept for A/B comparison (measures the Python ingestion ceiling).

Prints one JSON line: p50/p90 partial latency ms + sessions + model.
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if "__file__" in globals() else "/root/repo")


def synth_speech(seconds: float, seed: int, sr: int = 16000) -> np.ndarray:
    """Session audio: real OpenSpeech slices when ``SK_LAT_AUDIO=real`` (and
    the fixture + libopus are present), else formant-synth utterances."""
    if os.environ.get("SK_LAT_AUDIO", "synth") == "real":
        from streamkit_tpu.utils.realspeech import real_speech_16k

        audio = real_speech_16k(seconds, seed=seed)
        if audio is not None:
            return audio
    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    audio, _ = synth_speech_with_plan(seconds, sr, seed=seed)
    return audio


_RM = None


def _resources():
    """One process-wide ResourceManager: the model loads ONCE and is shared
    across sessions (the server's single-flight cache semantics) — without
    it every session materializes its own copy of the weights."""
    global _RM
    if _RM is None:
        from streamkit_tpu.core import ResourceManager, ResourcePolicy

        _RM = ResourceManager(ResourcePolicy(keep_loaded=True))
    return _RM


async def run_session(idx: int, model_size: str, seconds: float, batcher, latencies: list):
    from streamkit_tpu.core import (
        AudioFormat,
        AudioFrame,
        Channel,
        NodeContext,
        OutputSender,
        Packet,
    )
    from streamkit_tpu.nodes.ml.whisper_node import WhisperNode

    sr = 16000
    frame = 320  # 20 ms
    audio = synth_speech(seconds, seed=idx)
    node = WhisperNode(
        {
            "model_size": model_size,
            "partial_transcripts": True,
            "partial_interval_ms": float(os.environ.get("SK_LAT_PARTIAL_MS", 250)),
            "window_buckets": [float(b) for b in os.environ.get("SK_LAT_BUCKETS", "4,8").split(",")],
            "vad_block_frames": int(os.environ.get("SK_LAT_VAD_BLOCK", 8)),
            "max_tokens": 32,
            "dtype": "bfloat16",
        }
    )
    in_ch = Channel(256)
    out_ch = Channel(1024)
    ctx = NodeContext(
        node_name=f"stt{idx}",
        inputs={"in": in_ch},
        output=OutputSender(f"stt{idx}", direct={"out": out_ch}),
        batcher=batcher,
        resources=_resources(),
    )
    print(f"# session {idx}: starting", file=sys.stderr, flush=True)
    task = asyncio.ensure_future(node.run(ctx))
    arrival: dict = {}  # frame index -> wall arrival time
    fmt = AudioFormat(sr, 1)

    async def feeder():
        n_frames = len(audio) // frame
        start = time.monotonic()
        for i in range(n_frames):
            target = start + i * 0.02
            delay = target - time.monotonic()
            if delay > 0:
                await asyncio.sleep(delay)
            arrival[i] = time.monotonic()
            await in_ch.send(
                Packet.new_audio(AudioFrame(audio[i * frame : (i + 1) * frame], fmt))
            )
        in_ch.close()

    async def collector():
        from streamkit_tpu.ops.vad import VAD_FRAME

        while True:
            pkt = await out_ch.recv_optional()
            if pkt is None:
                return
            now = time.monotonic()
            tr = pkt.transcription
            if tr is None:
                continue
            # newest audio covered = segment end (ms) → 20ms feed frame index
            end_ms = tr.segments[0].end_time_ms
            feed_idx = min(max(arrival), int(end_ms / 20))
            if feed_idx in arrival:
                latencies.append((now - arrival[feed_idx]) * 1000.0)

    feed_task = asyncio.ensure_future(feeder())
    collect_task = asyncio.ensure_future(collector())
    await feed_task
    print(f"# session {idx}: feed done", file=sys.stderr, flush=True)
    await task
    print(f"# session {idx}: node done", file=sys.stderr, flush=True)
    ctx.output.close()
    await collect_task


async def main_cpp():
    """Native-ingest serving bench: paced C++ replay into SttServingEngine."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/skit-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from streamkit_tpu.engine.stt_serving import SttServingEngine

    model_size = os.environ.get("SK_LAT_MODEL", "large-v3")
    n_sessions = int(os.environ.get("SK_LAT_SESSIONS", "8"))
    seconds = float(os.environ.get("SK_LAT_SECONDS", "30"))
    final_mode = os.environ.get("SK_LAT_FINAL", "stream")
    os.environ.setdefault("SK_STREAM_PAD", str(n_sessions))
    # measured A/B at 64 sessions, large-v3, real v5e (round 4): gather
    # 240 ms (~1 block period — cohorts re-merge instead of alternating)
    # + 2 decode steps/tick beat the 205 ms/3-step default 399.5 -> 322 ms
    # p50. steps=1 stalls decode progress entirely (no transcripts).
    os.environ.setdefault("SK_STREAM_GATHER_MS", "240")
    os.environ.setdefault("SK_STREAM_STEPS", "2")
    # (engine default would be 0.8x block period) —
    # `expected` coalescing fires full batches instantly when healthy
    os.environ.setdefault("SK_STREAM_SLOTS", str(max(64, n_sessions)))
    os.environ.setdefault("SK_RING_SLOTS", str(max(128, n_sessions + 8)))
    os.environ.setdefault("SK_STT_PAD_TO", str(n_sessions))
    frame_us = 20_000

    eng = SttServingEngine(
        model_size=model_size,
        dtype="bfloat16",
        max_sessions=n_sessions + 2,
        final_mode=final_mode,
        partial_interval_ms=float(os.environ.get("SK_LAT_PARTIAL_MS", 250)),
        window_buckets=[float(b) for b in os.environ.get("SK_LAT_BUCKETS", "4,8").split(",")],
        vad_block_frames=int(os.environ.get("SK_LAT_VAD_BLOCK", 8)),
        max_tokens=32,
        resources=_resources(),
    )
    await eng.start()

    # -- warmup: compile the fused step (padded) + final path on a spare
    # session fed at 8x realtime
    warm_events: list = []
    wsid = eng.open_session(lambda ev: warm_events.append(ev))
    eng.start_replay(wsid, synth_speech(8.0, seed=999), frame_us=frame_us // 8)
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if any(e["type"] == "final" for e in warm_events):
            break
        await asyncio.sleep(0.5)
    eng.close_session(wsid)
    # wait for the warmup worker to drain and FREE its stream/ring slots —
    # at n_sessions == table width the timed run needs every slot back
    deadline = time.monotonic() + 120
    while not eng.idle() and time.monotonic() < deadline:
        await asyncio.sleep(0.2)
    if not eng.idle():
        # proceeding with held slots reproduces the table-full failure this
        # drain exists to prevent — abort loudly instead of measuring garbage
        raise RuntimeError(
            "warmup session failed to drain within 120 s; stream/ring slots "
            "still held — aborting the timed run"
        )
    print(f"# warmup done ({len(warm_events)} events)", file=sys.stderr, flush=True)

    # -- timed runs: N co-paced sessions each, latencies from replay frame
    # cadence. SK_LAT_REPEATS consecutive runs share the warm engine (one
    # remote-compile warmup amortized across runs) — "robustly under the
    # target" means EVERY consecutive run lands under it, not one lucky run.
    repeats = int(os.environ.get("SK_LAT_REPEATS", "1"))

    async def timed_run(run_idx: int):
        events: dict = {}
        sids = []
        audio = {}
        for i in range(n_sessions):
            events[i] = []
            sid = eng.open_session(
                lambda ev, i=i: events[i].append((eng.pool.now_ns(), ev))
            )
            sids.append(sid)
            audio[i] = synth_speech(seconds, seed=run_idx * 1009 + i)
        dropped0 = eng.pool.dropped()
        t0 = time.monotonic()
        for i, sid in enumerate(sids):
            # shared epoch: all replays start 800 ms from now, frame-aligned
            eng.start_replay(sid, audio[i], frame_us=frame_us, start_delay_us=800_000)
        # wait for replays to finish + VAD hangover to close tail segments
        while eng.pool.active() > 0:
            await asyncio.sleep(1.0)
        await asyncio.sleep(3.0)
        wall = time.monotonic() - t0
        starts = {i: eng.pool.replay_start_ns(sid) for i, sid in enumerate(sids)}
        dropped = eng.pool.dropped() - dropped0
        for sid in sids:
            eng.close_session(sid)
        # drain: the next run needs every stream/ring slot back
        deadline = time.monotonic() + 120
        while not eng.idle() and time.monotonic() < deadline:
            await asyncio.sleep(0.2)
        return events, audio, starts, wall, dropped

    run_results = []
    for r in range(repeats):
        events, audio, starts, wall, dropped = await timed_run(r)
        run_results.append((events, audio, starts, wall, dropped))
        if repeats > 1:
            print(f"# run {r + 1}/{repeats}: wall={wall:.1f}s dropped={dropped}",
                  file=sys.stderr, flush=True)
    batcher_stats = eng.batcher.stats()
    await eng.stop()

    if eng.trace_blocks:
        # stage decomposition (SK_STT_TRACE=1): where a block's latency
        # actually goes — worker-queue wait, gather wait, call, fan-out
        tb = np.asarray(eng.trace_blocks, np.float64)  # sid, arr, deq, sub, ret
        tc = np.asarray(eng.trace_calls, np.float64)  # t_in, batch, t_fetch, t_end

        def pct(x):
            x = np.sort(x)
            return [round(float(x[int(len(x) * q)]) * 1000, 1) for q in (0.5, 0.9)]

        stages = {
            "arr_to_dequeue": pct(tb[:, 2] - tb[:, 1]),
            "dequeue_to_submit": pct(tb[:, 3] - tb[:, 2]),
            "submit_to_return": pct(tb[:, 4] - tb[:, 3]),
            "call_repack_plus_step": pct(tc[:, 2] - tc[:, 0]),
            "call_fetch": pct(tc[:, 3] - tc[:, 2]),
            "call_total": pct(tc[:, 3] - tc[:, 0]),
        }
        print(
            "# trace stages ms [p50, p90]: "
            + json.dumps(stages)
            + f" calls={len(tc)} mean_rows={tc[:, 1].mean():.1f}",
            file=sys.stderr, flush=True,
        )
        np.save("/tmp/stt_trace_blocks.npy", tb)
        np.save("/tmp/stt_trace_calls.npy", tc)

    per_run = []
    for events, audio, starts, wall, dropped in run_results:
        lat_partial: list = []
        lat_final: list = []
        for i, evs in events.items():
            audio_ms = len(audio[i]) / 16.0
            for now_ns, ev in evs:
                if ev["type"] not in ("partial", "final"):
                    continue
                end_ms = min(ev["end_ms"], audio_ms)
                arr_ns = starts[i] + int(end_ms / 20.0) * frame_us * 1000
                (lat_partial if ev["type"] == "partial" else lat_final).append(
                    (now_ns - arr_ns) / 1e6
                )
        lat = sorted(lat_partial + lat_final)
        if not lat:
            print(json.dumps({"error": "no transcripts emitted"}))
            return
        fin = sorted(lat_final)
        per_run.append(
            {
                "p50_ms": round(lat[len(lat) // 2], 1),
                "p90_ms": round(lat[int(len(lat) * 0.9)], 1),
                "final_p50_ms": round(fin[len(fin) // 2], 1) if fin else None,
                "transcripts": len(lat),
                "finals": len(fin),
                "wall_secs": round(wall, 1),
                "dropped_blocks": dropped,
            }
        )
    # headline = median-run p50; every per-run number is recorded so the
    # "all runs under target" claim is checkable from the artifact
    by_p50 = sorted(per_run, key=lambda r: r["p50_ms"])
    med = by_p50[len(by_p50) // 2]
    p50 = med["p50_ms"]
    print(
        json.dumps(
            {
                "metric": f"streaming partial-transcript latency p50, whisper-{model_size}, "
                f"{n_sessions} concurrent realtime sessions (cpp ingest, {final_mode} finals"
                + (f", median of {len(per_run)} consecutive runs)" if len(per_run) > 1 else ")"),
                "value": p50,
                "unit": "ms",
                "p90_ms": med["p90_ms"],
                "worst_run_p50_ms": by_p50[-1]["p50_ms"],
                "worst_run_p90_ms": max(r["p90_ms"] for r in per_run),
                "final_p50_ms": med["final_p50_ms"],
                "runs": per_run,
                "audio_secs": round(seconds, 1),
                "batcher": batcher_stats,
                "vs_baseline": round(300.0 / p50, 2),
            }
        )
    )


async def main():
    from streamkit_tpu.engine.batcher import DeviceBatcher

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/skit-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    model_size = os.environ.get("SK_LAT_MODEL", "large-v3")
    n_sessions = int(os.environ.get("SK_LAT_SESSIONS", "8"))
    seconds = float(os.environ.get("SK_LAT_SECONDS", "30"))

    # finals tolerate latency: a wide gather coalesces segment-final decodes
    # across sessions (each fused final call costs ~200-350 ms of device
    # time — uncoalesced finals alone oversubscribe the chip at 8 sessions)
    os.environ.setdefault("SK_STT_GATHER_MS", "150")
    os.environ.setdefault("SK_STT_PAD_TO", os.environ.get("SK_LAT_SESSIONS", "8"))
    os.environ.setdefault("SK_VAD_PAD_TO", os.environ.get("SK_LAT_SESSIONS", "8"))
    # streaming kinds: small gather window so co-paced sessions coalesce into
    # one padded call (they release early at pad, so aligned sessions don't
    # pay the window)
    os.environ.setdefault("SK_STREAM_GATHER_MS", "30")
    os.environ.setdefault("SK_STREAM_STEPS", "3")
    batcher = DeviceBatcher(tick_ms=float(os.environ.get("SK_LAT_TICK_MS", 5)))
    batcher.start()
    # warmup: compile the batched STT path once before the timed run
    latencies: list = []
    warm: list = []
    await run_session(999, model_size, 8.0, batcher, warm)
    print(f"# warmup session done ({len(warm)} transcripts)", file=sys.stderr, flush=True)

    # pre-compile every (kind, padded-batch) combo the timed phase can hit —
    # a mid-run XLA compile stalls a batch for ~30-60 s and poisons the
    # latency distribution. With SK_STT_PAD_TO/SK_VAD_PAD_TO set this is one
    # program per kind. The helper owns the kind-name formats + slot recipe.
    from streamkit_tpu.nodes.ml.whisper_node import warmup_batched_kinds

    await warmup_batched_kinds(
        batcher, sweep_to=min(n_sessions, 16),
        log=lambda m: print(m, file=sys.stderr, flush=True),
    )
    print("# compile warmup done", file=sys.stderr, flush=True)

    t0 = time.monotonic()
    await asyncio.gather(
        *(run_session(i, model_size, seconds, batcher, latencies) for i in range(n_sessions))
    )
    wall = time.monotonic() - t0
    batcher.stop()

    lat = sorted(latencies)
    if not lat:
        print(json.dumps({"error": "no transcripts emitted"}))
        return
    p50 = lat[len(lat) // 2]
    p90 = lat[int(len(lat) * 0.9)]
    print(
        json.dumps(
            {
                "metric": f"streaming partial-transcript latency p50, whisper-{model_size}, "
                f"{n_sessions} concurrent realtime sessions",
                "value": round(p50, 1),
                "unit": "ms",
                "p90_ms": round(p90, 1),
                "transcripts": len(lat),
                "wall_secs": round(wall, 1),
                "batcher": batcher.stats(),
                "vs_baseline": round(300.0 / p50, 2),  # target: <300ms → >1 is better
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("SK_LAT_INGEST", "cpp") == "cpp":
        asyncio.run(main_cpp())
    else:
        asyncio.run(main())
