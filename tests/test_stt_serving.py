# SPDX-License-Identifier: Apache-2.0
"""Dense STT serving engine tests (engine/stt_serving.py + native ingest):
multi-session event flow (speech_start → partials → final), stream-final and
exact-final modes, ordered sequence numbers."""

import asyncio
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from streamkit_tpu.engine.ingest import ingest_available

needs_lib = pytest.mark.skipif(not ingest_available(), reason="libskit_ingest.so not built")


def _speech(seconds: float, seed: int) -> np.ndarray:
    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    audio, _ = synth_speech_with_plan(seconds, 16_000, seed=seed)
    return audio.astype(np.float32)


async def _run_engine(final_mode: str, n_sessions: int, seconds: float = 6.0):
    os.environ.setdefault("SK_STREAM_PAD", "4")
    from streamkit_tpu.engine.stt_serving import SttServingEngine

    eng = SttServingEngine(
        model_size="tiny",
        dtype="float32",
        max_sessions=max(4, n_sessions),
        final_mode=final_mode,
        window_buckets=[4.0],
        partial_interval_ms=250.0,
    )
    await eng.start()
    events = {i: [] for i in range(n_sessions)}
    sids = []
    for i in range(n_sessions):
        sid = eng.open_session(lambda ev, i=i: events[i].append(ev))
        sids.append(sid)
    audio = [_speech(seconds, seed=i) for i in range(n_sessions)]
    # push in ~0.5 s chunks faster than realtime (no pacing needed on CPU)
    chunk = 8000
    for off in range(0, int(seconds * 16_000), chunk):
        for i, sid in enumerate(sids):
            eng.push(sid, audio[i][off : off + chunk])
        await asyncio.sleep(0.05)
    # trailing silence closes the last segment via the VAD hangover
    for sid in sids:
        eng.push(sid, np.zeros(16_000, np.float32))
    deadline = asyncio.get_running_loop().time() + 120
    while asyncio.get_running_loop().time() < deadline:
        if all(any(e["type"] == "final" for e in evs) for evs in events.values()):
            break
        await asyncio.sleep(0.2)
    for sid in sids:
        eng.close_session(sid)
    await eng.stop()
    return events


@needs_lib
def test_stream_final_mode_two_sessions():
    events = asyncio.run(_run_engine("stream", 2))
    for i, evs in events.items():
        types = [e["type"] for e in evs]
        assert "speech_start" in types, (i, types)
        finals = [e for e in evs if e["type"] == "final"]
        assert finals, (i, types)
        # ordering: every final follows its speech_start; seqs monotonic
        seqs = [e["seq"] for e in evs if "text" in e]
        assert seqs == sorted(seqs)
        # spans are sane
        for f in finals:
            assert f["end_ms"] > f["start_ms"] >= 0


@needs_lib
def test_exact_final_mode_single_session():
    events = asyncio.run(_run_engine("exact", 1))
    finals = [e for e in events[0] if e["type"] == "final"]
    assert finals
    assert all(isinstance(f["text"], str) for f in finals)


@needs_lib
def test_partials_emitted_in_stream_mode():
    events = asyncio.run(_run_engine("stream", 1, seconds=8.0))
    partials = [e for e in events[0] if e["type"] == "partial"]
    finals = [e for e in events[0] if e["type"] == "final"]
    assert finals
    # an 8 s utterance stream at 250 ms partial cadence must produce partials
    assert partials, [e["type"] for e in events[0]]
