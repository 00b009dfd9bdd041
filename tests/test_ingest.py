# SPDX-License-Identifier: Apache-2.0
"""Native ingestion shim tests (native/shims/ingest.cpp via engine/ingest.py):
block assembly, multi-session drain coalescing, paced replay cadence, and
backpressure drop-oldest semantics."""

import time

import numpy as np
import pytest

from streamkit_tpu.engine.ingest import IngestPool, ingest_available

needs_lib = pytest.mark.skipif(not ingest_available(), reason="libskit_ingest.so not built")

BLOCK = 4096  # 8 VAD frames x 512 samples = 256 ms @16 kHz


@needs_lib
def test_push_assembles_blocks_in_order():
    pool = IngestPool(4, BLOCK)
    sid = pool.open()
    audio = np.arange(BLOCK * 2 + 100, dtype=np.float32)
    # push in odd-sized chunks; block boundaries must not care
    for off in range(0, audio.size, 777):
        pool.push(sid, audio[off : off + 777])
    ids, arr, blocks = pool.drain()
    assert list(ids) == [sid, sid]
    np.testing.assert_array_equal(blocks[0], audio[:BLOCK])
    np.testing.assert_array_equal(blocks[1], audio[BLOCK : 2 * BLOCK])
    assert pool.pending() == 0  # 100-sample remainder not yet a block
    pool.close()


@needs_lib
def test_multi_session_drain_coalesces():
    pool = IngestPool(8, BLOCK)
    sids = [pool.open() for _ in range(8)]
    for s in sids:
        pool.push(s, np.full(BLOCK, float(s), np.float32))
    ids, arr, blocks = pool.drain()
    assert sorted(ids) == sorted(sids)
    for i, s in enumerate(ids):
        assert blocks[i, 0] == float(s)
    pool.close()


@needs_lib
def test_paced_replay_cadence_and_close():
    """A replay of 3 blocks at 64x realtime must deliver blocks at the paced
    cadence (not all at once) and close the session at end."""
    pool = IngestPool(2, BLOCK)
    sid = pool.open()
    # frame-aligned length covering 3 full blocks (replay pushes whole frames)
    n = ((BLOCK * 3 + 319) // 320) * 320
    audio = np.random.RandomState(0).randn(n).astype(np.float32)
    # 20 ms frames at 1/64 duration => 312 us per 320-sample frame
    pool.start_replay(sid, audio, frame_samples=320, frame_us=312)
    t0 = time.monotonic()
    got = []
    while len(got) < 3 and time.monotonic() - t0 < 5:
        ids, arr, blocks = pool.drain(timeout_us=100_000)
        for i in range(len(ids)):
            got.append((arr[i], blocks[i]))
    assert len(got) == 3
    np.testing.assert_array_equal(got[0][1], audio[:BLOCK])
    np.testing.assert_array_equal(got[2][1], audio[2 * BLOCK : 3 * BLOCK])
    # arrivals spaced ~ one block period (12.8 frames x 312us ~ 4ms)
    gaps = np.diff([g[0] for g in got]) / 1e6  # ms
    assert (gaps > 1.0).all(), gaps
    # close_at_end
    deadline = time.monotonic() + 2
    while pool.active() and time.monotonic() < deadline:
        time.sleep(0.01)
    assert pool.active() == 0
    assert pool.replay_start_ns(sid) > 0
    pool.close()


@needs_lib
def test_queue_backpressure_drops_oldest():
    pool = IngestPool(1, BLOCK, queue_cap=2)
    sid = pool.open()
    for i in range(4):
        pool.push(sid, np.full(BLOCK, float(i), np.float32))
    assert pool.dropped() == 2
    ids, arr, blocks = pool.drain()
    assert len(ids) == 2
    assert blocks[0, 0] == 2.0 and blocks[1, 0] == 3.0  # oldest dropped
    pool.close()


@needs_lib
def test_closed_session_rejects_push():
    pool = IngestPool(1, BLOCK)
    sid = pool.open()
    pool.close_session(sid)
    with pytest.raises(RuntimeError):
        pool.push(sid, np.zeros(10, np.float32))
    # slot is reusable
    assert pool.open() == sid
    pool.close()


@needs_lib
def test_opus_replay_decodes_natively():
    """Opus-packet replay: the C++ thread decodes 20 ms packets straight to
    16 kHz mono and assembles blocks — full-speed mode (frame_us=0) delivers
    the whole stream without pacing. Round-trip sanity: a sine encoded at
    48 kHz must come back at 16 kHz with the right length and non-trivial
    correlation (opus is lossy; exactness is the codec tests' job)."""
    try:
        from streamkit_tpu.nodes.codecs.opus import OpusEncoder

        enc = OpusEncoder(48_000, 1, 64_000)
    except Exception:
        pytest.skip("libopus unavailable")
    sr = 48_000
    seconds = 2.0
    t = np.arange(int(sr * seconds)) / sr
    audio = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    frame = 960  # 20 ms
    packets = [
        enc.encode(audio[i * frame : (i + 1) * frame])
        for i in range(len(audio) // frame)
    ]

    pool = IngestPool(2, BLOCK)
    sid = pool.open()
    pool.start_replay_opus(sid, packets, sample_rate=16_000, channels=1, frame_us=0)
    got = []
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        ids, _arr, blocks = pool.drain(timeout_us=200_000)
        got.extend(blocks[i] for i in range(len(ids)))
        if pool.active() == 0 and pool.pending() == 0:
            break
    pcm = np.concatenate(got) if got else np.zeros(0, np.float32)
    # 2 s at 16 kHz = 32000 samples = 7 full 4096-blocks (+ remainder dropped)
    expected_blocks = int(seconds * 16_000) // BLOCK
    assert len(got) == expected_blocks, (len(got), expected_blocks)
    # decoded energy present (not silence), bounded amplitude
    tail = pcm[8000:]  # skip codec warmup
    assert 0.2 < np.sqrt(np.mean(tail**2)) < 0.6
    pool.close()
