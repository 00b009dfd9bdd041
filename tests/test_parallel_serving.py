# SPDX-License-Identifier: Apache-2.0
"""Sharded serving tests (parallel/serving.py): the fused streaming STT
step — the actual product path — executes on a dp×tp mesh with sharded
weights, KV slots, and audio rings, and matches the single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamkit_tpu.engine.audio_ring import SessionAudioRing
from streamkit_tpu.models.whisper.config import WhisperConfig
from streamkit_tpu.models.whisper.model import init_params
from streamkit_tpu.models.whisper.streaming import CHUNK_SAMPLES, StreamTable
from streamkit_tpu.ops.vad import VAD_FRAME
from streamkit_tpu.parallel import make_mesh
from streamkit_tpu.parallel.serving import shard_serving_state

CFG = WhisperConfig(
    n_mels=80,
    n_audio_ctx=64,
    n_audio_state=64,
    n_audio_head=4,  # divisible by tp=2
    n_audio_layer=2,
    n_vocab=256,
    n_text_ctx=32,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)
PREFIX = np.asarray([1, 2, 3, 4], np.int32)


def _run_steps(params, table, ring, n_rows: int):
    """Drive two fused blocks (reset + encode + decode) on ``n_rows``
    sessions; returns (tokens, n_tok, enc_pos) host arrays."""
    rng = np.random.RandomState(0)
    blocks = rng.randn(2, n_rows, 8, VAD_FRAME).astype(np.float32) * 0.2
    for sid in range(n_rows):
        table.reset(sid, PREFIX)
    block_n = 8 * VAD_FRAME
    rows = list(range(n_rows))
    # block 0: reset + append (no chunks ready yet at RIGHT_CTX lag)
    table.step(
        params, ring, rows, rows, [0] * n_rows, [0] * n_rows,
        [0] * n_rows, [False] * n_rows, blocks[0],
        max_steps=4, do_reset=[True] * n_rows, prefix_b=[PREFIX] * n_rows,
    )
    # block 1: one chunk commits; decode
    n_req = [1] * n_rows
    table.step(
        params, ring, rows, rows, [block_n] * n_rows, [0] * n_rows,
        n_req, [True] * n_rows, blocks[1], max_steps=4,
    )
    return (
        np.asarray(table._tokens[:n_rows]),
        np.asarray(table._n_tok[:n_rows]),
        np.asarray(table._enc_pos[:n_rows]),
    )


@pytest.mark.parametrize(
    "tp,rows_per_shard",
    [(1, 1), (2, 1), (2, 2)],  # (2, 2): B=8 over dp=4 — batched rows per shard
)
def test_fused_step_sharded_matches_single_device(tp, rows_per_shard):
    n_dev = 8
    mesh = make_mesh(n_dev, tp=tp)
    n_rows = (n_dev // tp) * rows_per_shard

    params = init_params(CFG, jax.random.PRNGKey(3), jnp.float32)

    # single-device reference
    ring_ref = SessionAudioRing(max_slots=n_rows, ring_samples=1 << 14)
    tbl_ref = StreamTable(CFG, jnp.float32, max_slots=n_rows, enc_t=64, dec_t=32, kv_int8=False)
    for _ in range(n_rows):
        ring_ref.alloc()
    want = _run_steps(params, tbl_ref, ring_ref, n_rows)

    # sharded run
    ring_sh = SessionAudioRing(max_slots=n_rows, ring_samples=1 << 14)
    tbl_sh = StreamTable(CFG, jnp.float32, max_slots=n_rows, enc_t=64, dec_t=32, kv_int8=False)
    for _ in range(n_rows):
        ring_sh.alloc()
    params_sh = shard_serving_state(mesh, params, table=tbl_sh, ring=ring_sh)
    got = _run_steps(params_sh, tbl_sh, ring_sh, n_rows)

    assert np.array_equal(want[2], got[2])  # enc positions advance identically
    assert np.array_equal(want[1], got[1]), (want[1], got[1])  # token counts
    for r in range(n_rows):
        np.testing.assert_array_equal(want[0][r, : want[1][r]], got[0][r, : got[1][r]])


def test_sharded_int8_table_executes():
    """The int8 (q8, scale) cache tuples shard and execute under the mesh."""
    mesh = make_mesh(8, tp=2)
    n_rows = 4
    params = init_params(CFG, jax.random.PRNGKey(5), jnp.float32)
    ring = SessionAudioRing(max_slots=n_rows, ring_samples=1 << 14)
    tbl = StreamTable(CFG, jnp.float32, max_slots=n_rows, enc_t=64, dec_t=32, kv_int8=True)
    for _ in range(n_rows):
        ring.alloc()
    params = shard_serving_state(mesh, params, table=tbl, ring=ring)
    toks, n_tok, pos = _run_steps(params, tbl, ring, n_rows)
    assert (pos == 8).all()
    assert (n_tok >= len(PREFIX)).all()


def test_serving_engine_on_mesh():
    """SttServingEngine(mesh=...) serves sessions end-to-end with sharded
    weights/tables — full event flow on the 8-CPU mesh."""
    import asyncio
    import os

    from streamkit_tpu.engine.ingest import ingest_available

    if not ingest_available():
        pytest.skip("libskit_ingest.so not built")
    os.environ.setdefault("SK_STREAM_PAD", "4")
    from streamkit_tpu.engine.stt_serving import SttServingEngine
    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    async def main():
        mesh = make_mesh(8, tp=2)
        eng = SttServingEngine(
            model_size="tiny", dtype="float32", max_sessions=4,
            final_mode="stream", mesh=mesh,
        )
        await eng.start()
        events = []
        sid = eng.open_session(events.append)
        audio, _ = synth_speech_with_plan(5.0, 16_000, seed=3)
        eng.push(sid, audio.astype(np.float32))
        eng.push(sid, np.zeros(16_000, np.float32))
        deadline = asyncio.get_running_loop().time() + 120
        while asyncio.get_running_loop().time() < deadline:
            if any(e["type"] == "final" for e in events):
                break
            await asyncio.sleep(0.2)
        eng.close_session(sid)
        await eng.stop()
        return events

    events = asyncio.run(main())
    assert any(e["type"] == "final" for e in events), [e["type"] for e in events]
