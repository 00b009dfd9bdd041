# SPDX-License-Identifier: Apache-2.0
"""Incremental streaming Whisper (models/whisper/streaming.py): conv-frontend
exactness vs the full encoder, batched-row consistency, and decode
continuation invariance."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from streamkit_tpu.models.whisper.config import WhisperConfig
from streamkit_tpu.models.whisper.model import (
    _dense,
    _layernorm,
    _split_heads,
    init_params,
)
from streamkit_tpu.models.whisper.streaming import (
    CHUNK_SAMPLES,
    RIGHT_CTX,
    StreamTable,
)
from streamkit_tpu.models.whisper.decode import pad_or_trim
from streamkit_tpu.ops.mel import log_mel_spectrogram

CFG = WhisperConfig(
    n_mels=80,
    n_audio_ctx=64,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=256,
    n_text_ctx=32,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)
PREFIX = np.asarray([1, 2, 3, 4], np.int32)

@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(7), jnp.float32)


def _ring_with_audio(n_chunks: int, seed: int = 0):
    """int16 ring row 0 holding quantized noise covering n_chunks + lookahead."""
    rng = np.random.RandomState(seed)
    n = n_chunks * CHUNK_SAMPLES + RIGHT_CTX
    wire = np.clip(rng.randn(n) * 0.2 * 32768.0, -32768, 32767).astype(np.int16)
    ring = jnp.zeros((1, 1 << 14), jnp.int16)
    return ring.at[0, :n].set(jnp.asarray(wire)), wire.astype(np.float32) / 32768.0


def test_chunk_conv_matches_full_encoder(params):
    """The streaming conv frontend (chunk mel + VALID convs over gathered
    ring context) reproduces the full-window encoder's pre-attention
    activations bit-for-bit — checked via the layer-0 K projection cache
    for positions ≥ 2 (the first two positions legitimately differ: the
    full window reflect-pads where streaming reads real ring context)."""
    tbl = StreamTable(CFG, jnp.float32, max_slots=2, enc_t=64, dec_t=32, kv_int8=False)
    n_chunks = 3
    ring, audio = _ring_with_audio(n_chunks)
    tbl.reset(0, PREFIX)
    for k in range(n_chunks):
        tbl.encode_chunks(params, ring, [0], [0], [k * CHUNK_SAMPLES])
    assert int(tbl._enc_pos[0]) == n_chunks * 8

    window = tbl.enc_t * 320
    mel = log_mel_spectrogram(jnp.asarray(pad_or_trim(audio[None], window)), CFG.n_mels)
    e = params["enc"]
    from streamkit_tpu.models.whisper.model import _conv1d

    x = jax.nn.gelu(_conv1d(mel, e["conv1"]["w"], e["conv1"]["b"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, e["conv2"]["w"], e["conv2"]["b"], 2), approximate=False)
    x = x + e["pos"][: x.shape[-2]]
    l0 = e["layers"][0]
    k_want = _split_heads(_dense(_layernorm(x, l0["ln1"]), l0["attn"]["k"]), CFG.n_audio_head)
    # cache is T-major [H, hd, T]
    got = tbl.cache_view("enc_k")[0, 0]
    want = np.asarray(k_want[0])  # [H, T, hd]
    for p in range(2, n_chunks * 8):
        np.testing.assert_allclose(
            got[:, :, p], want[:, p, :], rtol=1e-4, atol=1e-4,
            err_msg=f"enc position {p}",
        )


def test_batched_rows_consistent_and_decode_matches(params):
    """Two slots fed the same audio through ONE batched encode call produce
    identical caches and identical greedy continuations."""
    tbl = StreamTable(CFG, jnp.float32, max_slots=2, enc_t=64, dec_t=32, kv_int8=False)
    ring, _ = _ring_with_audio(3, seed=1)
    tbl.reset(0, PREFIX)
    tbl.reset(1, PREFIX)
    for k in range(3):
        tbl.encode_chunks(params, ring, [0, 0], [0, 1], [k * CHUNK_SAMPLES] * 2)
    np.testing.assert_allclose(
        tbl.cache_view("enc_k")[0], tbl.cache_view("enc_k")[1], rtol=1e-6
    )
    np.testing.assert_allclose(
        tbl.cache_view("xk")[0], tbl.cache_view("xk")[1], rtol=1e-6
    )
    tok0, n0 = tbl.decode_steps(params, [0], 8)
    tok1, n1 = tbl.decode_steps(params, [1], 8)
    assert int(n0[0]) == int(n1[0]) > 4, "decode should append tokens"
    np.testing.assert_array_equal(
        np.asarray(tok0)[0, : int(n0[0])], np.asarray(tok1)[0, : int(n1[0])]
    )


def test_multichunk_encode_matches_single(params):
    """One n_chunks=2 call appends exactly what two consecutive n_chunks=1
    calls append (same caches, same positions)."""
    tbl1 = StreamTable(CFG, jnp.float32, max_slots=1, enc_t=64, dec_t=32, kv_int8=False)
    tbl2 = StreamTable(CFG, jnp.float32, max_slots=1, enc_t=64, dec_t=32, kv_int8=False)
    ring, _ = _ring_with_audio(2, seed=5)
    tbl1.reset(0, PREFIX)
    tbl2.reset(0, PREFIX)
    for k in range(2):
        tbl1.encode_chunks(params, ring, [0], [0], [k * CHUNK_SAMPLES], n_chunks=1)
    tbl2.encode_chunks(params, ring, [0], [0], [0], n_chunks=2)
    assert int(tbl1._enc_pos[0]) == int(tbl2._enc_pos[0]) == 16
    # attention is exactly block-causal in both shapes; the residual
    # tolerance is the documented mel dynamic-range floor (max-8), whose
    # chunk-local max is taken over 19 vs 35 frames (≤ ~2e-3 on activations)
    np.testing.assert_allclose(
        tbl1.cache_view("enc_k")[0], tbl2.cache_view("enc_k")[0], atol=5e-3
    )
    np.testing.assert_allclose(
        tbl1.cache_view("xv")[0], tbl2.cache_view("xv")[0], atol=5e-3
    )


def test_decode_continuation_invariance(params):
    """Decoding 12 steps in one call equals decoding 4 steps three times
    (the continuation re-feed refreshes state identically when no new audio
    arrived in between)."""
    tbl = StreamTable(CFG, jnp.float32, max_slots=2, enc_t=64, dec_t=32, kv_int8=False)
    ring, _ = _ring_with_audio(3, seed=2)
    for sid in (0, 1):
        tbl.reset(sid, PREFIX)
    for k in range(3):
        tbl.encode_chunks(params, ring, [0, 0], [0, 1], [k * CHUNK_SAMPLES] * 2)
    tok_a, n_a = tbl.decode_steps(params, [0], 12)
    for _ in range(3):
        tok_b, n_b = tbl.decode_steps(params, [1], 4)
    assert int(n_a[0]) == int(n_b[0])
    np.testing.assert_array_equal(
        np.asarray(tok_a)[0, : int(n_a[0])], np.asarray(tok_b)[0, : int(n_b[0])]
    )


def test_encode_respects_capacity(params):
    """enc positions past the streaming horizon are the caller's guard; the
    table clamps nothing — verify the documented contract holds at exactly
    full capacity (enc_t multiple of chunk)."""
    tbl = StreamTable(CFG, jnp.float32, max_slots=1, enc_t=16, dec_t=32, kv_int8=False)
    ring, _ = _ring_with_audio(2, seed=3)
    tbl.reset(0, PREFIX)
    for k in range(2):  # exactly fills enc_t=16
        tbl.encode_chunks(params, ring, [0], [0], [k * CHUNK_SAMPLES])
    assert int(tbl._enc_pos[0]) == 16
    tok, n = tbl.decode_steps(params, [0], 6)
    assert int(n[0]) > 4


def _speechy_blocks(n_blocks: int, frames_per_block: int, seed: int):
    """Speech-amplitude noise blocks [n_blocks, frames_per_block, VAD_FRAME]."""
    from streamkit_tpu.ops.vad import VAD_FRAME

    rng = np.random.RandomState(seed)
    return rng.randn(n_blocks, frames_per_block, VAD_FRAME).astype(np.float32) * 0.2


def test_fused_step_matches_separate_calls(params):
    """The fused per-block step (VAD + ring append + commit-guarded encode +
    masked decode) must be row-for-row equivalent to the separate
    vad_append / encode_chunks / decode_steps schedule — including rows that
    commit different chunk counts inside one batched call."""
    from streamkit_tpu.engine.audio_ring import SessionAudioRing
    from streamkit_tpu.models.whisper.streaming import RIGHT_CTX

    rs = 1 << 14
    ring_a = SessionAudioRing(max_slots=2, ring_samples=rs)
    ring_b = SessionAudioRing(max_slots=2, ring_samples=rs)
    tbl_a = StreamTable(CFG, jnp.float32, max_slots=2, enc_t=64, dec_t=32, kv_int8=False)
    tbl_b = StreamTable(CFG, jnp.float32, max_slots=2, enc_t=64, dec_t=32, kv_int8=False)
    for r in (ring_a, ring_b):
        assert r.alloc() == 0 and r.alloc() == 1
    for t in (tbl_a, tbl_b):
        t.reset(0, PREFIX)
        t.reset(1, PREFIX)

    blocks = _speechy_blocks(3, 8, seed=13)  # 3 blocks x 4096 samples
    block_n = blocks.shape[1] * blocks.shape[2]
    written = 0
    tip = [0, 0]  # per-row committed chunk tips (row 1 lags by one chunk)
    probs_a_all, probs_b_all = [], []
    for bi, block in enumerate(blocks):
        avail_after = written + block_n - RIGHT_CTX
        n0 = max(0, min((avail_after - tip[0]) // CHUNK_SAMPLES, 2))
        n1 = max(0, min((avail_after - tip[1]) // CHUNK_SAMPLES, 1))  # lagger
        do_dec = bi == len(blocks) - 1
        probs_a, tok_a, n_a, _ = tbl_a.step(
            params, ring_a, [0, 1], [0, 1],
            [written % rs] * 2, [tip[0] % rs, tip[1] % rs],
            [n0, n1], [do_dec, do_dec],
            np.stack([block, block]), max_steps=6,
        )
        probs_a_all.append(np.asarray(probs_a))
        # reference schedule: append, then per-row encodes, then decode
        probs_b = ring_b.vad_append([0, 1], [written] * 2, np.stack([block, block]))
        probs_b_all.append(np.asarray(probs_b))
        if n0:
            tbl_b.encode_chunks(
                params, ring_b.ring_ref(), [0], [0], [tip[0] % rs], n_chunks=n0
            )
        if n1:
            tbl_b.encode_chunks(
                params, ring_b.ring_ref(), [1], [1], [tip[1] % rs], n_chunks=n1
            )
        if do_dec:
            tok_b, n_b = tbl_b.decode_steps(params, [0, 1], 6)
        tip[0] += n0 * CHUNK_SAMPLES
        tip[1] += n1 * CHUNK_SAMPLES

    # identical VAD probabilities and ring contents
    np.testing.assert_allclose(
        np.concatenate(probs_a_all), np.concatenate(probs_b_all), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(ring_a._ring), np.asarray(ring_b._ring))
    # identical positions; caches equal up to the documented mel
    # dynamic-range-floor tolerance (fused always gathers the 2-chunk
    # window; the reference schedule gathers per-commit windows)
    np.testing.assert_array_equal(
        np.asarray(tbl_a._enc_pos), np.asarray(tbl_b._enc_pos)
    )
    np.testing.assert_allclose(
        tbl_a.cache_view("enc_k"), tbl_b.cache_view("enc_k"), atol=5e-3
    )
    np.testing.assert_allclose(
        tbl_a.cache_view("xv"), tbl_b.cache_view("xv"), atol=5e-3
    )
    # decode advanced identically (greedy argmax is stable at these margins)
    np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_b))
    for row in range(2):
        np.testing.assert_array_equal(
            np.asarray(tok_a)[row, : int(n_a[row])],
            np.asarray(tok_b)[row, : int(n_b[row])],
        )


def test_fused_step_identity_matches_general(params):
    """The identity-packed fused step (B = max_slots, batch row p IS stream
    slot p, inert gap rows on a trash ring slot — the dense-serving
    engine's packing, which compiles the zero-gather path) evolves state
    identically to a general scrambled-order batch of just the active
    rows."""
    from streamkit_tpu.engine.audio_ring import SessionAudioRing
    from streamkit_tpu.models.whisper.streaming import META_PREFIX

    rs = 1 << 14
    S = 4
    active = [0, 1, 3]  # slot 2 is an inert gap; ring slot 4 is trash
    ring_a = SessionAudioRing(max_slots=S + 1, ring_samples=rs)
    ring_b = SessionAudioRing(max_slots=S + 1, ring_samples=rs)
    tbl_a = StreamTable(CFG, jnp.float32, max_slots=S, enc_t=64, dec_t=32, kv_int8=False)
    tbl_b = StreamTable(CFG, jnp.float32, max_slots=S, enc_t=64, dec_t=32, kv_int8=False)
    for r in (ring_a, ring_b):
        for k in range(S + 1):
            assert r.alloc() == k

    blocks = _speechy_blocks(3, 8, seed=31)
    block_n = blocks.shape[1] * blocks.shape[2]
    written = 0
    tip = 0
    probs_a_all, probs_b_all = [], []
    for bi, block in enumerate(blocks):
        n_req = max(0, min((written + block_n - RIGHT_CTX - tip) // CHUNK_SAMPLES, 2))
        do_dec = bi > 0
        do_rst = bi == 0

        def row(slot, nr, dd, rst):
            return np.concatenate(
                [np.asarray([slot, 0, written % rs, tip % rs, nr, dd, rst], np.int32), PREFIX]
            )

        # identity packing: S rows, row p is slot p, gap rows inert on trash
        meta_a = np.zeros((S, 7 + META_PREFIX), np.int32)
        frames_a = np.zeros((S,) + block.shape, np.float32)
        for p in range(S):
            if p in active:
                meta_a[p] = row(p, n_req, int(do_dec), int(do_rst))
                meta_a[p, 1] = p
                frames_a[p] = block
            else:
                meta_a[p] = row(S, 0, 0, 0)  # trash ring slot, fully inert
                meta_a[p, 1] = p
        probs_a, tok_a, n_a, _ = tbl_a.step(
            params, ring_a, meta_a, None, None, None, None, None,
            frames_a, max_steps=4,
        )
        probs_a_all.append(np.asarray(probs_a)[active])

        # general packing: just the active rows, scrambled order
        order = [3, 0, 1]
        probs_b, tok_b, n_b, _ = tbl_b.step(
            params, ring_b, [s for s in order], [s for s in order],
            [written % rs] * 3, [tip % rs] * 3,
            [n_req] * 3, [do_dec] * 3,
            np.stack([block] * 3), max_steps=4,
            do_reset=[do_rst] * 3,
            prefix_b=np.stack([PREFIX] * 3),
        )
        probs_b_all.append(np.asarray(probs_b)[[order.index(s) for s in active]])
        written += block_n
        tip += n_req * CHUNK_SAMPLES

    np.testing.assert_allclose(
        np.concatenate(probs_a_all), np.concatenate(probs_b_all), atol=1e-6
    )
    for s in active:
        np.testing.assert_array_equal(
            np.asarray(ring_a._ring)[s], np.asarray(ring_b._ring)[s]
        )
    np.testing.assert_array_equal(
        np.asarray(tbl_a._enc_pos)[active], np.asarray(tbl_b._enc_pos)[active]
    )
    np.testing.assert_allclose(
        tbl_a.cache_view("enc_k")[active], tbl_b.cache_view("enc_k")[active],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        tbl_a.cache_view("xv")[active], tbl_b.cache_view("xv")[active], atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(tbl_a._n_tok)[active], np.asarray(tbl_b._n_tok)[active]
    )
    np.testing.assert_array_equal(
        np.asarray(tbl_a._tokens)[active], np.asarray(tbl_b._tokens)[active]
    )
    # the inert gap row and its state are untouched
    assert int(tbl_a._enc_pos[2]) == 0 and int(tbl_a._n_tok[2]) == 0


def test_fused_step_masked_rows_untouched(params):
    """Rows with n_req=0/do_dec=False inside a fused batched call keep their
    encoder caches and decode state bit-identical (the commit guard rewrites
    old values; the decode scan masks inactive lanes)."""
    from streamkit_tpu.engine.audio_ring import SessionAudioRing
    from streamkit_tpu.models.whisper.streaming import RIGHT_CTX

    rs = 1 << 14
    ring = SessionAudioRing(max_slots=2, ring_samples=rs)
    tbl = StreamTable(CFG, jnp.float32, max_slots=2, enc_t=64, dec_t=32, kv_int8=False)
    assert ring.alloc() == 0 and ring.alloc() == 1
    tbl.reset(0, PREFIX)
    tbl.reset(1, PREFIX)
    blocks = _speechy_blocks(2, 8, seed=21)
    block_n = blocks.shape[1] * blocks.shape[2]
    # prime both rows with one committed chunk + a decode tick
    tbl.step(
        params, ring, [0, 1], [0, 1], [0] * 2, [0] * 2,
        [1, 1], [True, True], np.stack([blocks[0]] * 2), max_steps=4,
    )
    snap = {
        "ek": tbl.cache_view("enc_k")[1].copy(),
        "pos": int(tbl._enc_pos[1]),
        "tok": np.asarray(tbl._tokens[1]).copy(),
        "n": int(tbl._n_tok[1]),
        "fed": int(tbl._fed[1]),
    }
    # row 0 advances; row 1 rides the batch fully masked
    tbl.step(
        params, ring, [0, 1], [0, 1], [block_n] * 2,
        [CHUNK_SAMPLES % rs] * 2, [1, 0], [True, False],
        np.stack([blocks[1]] * 2), max_steps=4,
    )
    assert int(tbl._enc_pos[1]) == snap["pos"]
    np.testing.assert_array_equal(tbl.cache_view("enc_k")[1], snap["ek"])
    np.testing.assert_array_equal(np.asarray(tbl._tokens[1]), snap["tok"])
    assert int(tbl._n_tok[1]) == snap["n"] and int(tbl._fed[1]) == snap["fed"]


def _dequant_np(cache):
    q8, s = cache
    return np.asarray(q8, np.float32) * np.asarray(s)


def test_int8_table_tracks_f32(params):
    """The int8-KV table's dequantized caches track the f32 table within the
    per-column quantization step (absmax/127 over head_dim), and decode
    still appends tokens."""
    tbl_f = StreamTable(CFG, jnp.float32, max_slots=1, enc_t=64, dec_t=32, kv_int8=False)
    tbl_q = StreamTable(CFG, jnp.float32, max_slots=1, enc_t=64, dec_t=32, kv_int8=True)
    ring, _ = _ring_with_audio(3, seed=9)
    for t in (tbl_f, tbl_q):
        t.reset(0, PREFIX)
        for k in range(3):
            t.encode_chunks(params, ring, [0], [0], [k * CHUNK_SAMPLES])
    assert int(tbl_f._enc_pos[0]) == int(tbl_q._enc_pos[0]) == 24
    ref = tbl_f.cache_view("enc_k")[0]  # [L, H, hd, T]
    got = _dequant_np(tbl_q.cache_view("enc_k"))[0]
    # quant error bound: half a step = absmax/254 per column (+ drift from
    # attention reading quantized history in later chunks)
    step = np.abs(ref).max(axis=2, keepdims=True) / 127.0
    assert np.abs(got - ref).max() <= (step.max() * 4 + 1e-3)
    tok, n = tbl_q.decode_steps(params, [0], 8)
    assert int(n[0]) > 4


def test_int8_batched_rows_bit_identical(params):
    """Quantization is deterministic: two int8 slots fed the same audio in
    one batched call hold bit-identical (q8, scale) caches and decode to
    identical tokens."""
    tbl = StreamTable(CFG, jnp.float32, max_slots=2, enc_t=64, dec_t=32, kv_int8=True)
    ring, _ = _ring_with_audio(3, seed=4)
    tbl.reset(0, PREFIX)
    tbl.reset(1, PREFIX)
    for k in range(3):
        tbl.encode_chunks(params, ring, [0, 0], [0, 1], [k * CHUNK_SAMPLES] * 2)
    q8 = tbl.cache_view("enc_k")[0]
    np.testing.assert_array_equal(q8[0], q8[1])
    xv_q8 = tbl.cache_view("xv")[0]
    np.testing.assert_array_equal(xv_q8[0], xv_q8[1])
    tok0, n0 = tbl.decode_steps(params, [0], 8)
    tok1, n1 = tbl.decode_steps(params, [1], 8)
    assert int(n0[0]) == int(n1[0]) > 4
    np.testing.assert_array_equal(
        np.asarray(tok0)[0, : int(n0[0])], np.asarray(tok1)[0, : int(n1[0])]
    )


def test_int8_fused_step_runs(params):
    """The fused per-block step works against int8 tables (commit guard
    rewrites old (q8, scale) pairs; masked rows stay bit-identical)."""
    from streamkit_tpu.engine.audio_ring import SessionAudioRing

    rs = 1 << 14
    ring = SessionAudioRing(max_slots=2, ring_samples=rs)
    tbl = StreamTable(CFG, jnp.float32, max_slots=2, enc_t=64, dec_t=32, kv_int8=True)
    assert ring.alloc() == 0 and ring.alloc() == 1
    tbl.reset(0, PREFIX)
    tbl.reset(1, PREFIX)
    blocks = _speechy_blocks(2, 8, seed=31)
    block_n = blocks.shape[1] * blocks.shape[2]
    tbl.step(
        params, ring, [0, 1], [0, 1], [0] * 2, [0] * 2,
        [1, 1], [True, True], np.stack([blocks[0]] * 2), max_steps=4,
    )
    snap_q8 = tbl.cache_view("enc_k")[0][1].copy()
    snap_s = tbl.cache_view("enc_k")[1][1].copy()
    pos1 = int(tbl._enc_pos[1])
    tbl.step(
        params, ring, [0, 1], [0, 1], [block_n] * 2,
        [CHUNK_SAMPLES % rs] * 2, [1, 0], [True, False],
        np.stack([blocks[1]] * 2), max_steps=4,
    )
    assert int(tbl._enc_pos[0]) == pos1 + 8  # row 0 advanced
    assert int(tbl._enc_pos[1]) == pos1      # row 1 masked
    np.testing.assert_array_equal(tbl.cache_view("enc_k")[0][1], snap_q8)
    np.testing.assert_array_equal(tbl.cache_view("enc_k")[1][1], snap_s)
