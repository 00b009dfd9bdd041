# SPDX-License-Identifier: Apache-2.0
"""Device audio ring: fused VAD+append, ring decode parity, and the whisper
node's partial-transcript contract (ordering + stale-partial cancellation)."""

import asyncio
import time

import numpy as np
import pytest

import jax.numpy as jnp

from streamkit_tpu.engine.audio_ring import SessionAudioRing, gather_ring_window
from streamkit_tpu.ops.vad import VAD_FRAME, vad_frame_probs, vad_init_state


def _blocks(rng, n_blocks, block_frames):
    return [
        rng.randn(block_frames, VAD_FRAME).astype(np.float32) * 0.1
        for _ in range(n_blocks)
    ]


def test_vad_append_matches_direct_and_stores_audio():
    ring = SessionAudioRing(max_slots=4, ring_samples=1 << 15)
    s0, s1 = ring.alloc(), ring.alloc()
    rng = np.random.RandomState(0)
    blocks0, blocks1 = _blocks(rng, 3, 4), _blocks(rng, 3, 4)

    # direct per-session scoring for comparison — on the int16 wire, which
    # is what vad_append scores (VAD sees exactly the audio the ring stores)
    from streamkit_tpu.engine.audio_ring import pcm_to_wire

    st0, st1 = vad_init_state(), vad_init_state()
    want0, want1 = [], []
    for b in blocks0:
        p, st0 = vad_frame_probs(st0, jnp.asarray(pcm_to_wire(b).astype(np.float32) / 32768.0))
        want0.append(np.asarray(p))
    for b in blocks1:
        p, st1 = vad_frame_probs(st1, jnp.asarray(pcm_to_wire(b).astype(np.float32) / 32768.0))
        want1.append(np.asarray(p))

    pos0 = pos1 = 0
    got0, got1 = [], []
    for b0, b1 in zip(blocks0, blocks1):
        probs = ring.vad_append(
            np.asarray([s0, s1]),
            np.asarray([pos0, pos1]),
            jnp.asarray(np.stack([b0, b1])),
        )
        probs = np.asarray(probs)
        got0.append(probs[0])
        got1.append(probs[1])
        pos0 += b0.size
        pos1 += b1.size

    np.testing.assert_allclose(np.concatenate(got0), np.concatenate(want0), rtol=1e-5)
    np.testing.assert_allclose(np.concatenate(got1), np.concatenate(want1), rtol=1e-5)

    # ring contents = int16-quantized audio
    audio0 = np.concatenate([b.reshape(-1) for b in blocks0])
    got_audio = np.asarray(
        gather_ring_window(
            ring.ring_ref(),
            jnp.asarray([s0], jnp.int32),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([audio0.size], jnp.int32),
            audio0.size,
        )
    )[0]
    want_audio = np.clip(audio0 * 32768.0, -32768, 32767).astype(np.int16) / 32768.0
    np.testing.assert_allclose(got_audio, want_audio.astype(np.float32), atol=1e-6)


def test_ring_wraparound():
    ring_samples = 4 * VAD_FRAME
    ring = SessionAudioRing(max_slots=2, ring_samples=ring_samples)
    slot = ring.alloc()
    rng = np.random.RandomState(1)
    # write 6 frames into a 4-frame ring: the last 4 must survive
    frames = rng.randn(6, VAD_FRAME).astype(np.float32) * 0.1
    pos = 0
    for f in frames:
        ring.vad_append(np.asarray([slot]), np.asarray([pos % ring_samples]), jnp.asarray(f[None, None, :]))
        pos += VAD_FRAME
    start = (2 * VAD_FRAME) % ring_samples
    got = np.asarray(
        gather_ring_window(
            ring.ring_ref(),
            jnp.asarray([slot], jnp.int32),
            jnp.asarray([start], jnp.int32),
            jnp.asarray([4 * VAD_FRAME], jnp.int32),
            4 * VAD_FRAME,
        )
    )[0]
    want = np.clip(frames[2:].reshape(-1) * 32768.0, -32768, 32767).astype(np.int16) / 32768.0
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)


def test_length_mask_zeroes_tail():
    ring = SessionAudioRing(max_slots=2, ring_samples=1 << 12)
    slot = ring.alloc()
    f = np.ones((1, 1, VAD_FRAME), np.float32) * 0.5
    ring.vad_append(np.asarray([slot]), np.asarray([0]), jnp.asarray(f))
    got = np.asarray(
        gather_ring_window(
            ring.ring_ref(),
            jnp.asarray([slot], jnp.int32),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([100], jnp.int32),
            VAD_FRAME,
        )
    )[0]
    assert np.all(got[100:] == 0.0)
    assert np.all(got[:100] != 0.0)


def test_ring_decode_matches_window_decode():
    """transcribe_ring == transcribe_window on the same (quantized) audio."""
    import jax

    from streamkit_tpu.models.whisper import (
        WhisperConfig,
        init_params,
        transcribe_ring,
        transcribe_window,
    )

    cfg = WhisperConfig(
        n_audio_ctx=100,
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_vocab=256,
        n_text_ctx=32,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    window = cfg.n_audio_ctx * 160 * 2  # samples for this context

    rng = np.random.RandomState(2)
    n = window // 2
    audio = (rng.randn(n).astype(np.float32) * 0.1).clip(-1, 1)

    ring = SessionAudioRing(max_slots=2, ring_samples=1 << 16)
    slot = ring.alloc()
    # append in VAD_FRAME blocks (whole frames only, like the node)
    n_frames = n // VAD_FRAME
    ring.vad_append(
        np.asarray([slot]),
        np.asarray([0]),
        jnp.asarray(audio[: n_frames * VAD_FRAME].reshape(1, n_frames, VAD_FRAME)),
    )
    n_written = n_frames * VAD_FRAME

    tokens_r, len_r = transcribe_ring(
        params, cfg, ring.ring_ref(),
        np.asarray([slot]), np.asarray([0]), np.asarray([n_written]),
        window_samples=window, max_tokens=8,
    )

    quant = np.clip(audio[:n_written] * 32768.0, -32768, 32767).astype(np.int16) / 32768.0
    tokens_w, len_w = transcribe_window(
        params, cfg, quant.astype(np.float32), window_samples=window, max_tokens=8,
    )
    assert int(len_r[0]) == int(len_w[0])
    np.testing.assert_array_equal(np.asarray(tokens_r)[0], np.asarray(tokens_w)[0])


# ---------------------------------------------------------------------------
# whisper node through the batcher: partial-transcript contract
# ---------------------------------------------------------------------------
def _speech_audio(secs=4.0, sr=16000):
    """1 s silence, ~1.5 s speech-like utterance, trailing silence (formant
    synth — the learned VAD backend accepts speech, not bare tones)."""
    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    utt, _ = synth_speech_with_plan(
        1.6, sr, seed=42, pause_range=(0.01, 0.02), utt_range=(1.5, 1.55), lead_silence_s=0.0
    )
    x = np.zeros(int(secs * sr), np.float32)
    n = min(len(utt), int(1.5 * sr))
    x[sr : sr + n] = utt[:n]
    return x


def _run_node_with_batcher(node_params, audio, frame_sleep: float = 0.0):
    from streamkit_tpu.core import (
        AudioFormat,
        AudioFrame,
        Channel,
        NodeContext,
        OutputSender,
        Packet,
    )
    from streamkit_tpu.engine.batcher import DeviceBatcher
    from streamkit_tpu.nodes.ml.whisper_node import WhisperNode

    node = WhisperNode(node_params)
    in_ch = Channel(4096)
    out_ch = Channel(4096)
    ctx = NodeContext(
        node_name="stt",
        inputs={"in": in_ch},
        output=OutputSender("stt", direct={"out": out_ch}),
    )

    async def main():
        batcher = DeviceBatcher(tick_ms=1.0)
        batcher.start()
        ctx.batcher = batcher
        task = asyncio.ensure_future(node.run(ctx))
        fmt = AudioFormat(16000, 1)
        frame = 320
        for i in range(len(audio) // frame):
            await in_ch.send(
                Packet.new_audio(AudioFrame(audio[i * frame : (i + 1) * frame], fmt))
            )
            # 0 = full speed (throughput shape); >0 approximates realtime
            # pacing, which the streaming-partial worker needs — a segment
            # consumed faster than the worker can encode it closes before
            # any partial can land (and stale partials are dropped by design)
            await asyncio.sleep(frame_sleep)
        in_ch.close()
        await task
        batcher.stop()
        ctx.output.close()
        out = []
        while True:
            pkt = await out_ch.recv_optional()
            if pkt is None:
                return out
            out.append(pkt)

    return asyncio.run(main())


@pytest.mark.parametrize(
    "streaming,stream_final",
    [(True, False), (True, True), (False, False), (False, True)],
    ids=["streaming", "stream-final", "bucket", "bucket-sfinal-fallback"],
)
def test_partials_order_and_final(monkeypatch, streaming, stream_final):
    """Partials stream while a segment is open; the final lands last and no
    stale partial outsequences it (whisper_node stale-partial cancel).
    Covers both partial paths — incremental streaming (device-resident
    caches) and the bucket re-decode fallback — plus finals served from the
    stream table (final_from_stream)."""
    from streamkit_tpu.models.whisper import WHISPER_CONFIGS, WhisperConfig

    WHISPER_CONFIGS["test-ring-tiny"] = WhisperConfig(
        n_audio_ctx=200,
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_vocab=256,
        n_text_ctx=32,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
    )
    node_params = {
        "model_size": "test-ring-tiny",
        "partial_transcripts": True,
        "partial_interval_ms": 0,
        "window_buckets": [4.0],
        "vad_block_frames": 4,
        "max_tokens": 4,
        "streaming_partials": streaming,
        "final_from_stream": stream_final,
    }
    try:
        # warmup pass compiles the VAD/decode programs (a first-partial
        # compile would otherwise outlast the segment and be stale-cancelled
        # by the final — same reason the latency bench pre-warms shapes)
        _run_node_with_batcher(node_params, _speech_audio())
        if streaming:
            # pre-compile the streaming-table programs directly: inside the
            # node they only run while a segment is open, and a first-call
            # compile outlasts any paced test segment
            import jax
            import jax.numpy as jnp

            from streamkit_tpu.models.whisper import init_params
            from streamkit_tpu.models.whisper.streaming import get_stream_table
            from streamkit_tpu.nodes.ml.whisper_node import _get_audio_ring

            cfg_obj = WHISPER_CONFIGS["test-ring-tiny"]
            params = init_params(cfg_obj, jax.random.PRNGKey(0), jnp.float32)
            tbl = get_stream_table("test-ring-tiny:0:4", cfg_obj, jnp.float32)
            warm_slot = tbl.max_slots - 1  # sessions allocate from the low end
            prefix = np.asarray(
                [cfg_obj.token_sot, cfg_obj.token_language(0),
                 cfg_obj.token_transcribe, cfg_obj.token_no_timestamps], np.int32,
            )
            tbl.reset(warm_slot, prefix)
            pad = 8
            ring = _get_audio_ring()
            tbl.encode_chunks(
                params, ring.ring_ref(), [120] * pad, [warm_slot] * pad, [0] * pad
            )
            tbl.decode_steps(params, [warm_slot] * pad, 4)
            tbl.reset(warm_slot, prefix)
        pkts = _run_node_with_batcher(
            node_params, _speech_audio(), frame_sleep=0.004 if streaming else 0.0
        )
    finally:
        WHISPER_CONFIGS.pop("test-ring-tiny", None)

    trs = [p.transcription for p in pkts if p.transcription is not None]
    assert trs, "no transcripts emitted"
    finals = [t for t in trs if t.is_final]
    partials = [t for t in trs if not t.is_final]
    assert len(finals) == 1, f"expected one final, got {len(finals)}"
    assert partials, "expected at least one partial before the final"
    # the final is the LAST packet for its segment: nothing after it
    final_idx = trs.index(finals[0])
    assert final_idx == len(trs) - 1, "a stale partial landed after the final"
    # sequence numbers are monotonic
    seqs = [p.metadata.sequence for p in pkts if p.transcription is not None]
    assert seqs == sorted(seqs)
