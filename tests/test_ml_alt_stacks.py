# SPDX-License-Identifier: Apache-2.0
"""Tests for the de-aliased ML stacks: SentencePiece tokenizer, SenseVoice
(SAN-M + CTC), Matcha (flow matching), and their pipeline nodes
(VERDICT r1 item 7: distinct implementations, loud param validation)."""

import asyncio
import os

import numpy as np
import pytest

import jax.numpy as jnp

from streamkit_tpu.models.sp_tokenizer import SentencePieceModel, write_model


# ---------------------------------------------------------------- tokenizer


def test_sp_tokenizer_roundtrip(tmp_path):
    pieces = [
        ("<unk>", 0.0, 2),
        ("</s>", 0.0, 3),
        ("▁hello", -1.0, 1),
        ("▁world", -1.2, 1),
        ("▁he", -3.0, 1),
        ("llo", -3.5, 1),
        ("▁", -4.0, 1),
        ("w", -5.0, 1),
        ("o", -5.0, 1),
        ("r", -5.0, 1),
        ("l", -5.0, 1),
        ("d", -5.0, 1),
    ]
    path = str(tmp_path / "test.model")
    write_model(path, pieces, unk_id=0, eos_id=1)
    sp = SentencePieceModel.load(path)
    assert sp.vocab_size == len(pieces)
    assert sp.unk_id == 0 and sp.eos_id == 1

    ids = sp.encode("hello world")
    # Viterbi must prefer the whole-word pieces over char splits
    assert ids == [2, 3, 1], [sp.pieces[i] for i in ids]
    assert sp.decode(ids) == "hello world"


def test_sp_tokenizer_unknown_chars_fall_back_to_unk(tmp_path):
    pieces = [("<unk>", 0.0, 2), ("</s>", 0.0, 3), ("▁a", -1.0, 1), ("b", -2.0, 1), ("▁", -3.0, 1)]
    path = str(tmp_path / "t.model")
    write_model(path, pieces)
    sp = SentencePieceModel.load(path)
    ids = sp.encode("a bZ", add_eos=False)
    assert sp.unk_id in ids  # 'Z' has no piece
    assert sp.decode(ids) == "a b"  # unk drops, the rest survives


# ---------------------------------------------------------------- sensevoice


def test_sensevoice_logits_shapes_and_batch_parity():
    from streamkit_tpu.models.sensevoice import (
        SenseVoiceConfig,
        sensevoice_init_params,
        sensevoice_logits,
    )

    cfg = SenseVoiceConfig(vocab_size=50, d_model=32, heads=2, ffn_dim=64, layers=2, fsmn_kernel=5)
    params = sensevoice_init_params(cfg, 0)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 36, cfg.n_mels)), jnp.float32)
    t_lfr = (36 + cfg.lfr_n - 1) // cfg.lfr_n
    mask = jnp.ones((2, t_lfr), jnp.float32)
    lang = jnp.asarray([0, 2], jnp.int32)
    itn = jnp.asarray([1, 0], jnp.int32)
    logits = sensevoice_logits(params, cfg, mel, mask, lang, itn)
    assert logits.shape == (2, 2 + t_lfr, cfg.vocab_size)

    # batch row 0 == solo run (no cross-batch leakage through FSMN/attention)
    solo = sensevoice_logits(params, cfg, mel[:1], mask[:1], lang[:1], itn[:1])
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(solo[0]), atol=2e-4)

    # language prefix changes the output (it's a real conditioning input)
    other = sensevoice_logits(params, cfg, mel[:1], mask[:1], jnp.asarray([3]), itn[:1])
    assert not np.allclose(np.asarray(solo), np.asarray(other), atol=1e-3)


def test_ctc_greedy_decode_collapses():
    from streamkit_tpu.models.sensevoice import ctc_greedy_decode

    v = 5
    seq = [0, 1, 1, 0, 2, 2, 2, 0, 1]  # blank=0 → [1, 2, 1]
    logits = np.full((1, len(seq), v), -10.0, np.float32)
    for t, s in enumerate(seq):
        logits[0, t, s] = 10.0
    out = ctc_greedy_decode(logits, np.ones((1, len(seq)), bool), blank_id=0)
    assert out == [[1, 2, 1]]


def test_lfr_stack_shape():
    from streamkit_tpu.models.sensevoice import lfr_stack

    x = jnp.arange(2 * 25 * 4, dtype=jnp.float32).reshape(2, 25, 4)
    y = lfr_stack(x, m=7, n=6)
    assert y.shape == (2, 5, 28)
    # first output frame stacks frames 0..6 of the input
    np.testing.assert_array_equal(np.asarray(y[0, 0, :4]), np.asarray(x[0, 0]))
    np.testing.assert_array_equal(np.asarray(y[0, 0, 24:28]), np.asarray(x[0, 6]))


# ------------------------------------------------------------------- matcha


def test_matcha_synthesize_mel_mechanics():
    from streamkit_tpu.models.matcha import (
        MatchaConfig,
        matcha_init_params,
        matcha_synthesize_mel,
    )

    cfg = MatchaConfig(
        vocab_size=40, d_model=32, heads=2, enc_layers=1, ffn_dim=64,
        dec_channels=32, dec_layers=1, ode_steps=4,
    )
    params = matcha_init_params(cfg, 0)
    tokens = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
    mel, n = matcha_synthesize_mel(params, cfg, tokens, max_frames=64, seed=3)
    assert mel.shape == (1, 64, cfg.n_mels)
    assert 1 <= int(np.asarray(n)[0]) <= 64

    # deterministic given the seed
    mel2, _ = matcha_synthesize_mel(params, cfg, tokens, max_frames=64, seed=3)
    np.testing.assert_array_equal(np.asarray(mel), np.asarray(mel2))

    # length_scale stretches durations
    _, n_slow = matcha_synthesize_mel(
        params, cfg, tokens, max_frames=256, length_scale=2.0, seed=3
    )
    _, n_fast = matcha_synthesize_mel(
        params, cfg, tokens, max_frames=256, length_scale=0.5, seed=3
    )
    assert int(np.asarray(n_slow)[0]) > int(np.asarray(n_fast)[0])


# ----------------------------------------------------------------- pipelines


def _run_text_node(node, text: str):
    from streamkit_tpu.core import Channel, NodeContext, OutputSender, Packet

    async def main():
        in_ch = Channel(16)
        out_ch = Channel(64)
        ctx = NodeContext(
            node_name="n", inputs={"in": in_ch}, output=OutputSender("n", direct={"out": out_ch})
        )
        task = asyncio.ensure_future(node.run(ctx))
        await in_ch.send(Packet.new_text(text))
        in_ch.close()
        await task
        ctx.output.close()
        out = []
        while True:
            pkt = await out_ch.recv_optional()
            if pkt is None:
                return out
            out.append(pkt)

    return asyncio.run(main())


def test_helsinki_node_translates_mechanics():
    from streamkit_tpu.nodes.ml.marian_node import MarianTranslateNode

    node = MarianTranslateNode({"max_tokens": 8})
    out = _run_text_node(node, "hola")
    assert len(out) == 1
    assert out[0].text is not None


def test_matcha_node_synthesizes():
    from streamkit_tpu.nodes.ml.matcha_node import MatchaTtsNode

    node = MatchaTtsNode({"min_sentence_length": 1, "ode_steps": 2})
    out = _run_text_node(node, "hello there")
    assert len(out) == 1
    assert out[0].audio is not None
    assert out[0].audio.samples.shape[0] > 100
    assert float(np.abs(out[0].audio.samples).max()) <= 1.0


def test_sensevoice_node_transcribes_segments():
    from streamkit_tpu.core import (
        AudioFormat,
        AudioFrame,
        Channel,
        NodeContext,
        OutputSender,
        Packet,
    )
    from streamkit_tpu.nodes.ml.sensevoice_node import SenseVoiceNode
    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    audio, _ = synth_speech_with_plan(
        3.0, 16000, seed=77, pause_range=(0.8, 0.9), utt_range=(1.0, 1.2)
    )

    async def main():
        node = SenseVoiceNode({"language": "en", "min_silence_duration_ms": 400})
        in_ch = Channel(512)
        out_ch = Channel(64)
        ctx = NodeContext(
            node_name="sv", inputs={"in": in_ch}, output=OutputSender("sv", direct={"out": out_ch})
        )
        task = asyncio.ensure_future(node.run(ctx))
        fmt = AudioFormat(16000, 1)
        frame = 320
        for i in range(len(audio) // frame):
            await in_ch.send(Packet.new_audio(AudioFrame(audio[i * frame : (i + 1) * frame], fmt)))
        in_ch.close()
        await task
        ctx.output.close()
        out = []
        while True:
            pkt = await out_ch.recv_optional()
            if pkt is None:
                return out
            out.append(pkt)

    out = asyncio.run(main())
    trs = [p.transcription for p in out if p.transcription is not None]
    assert trs, "no transcription segments emitted"
    assert all(t.language == "en" for t in trs)
    assert all(t.segments[0].end_time_ms > t.segments[0].start_time_ms for t in trs)


def test_sensevoice_nodes_coalesce_through_batcher():
    """Concurrent sensevoice sessions share CTC device calls through the
    engine batcher (cross-session batching, nodes/ml/sensevoice_node.py)."""
    from streamkit_tpu.core import (
        AudioFormat,
        AudioFrame,
        Channel,
        NodeContext,
        OutputSender,
        Packet,
        ResourceManager,
    )
    from streamkit_tpu.engine.batcher import DeviceBatcher
    from streamkit_tpu.nodes.ml.sensevoice_node import SenseVoiceNode
    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    audio, _ = synth_speech_with_plan(
        3.0, 16000, seed=77, pause_range=(0.8, 0.9), utt_range=(1.0, 1.2)
    )
    n_nodes = 3

    async def main():
        batcher = DeviceBatcher(tick_ms=20.0)
        batcher.start()
        resources = ResourceManager()
        texts = [[] for _ in range(n_nodes)]

        async def one(i: int):
            node = SenseVoiceNode({"language": "en", "min_silence_duration_ms": 400})
            in_ch = Channel(512)
            out_ch = Channel(64)
            ctx = NodeContext(
                node_name=f"sv{i}",
                inputs={"in": in_ch},
                output=OutputSender(f"sv{i}", direct={"out": out_ch}),
                batcher=batcher,
                resources=resources,
            )
            task = asyncio.ensure_future(node.run(ctx))
            fmt = AudioFormat(16000, 1)
            frame = 320
            for k in range(len(audio) // frame):
                await in_ch.send(
                    Packet.new_audio(AudioFrame(audio[k * frame : (k + 1) * frame], fmt))
                )
                if k % 25 == 0:
                    await asyncio.sleep(0)  # interleave sessions
            in_ch.close()
            await task
            out_ch.close()
            while True:
                pkt = await out_ch.recv_optional()
                if pkt is None:
                    return
                if pkt.transcription is not None:
                    texts[i].append(pkt.transcription.text)

        await asyncio.gather(*(one(i) for i in range(n_nodes)))
        stats = batcher.stats()
        batcher.stop()
        return texts, stats

    texts, stats = asyncio.run(main())
    assert all(t for t in texts), texts
    # identical audio -> identical transcripts across sessions
    assert len({tuple(t) for t in texts}) == 1
    kinds = [k for k in stats["kinds"] if k.startswith("sensevoice:")]
    assert kinds, stats
    calls = sum(stats["kinds"][k]["calls"] for k in kinds)
    items = sum(stats["kinds"][k]["items"] for k in kinds)
    assert calls < items, stats
