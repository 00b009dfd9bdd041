# SPDX-License-Identifier: Apache-2.0
"""Cross-session TTS batching tests.

The TTS node coalesces sentences from concurrent sessions into one
padded+masked VITS call through the DeviceBatcher (nodes/ml/tts_node.py) —
the per-stream reference synthesizes serially per node
(kokoro_node.rs:444-532). Proves: masked batched synthesis is row-exact vs
single-item synthesis, and concurrent nodes actually share device calls.
"""

import asyncio

import numpy as np
import pytest

from streamkit_tpu.models.vits import VitsConfig, synthesize, vits_init_params


def _tiny_cfg() -> VitsConfig:
    return VitsConfig(
        vocab_size=40,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        ffn_dim=64,
        flow_size=16,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        prior_encoder_num_flows=2,
        prior_encoder_num_wavenet_layers=2,
        duration_predictor_filter_channels=48,
        duration_predictor_num_flows=2,
    )


def test_masked_batch_matches_single():
    """Two different-length texts padded into one masked batch produce the
    same waveforms as one-at-a-time synthesis (same frame budget)."""
    import jax

    cfg = _tiny_cfg()
    params = vits_init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    a = rng.randint(1, cfg.vocab_size, size=12).astype(np.int32)
    b = rng.randint(1, cfg.vocab_size, size=7).astype(np.int32)
    T, F = 16, 64

    ids = np.zeros((2, T), np.int32)
    mask = np.zeros((2, T), np.float32)
    ids[0, : len(a)] = a
    mask[0, : len(a)] = 1
    ids[1, : len(b)] = b
    mask[1, : len(b)] = 1
    wave_b, n_b = synthesize(params, cfg, ids, mask=mask, max_frames=F)

    for row, t in ((0, a), (1, b)):
        one = np.zeros((1, T), np.int32)
        m1 = np.zeros((1, T), np.float32)
        one[0, : len(t)] = t
        m1[0, : len(t)] = 1
        wave_1, n_1 = synthesize(params, cfg, one, mask=m1, max_frames=F)
        assert int(n_b[row]) == int(n_1[0])
        n = int(n_1[0])
        np.testing.assert_allclose(
            np.asarray(wave_b[row][:n]), np.asarray(wave_1[0][:n]),
            rtol=2e-4, atol=2e-5,
        )


def test_tts_nodes_coalesce_through_batcher():
    """Concurrent TTS sessions feeding the same sentence share device calls
    (device_calls < submissions) and all emit audio."""
    from streamkit_tpu.core import (
        Channel,
        NodeContext,
        OutputSender,
        Packet,
        ResourceManager,
    )
    from streamkit_tpu.engine.batcher import DeviceBatcher
    from streamkit_tpu.nodes.ml.tts_node import TtsNode

    n_nodes = 4
    sentence = "the same sentence for every concurrent session."

    async def main():
        batcher = DeviceBatcher(tick_ms=20.0)
        batcher.start()
        resources = ResourceManager()
        samples = [0] * n_nodes

        async def one(i: int):
            node = TtsNode({"backend": "vits", "sample_rate": 24000})
            in_ch = Channel(8)
            out_ch = Channel(4096)
            ctx = NodeContext(
                node_name=f"t{i}",
                inputs={"in": in_ch},
                output=OutputSender(f"t{i}", direct={"out": out_ch}),
                batcher=batcher,
                resources=resources,
            )
            run_task = asyncio.ensure_future(node.run(ctx))

            async def drain():
                while True:
                    pkt = await out_ch.recv_optional()
                    if pkt is None:
                        return
                    if pkt.audio is not None:
                        samples[i] += pkt.audio.num_samples

            drain_task = asyncio.ensure_future(drain())
            await in_ch.send(Packet.new_text(sentence + " "))
            in_ch.close()
            await run_task
            out_ch.close()
            await drain_task

        await asyncio.gather(*(one(i) for i in range(n_nodes)))
        stats = batcher.stats()
        batcher.stop()
        return samples, stats

    samples, stats = asyncio.run(main())
    assert all(s > 0 for s in samples)
    kinds = [k for k in stats["kinds"] if k.startswith("tts_vits:")]
    assert kinds, stats
    # the 4 identical sentences must have shared calls: fewer calls than items
    total_calls = sum(stats["kinds"][k]["calls"] for k in kinds)
    total_items = sum(stats["kinds"][k]["items"] for k in kinds)
    assert total_items == n_nodes
    assert total_calls < total_items, stats


def test_matcha_masked_batch_row_exact():
    """Matcha masked batched synthesis matches single-row synthesis (batch
    invariance: shared noise pattern + pad masking in the encoder)."""
    import jax

    from streamkit_tpu.models.matcha import (
        MatchaConfig,
        matcha_init_params,
        matcha_synthesize_mel,
    )
    import jax.numpy as jnp

    cfg = MatchaConfig(
        vocab_size=40, d_model=32, heads=2, enc_layers=2, ffn_dim=64,
        n_mels=20, dec_channels=32, dec_layers=2, spk_dim=16,
        n_speakers=2, ode_steps=2,
    )
    params = matcha_init_params(cfg, 0)
    rng = np.random.RandomState(0)
    a = rng.randint(1, 40, 7).astype(np.int32)
    b = rng.randint(1, 40, 12).astype(np.int32)
    T, F = 16, 64
    ids = np.zeros((2, T), np.int32)
    m = np.zeros((2, T), np.float32)
    ids[0, :7] = a
    m[0, :7] = 1
    ids[1, :12] = b
    m[1, :12] = 1
    mel_b, n_b = matcha_synthesize_mel(params, cfg, jnp.asarray(ids), F, mask=jnp.asarray(m))
    for row, t in ((0, a), (1, b)):
        one = np.zeros((1, T), np.int32)
        m1 = np.zeros((1, T), np.float32)
        one[0, : len(t)] = t
        m1[0, : len(t)] = 1
        mel_1, n_1 = matcha_synthesize_mel(params, cfg, jnp.asarray(one), F, mask=jnp.asarray(m1))
        assert int(n_b[row]) == int(n_1[0])
        np.testing.assert_allclose(
            np.asarray(mel_b[row]), np.asarray(mel_1[0]), rtol=2e-4, atol=2e-5
        )
        # and padded-with-mask == UNPADDED direct run (the batched path must
        # match what synth_sync produces, not just another padded call):
        # conv inputs are masked to zero at pads, so SAME-conv zero padding
        # beyond the boundary equals the masked pad positions
        tight, n_t = matcha_synthesize_mel(
            params, cfg, jnp.asarray(t[None]), F,
            mask=jnp.asarray(np.ones((1, len(t)), np.float32)),
        )
        assert int(n_t[0]) == int(n_1[0])
        np.testing.assert_allclose(
            np.asarray(mel_1[0]), np.asarray(tight[0]), rtol=2e-4, atol=2e-5
        )


def test_kokoro_nodes_coalesce_through_batcher():
    """Kokoro sessions share both duration and core device calls (vmapped
    batch helpers), using the golden sample pack."""
    import os

    golden = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "samples", "kokoro-golden",
    )
    if not os.path.isdir(golden):
        pytest.skip("kokoro golden pack absent")

    from streamkit_tpu.core import (
        Channel,
        NodeContext,
        OutputSender,
        Packet,
        ResourceManager,
    )
    from streamkit_tpu.engine.batcher import DeviceBatcher
    from streamkit_tpu.nodes.ml.tts_node import TtsNode

    n_nodes = 3
    sentence = "the same sentence for every concurrent kokoro session."

    async def main():
        batcher = DeviceBatcher(tick_ms=20.0)
        batcher.start()
        resources = ResourceManager()
        samples = [0] * n_nodes

        async def one(i: int):
            node = TtsNode({"model_path": golden, "backend": "kokoro"})
            in_ch = Channel(8)
            out_ch = Channel(4096)
            ctx = NodeContext(
                node_name=f"k{i}",
                inputs={"in": in_ch},
                output=OutputSender(f"k{i}", direct={"out": out_ch}),
                batcher=batcher,
                resources=resources,
            )
            run_task = asyncio.ensure_future(node.run(ctx))

            async def drain():
                while True:
                    pkt = await out_ch.recv_optional()
                    if pkt is None:
                        return
                    if pkt.audio is not None:
                        samples[i] += pkt.audio.num_samples

            drain_task = asyncio.ensure_future(drain())
            await in_ch.send(Packet.new_text(sentence + " "))
            in_ch.close()
            await run_task
            out_ch.close()
            await drain_task

        await asyncio.gather(*(one(i) for i in range(n_nodes)))
        stats = batcher.stats()
        batcher.stop()
        return samples, stats

    samples, stats = asyncio.run(main())
    assert all(s > 0 for s in samples)
    assert len(set(samples)) == 1  # identical input -> identical audio length
    for prefix in ("kokoro_dur:", "kokoro_core:"):
        kinds = [k for k in stats["kinds"] if k.startswith(prefix)]
        assert kinds, (prefix, stats)
        calls = sum(stats["kinds"][k]["calls"] for k in kinds)
        items = sum(stats["kinds"][k]["items"] for k in kinds)
        assert items == n_nodes and calls < items, (prefix, stats)
