# SPDX-License-Identifier: Apache-2.0
"""Cached translation decode + cross-session batching tests.

The translation nodes now decode with a jitted cached ``lax.while_loop``
(O(T); the eager teacher-forced helper is O(T²) and stays as the parity
oracle), and coalesce texts across sessions through the DeviceBatcher —
including different target languages in one NLLB batch (per-row lang
tokens). Reference: CTranslate2 translates per node, serially
(plugins/native/nllb/src/lib.rs:21-70).
"""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_marian_cached_matches_eager():
    from streamkit_tpu.models.marian import (
        MarianConfig,
        marian_greedy_cached,
        marian_greedy_translate,
        marian_init_params,
    )

    cfg = MarianConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        heads=2, ffn_dim=64, max_positions=64,
        pad_token_id=63, eos_token_id=0, decoder_start_token_id=63,
    )
    params = marian_init_params(cfg, seed=0)
    rng = np.random.RandomState(0)
    src = rng.randint(2, 60, size=(3, 9)).astype(np.int32)
    eager = marian_greedy_translate(params, cfg, jnp.asarray(src), max_len=12)
    toks, lens = marian_greedy_cached(params, cfg, jnp.asarray(src), max_tokens=12)
    toks = np.asarray(toks)
    for r in range(3):
        pred = [t for t in eager[r, 1:] if t != cfg.pad_token_id][:12]
        got = [t for t in toks[r] if t != cfg.pad_token_id]
        assert got == [int(x) for x in pred], (r, got, pred)


def test_nllb_cached_matches_eager():
    from streamkit_tpu.models.nllb import (
        NllbConfig,
        nllb_greedy_cached,
        nllb_greedy_translate,
        nllb_init_params,
    )

    cfg = NllbConfig(
        vocab_size=96, d_model=32, encoder_layers=2, decoder_layers=2,
        heads=2, ffn_dim=64, max_positions=64,
    )
    params = nllb_init_params(cfg, seed=0)
    rng = np.random.RandomState(1)
    src = rng.randint(4, 96, size=(2, 7)).astype(np.int32)
    eager = nllb_greedy_translate(params, cfg, src, target_lang_token=5, max_tokens=10)
    toks, lens = nllb_greedy_cached(params, cfg, jnp.asarray(src), 5, max_tokens=10)
    toks = np.asarray(toks)
    for r in range(2):
        pred = [t for t in eager[r, 2:] if t != cfg.pad_token_id][:10]
        got = [t for t in toks[r] if t != cfg.pad_token_id]
        assert got == [int(x) for x in pred], (r, got, pred)


def test_nllb_padded_batch_matches_unpadded():
    """Pad-to-bucket + batch must not change a row's decode (encoder pad
    masking + cached decode under padding)."""
    from streamkit_tpu.models.nllb import (
        NllbConfig,
        nllb_greedy_cached,
        nllb_init_params,
    )

    cfg = NllbConfig(
        vocab_size=96, d_model=32, encoder_layers=2, decoder_layers=2,
        heads=2, ffn_dim=64, max_positions=64,
    )
    params = nllb_init_params(cfg, seed=0)
    rng = np.random.RandomState(2)
    a = rng.randint(4, 96, size=6).astype(np.int32)
    b = rng.randint(4, 96, size=11).astype(np.int32)
    T = 16
    batch = np.full((2, T), cfg.pad_token_id, np.int32)
    batch[0, : len(a)] = a
    batch[1, : len(b)] = b
    # different target langs share the batch (per-row lang tokens)
    toks_b, _ = nllb_greedy_cached(
        params, cfg, jnp.asarray(batch), jnp.asarray([5, 7], jnp.int32), max_tokens=8
    )
    toks_b = np.asarray(toks_b)
    for row, (ids, lang) in enumerate(((a, 5), (b, 7))):
        one = np.full((1, T), cfg.pad_token_id, np.int32)
        one[0, : len(ids)] = ids
        toks_1, _ = nllb_greedy_cached(
            params, cfg, jnp.asarray(one), jnp.asarray([lang], jnp.int32), max_tokens=8
        )
        assert (np.asarray(toks_1)[0] == toks_b[row]).all()


def test_translate_nodes_coalesce_through_batcher():
    from streamkit_tpu.core import (
        Channel,
        NodeContext,
        OutputSender,
        Packet,
        ResourceManager,
    )
    from streamkit_tpu.engine.batcher import DeviceBatcher
    from streamkit_tpu.nodes.ml.translate_node import TranslateNode

    n_nodes = 4
    text = "the same sentence for every concurrent session"

    async def main():
        batcher = DeviceBatcher(tick_ms=20.0)
        batcher.start()
        resources = ResourceManager()
        outs = [None] * n_nodes

        async def one(i: int):
            node = TranslateNode({"target_lang": "spa_Latn"})
            in_ch = Channel(8)
            out_ch = Channel(64)
            ctx = NodeContext(
                node_name=f"tr{i}",
                inputs={"in": in_ch},
                output=OutputSender(f"tr{i}", direct={"out": out_ch}),
                batcher=batcher,
                resources=resources,
            )
            run_task = asyncio.ensure_future(node.run(ctx))
            await in_ch.send(Packet.new_text(text))
            in_ch.close()
            await run_task
            out_ch.close()
            pkt = await out_ch.recv_optional()
            outs[i] = pkt.text if pkt else None

        await asyncio.gather(*(one(i) for i in range(n_nodes)))
        stats = batcher.stats()
        batcher.stop()
        return outs, stats

    outs, stats = asyncio.run(main())
    assert all(isinstance(o, str) for o in outs)
    assert len(set(outs)) == 1  # identical input -> identical translation
    kinds = [k for k in stats["kinds"] if k.startswith("nllb:")]
    assert kinds, stats
    calls = sum(stats["kinds"][k]["calls"] for k in kinds)
    items = sum(stats["kinds"][k]["items"] for k in kinds)
    assert items == n_nodes and calls < items, stats


def test_beam_search_beam1_equals_greedy_and_beam_improves_score():
    """beam=1 reproduces the cached greedy exactly; beam>1 never scores
    worse than greedy (sum of per-token log-probs of the hypothesis)."""
    from streamkit_tpu.models.marian import (
        MarianConfig,
        marian_beam_translate,
        marian_decode_logits,
        marian_encode,
        marian_greedy_cached,
        marian_init_params,
    )

    cfg = MarianConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        heads=2, ffn_dim=64, max_positions=64,
        pad_token_id=63, eos_token_id=0, decoder_start_token_id=63,
    )
    params = marian_init_params(cfg, seed=0)
    rng = np.random.RandomState(3)
    src = rng.randint(2, 60, size=(2, 9)).astype(np.int32)
    T = 8
    g_toks, g_lens = marian_greedy_cached(params, cfg, jnp.asarray(src), max_tokens=T)
    b1_toks, b1_lens = marian_beam_translate(params, cfg, jnp.asarray(src), max_tokens=T, beam=1)
    assert (np.asarray(g_toks) == np.asarray(b1_toks)).all()
    b4_toks, b4_lens = marian_beam_translate(
        params, cfg, jnp.asarray(src), max_tokens=T, beam=4, length_penalty=0.0
    )

    def hyp_score(toks, n):
        """Teacher-forced sum log-prob of a hypothesis (independent oracle)."""
        dec = np.concatenate([[cfg.decoder_start_token_id], toks[:n]])
        enc, bias = marian_encode(params, cfg, jnp.asarray(src))
        logits = marian_decode_logits(params, cfg, jnp.asarray(dec[None]), enc[:1], bias[:1])
        lp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
        return float(sum(lp[0, i, dec[i + 1]] for i in range(n)))

    for row in range(1):
        n_g = int(g_lens[row])
        n_b = int(b4_lens[row])
        sg = hyp_score(np.asarray(g_toks[row]), n_g)
        sb = hyp_score(np.asarray(b4_toks[row]), n_b)
        assert sb >= sg - 1e-3, (sb, sg)


def test_nllb_beam1_equals_greedy():
    from streamkit_tpu.models.nllb import (
        NllbConfig,
        nllb_beam_translate,
        nllb_greedy_cached,
        nllb_init_params,
    )

    cfg = NllbConfig(
        vocab_size=96, d_model=32, encoder_layers=2, decoder_layers=2,
        heads=2, ffn_dim=64, max_positions=64,
    )
    params = nllb_init_params(cfg, seed=0)
    rng = np.random.RandomState(4)
    src = rng.randint(4, 96, size=(2, 7)).astype(np.int32)
    g, _ = nllb_greedy_cached(params, cfg, jnp.asarray(src), 5, max_tokens=10)
    b, _ = nllb_beam_translate(params, cfg, jnp.asarray(src), 5, max_tokens=10, beam=1)
    assert (np.asarray(g) == np.asarray(b)).all()
