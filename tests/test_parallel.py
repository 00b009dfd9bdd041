# SPDX-License-Identifier: Apache-2.0
"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(the driver separately dry-runs __graft_entry__.dryrun_multichip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from streamkit_tpu.models.whisper.config import WhisperConfig
from streamkit_tpu.models.whisper.model import decode_logits, encode, init_params
from streamkit_tpu.parallel import (
    init_train_state,
    make_mesh,
    make_train_step,
    shard_params,
    whisper_param_sharding,
)

TINY = WhisperConfig(
    n_audio_ctx=64,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=512,
    n_text_ctx=16,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


def test_mesh_shapes():
    mesh = make_mesh(8, tp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "tp")
    with pytest.raises(ValueError):
        make_mesh(8, tp=3)


def test_param_sharding_layout():
    mesh = make_mesh(8, tp=2)
    params = init_params(TINY, jax.random.PRNGKey(0))
    shardings = whisper_param_sharding(mesh, params)
    # column-parallel q weight shards dim 1; row-parallel o weight shards dim 0
    q_spec = shardings["enc"]["layers"][0]["attn"]["q"]["w"].spec
    o_spec = shardings["enc"]["layers"][0]["attn"]["o"]["w"].spec
    emb_spec = shardings["dec"]["tok_emb"].spec
    assert q_spec == P(None, "tp")
    assert o_spec == P("tp", None)
    assert emb_spec == P("tp", None)
    # layernorms replicated
    assert shardings["enc"]["ln_post"]["g"].spec == P()


def test_sharded_forward_matches_single_device():
    """TP-sharded forward must equal the unsharded computation."""
    mesh = make_mesh(8, tp=2)
    params = init_params(TINY, jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    mel = rng.randn(4, TINY.n_audio_ctx * 2, TINY.n_mels).astype(np.float32) * 0.3
    tokens = rng.randint(0, TINY.n_vocab, (4, 8)).astype(np.int32)

    def forward(p, mel, tokens):
        return decode_logits(p, TINY, tokens, encode(p, TINY, mel))

    ref = np.asarray(jax.jit(forward)(params, jnp.asarray(mel), jnp.asarray(tokens)))

    sharded = shard_params(mesh, params)
    data = NamedSharding(mesh, P("dp"))
    mel_s = jax.device_put(mel, data)
    tok_s = jax.device_put(tokens, data)
    out = np.asarray(jax.jit(forward)(sharded, mel_s, tok_s))
    np.testing.assert_allclose(out, ref, atol=3e-4)


def test_sharded_train_step_runs_and_descends():
    mesh = make_mesh(8, tp=2)
    params = init_params(TINY, jax.random.PRNGKey(2))
    params = shard_params(mesh, params)
    state = init_train_state(params, lr=1e-3)
    step = jax.jit(make_train_step(TINY, lr=1e-3))
    data = NamedSharding(mesh, P("dp"))
    rng = np.random.RandomState(1)
    mel = jax.device_put(rng.randn(8, TINY.n_audio_ctx * 2, TINY.n_mels).astype(np.float32) * 0.3, data)
    tin = jax.device_put(np.full((8, 8), 5, np.int32), data)
    tout = jax.device_put(np.full((8, 8), 7, np.int32), data)
    mask = jax.device_put(np.ones((8, 8), np.float32), data)

    losses = []
    for _ in range(5):
        state, loss = step(state, mel, tin, tout, mask)
        losses.append(float(np.asarray(loss)))
    assert losses[-1] < losses[0], f"loss did not descend: {losses}"
    assert int(np.asarray(state.step)) == 5


def test_seq2seq_tp_sharded_decode_matches_single_device():
    """NLLB cached greedy decode under tp=2 sharding is token-exact vs the
    unsharded run (Megatron column/row pairing + vocab-sharded tied emb)."""
    from streamkit_tpu.models.nllb import (
        NllbConfig,
        nllb_greedy_cached,
        nllb_init_params,
    )
    from streamkit_tpu.parallel import seq2seq_param_sharding

    cfg = NllbConfig(
        vocab_size=128, d_model=64, encoder_layers=2, decoder_layers=2,
        heads=4, ffn_dim=128, max_positions=64,
    )
    params = nllb_init_params(cfg, seed=0)
    rng = np.random.RandomState(5)
    src = rng.randint(4, 128, size=(4, 9)).astype(np.int32)

    ref_toks, ref_lens = jax.jit(
        lambda p, s: nllb_greedy_cached(p, cfg, s, 5, max_tokens=8)
    )(params, jnp.asarray(src))

    mesh = make_mesh(8, tp=2)
    shardings = seq2seq_param_sharding(mesh, params)
    # layout sanity: q column, o row, emb vocab-sharded, ln replicated
    assert shardings["dec_layers"][0]["attn"]["q"]["w"].spec == P(None, "tp")
    assert shardings["dec_layers"][0]["attn"]["o"]["w"].spec == P("tp", None)
    assert shardings["emb"].spec == P("tp", None)
    assert shardings["enc_ln"]["g"].spec == P()
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
    data = NamedSharding(mesh, P("dp"))
    src_s = jax.device_put(src, data)
    tgt_s = jax.device_put(np.full((4,), 5, np.int32), data)
    toks, lens = jax.jit(
        lambda p, s, t: nllb_greedy_cached(p, cfg, s, t, max_tokens=8)
    )(sharded, src_s, tgt_s)
    assert (np.asarray(toks) == np.asarray(ref_toks)).all()
    assert (np.asarray(lens) == np.asarray(ref_lens)).all()
