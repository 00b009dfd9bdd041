# SPDX-License-Identifier: Apache-2.0
"""Marian (Helsinki opus-mt) parity tests vs transformers.MarianMTModel —
logits match on a tiny random-weight config, exercising the architectural
deltas from NLLB (post-LN, fairseq positions, silu, final_logits_bias)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from streamkit_tpu.models.marian import (  # noqa: E402
    MarianConfig,
    marian_config_from_hf,
    marian_decode_logits,
    marian_encode,
    marian_greedy_translate,
    marian_params_from_hf,
)


@pytest.fixture(scope="module")
def tiny_marian():
    hf_cfg = transformers.MarianConfig(
        vocab_size=101,
        d_model=32,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_position_embeddings=64,
        pad_token_id=100,
        eos_token_id=0,
        decoder_start_token_id=100,
        activation_function="swish",
        scale_embedding=True,
        forced_eos_token_id=None,
        share_encoder_decoder_embeddings=True,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    model = transformers.MarianMTModel(hf_cfg).eval()
    # give the logits bias nonzero values so parity actually covers it
    with torch.no_grad():
        model.final_logits_bias.normal_(0, 0.5)
    cfg = marian_config_from_hf(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = marian_params_from_hf(sd, cfg)
    return model, cfg, params


def test_logit_parity(tiny_marian):
    model, cfg, params = tiny_marian
    rng = np.random.default_rng(0)
    src = rng.integers(1, 99, size=(2, 9)).astype(np.int64)
    src[0, -2:] = cfg.pad_token_id  # exercise padding mask
    src[:, -1] = cfg.eos_token_id
    dec = rng.integers(1, 99, size=(2, 5)).astype(np.int64)
    dec[:, 0] = cfg.decoder_start_token_id

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(src),
            attention_mask=torch.tensor((src != cfg.pad_token_id).astype(np.int64)),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()

    enc_states, bias = marian_encode(params, cfg, jnp.asarray(src))
    ours = np.asarray(marian_decode_logits(params, cfg, jnp.asarray(dec), enc_states, bias))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_greedy_translate_matches_hf_generate(tiny_marian):
    model, cfg, params = tiny_marian
    rng = np.random.default_rng(3)
    src = rng.integers(1, 99, size=(2, 7)).astype(np.int64)
    src[:, -1] = cfg.eos_token_id

    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(src),
            attention_mask=torch.ones_like(torch.tensor(src)),
            max_new_tokens=8,
            num_beams=1,
            do_sample=False,
        ).numpy()

    ours = marian_greedy_translate(params, cfg, jnp.asarray(src), max_len=8)
    # compare token-by-token until the first EOS in the reference
    for b in range(src.shape[0]):
        ref_seq = ref[b].tolist()
        our_seq = ours[b].tolist()
        n = min(len(ref_seq), len(our_seq))
        assert our_seq[:n] == ref_seq[:n], f"row {b}: {our_seq[:n]} != {ref_seq[:n]}"


def test_differs_from_nllb_architecture():
    """Guard against silent re-aliasing: the same random seed produces
    different encoders under marian vs nllb math (post-LN vs pre-LN)."""
    from streamkit_tpu.models.marian import marian_init_params
    from streamkit_tpu.models.nllb import NllbConfig, nllb_encode, nllb_init_params

    mcfg = MarianConfig(vocab_size=50, d_model=16, encoder_layers=1, decoder_layers=1,
                        heads=2, ffn_dim=32, max_positions=32, pad_token_id=49,
                        eos_token_id=0, decoder_start_token_id=49)
    ncfg = NllbConfig(vocab_size=50, d_model=16, encoder_layers=1, decoder_layers=1,
                      heads=2, ffn_dim=32, max_positions=32, pad_token_id=1,
                      eos_token_id=0, decoder_start_token_id=1)
    tokens = jnp.asarray(np.arange(6)[None, :] + 1)
    m_out, _ = marian_encode(marian_init_params(mcfg, 0), mcfg, tokens)
    n_out, _ = nllb_encode(nllb_init_params(ncfg, 0), ncfg, tokens)
    assert not np.allclose(np.asarray(m_out), np.asarray(n_out), atol=1e-3)
