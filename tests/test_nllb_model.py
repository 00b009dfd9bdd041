# SPDX-License-Identifier: Apache-2.0
"""NLLB/M2M100 JAX model: logit parity vs torch HF (random weights)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from streamkit_tpu.models.nllb import (
    NllbConfig,
    nllb_config_from_hf,
    nllb_decode_logits,
    nllb_encode,
    nllb_greedy_translate,
    nllb_init_params,
    nllb_params_from_hf,
)

TINY = dict(
    vocab_size=256,
    d_model=64,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.M2M100Config(**TINY)
    torch.manual_seed(0)
    model = transformers.M2M100ForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    cfg = nllb_config_from_hf(hf_cfg)
    params = nllb_params_from_hf(sd, cfg)
    return model, cfg, params


def test_logit_parity_with_padding(hf_pair):
    torch = pytest.importorskip("torch")
    model, cfg, params = hf_pair
    rng = np.random.RandomState(0)
    src = rng.randint(4, cfg.vocab_size, (2, 10)).astype(np.int64)
    src[1, 7:] = cfg.pad_token_id  # ragged batch exercises the pad mask
    dec = rng.randint(4, cfg.vocab_size, (2, 5)).astype(np.int64)
    dec[:, 0] = cfg.decoder_start_token_id

    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(src),
            attention_mask=torch.from_numpy((src != cfg.pad_token_id).astype(np.int64)),
            decoder_input_ids=torch.from_numpy(dec),
        ).logits
    with jax.default_matmul_precision("highest"):
        enc_states, enc_bias = nllb_encode(params, cfg, jnp.asarray(src.astype(np.int32)))
        ours = nllb_decode_logits(
            params, cfg, jnp.asarray(dec.astype(np.int32)), enc_states, enc_bias
        )
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), atol=3e-3)


def test_greedy_translate_mechanics():
    cfg = NllbConfig(
        vocab_size=128, d_model=32, encoder_layers=1, decoder_layers=1,
        heads=2, ffn_dim=64, max_positions=32,
    )
    params = nllb_init_params(cfg, seed=0)
    src = np.array([[5, 6, 7, 8]], np.int32)
    out = nllb_greedy_translate(params, cfg, src, target_lang_token=9, max_tokens=6)
    assert out.shape[0] == 1
    assert out[0, 0] == cfg.decoder_start_token_id
    assert out[0, 1] == 9
    assert out.shape[1] <= 8
