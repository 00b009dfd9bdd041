# SPDX-License-Identifier: Apache-2.0
"""Whisper JAX model tests: logit parity vs torch HF implementation (random
weights, no network), KV-cache decode consistency, greedy decode mechanics."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from streamkit_tpu.models.whisper import (
    WhisperConfig,
    config_from_hf,
    decode_logits,
    decode_step,
    encode,
    greedy_decode,
    init_kv_cache,
    init_params,
    params_from_hf_state_dict,
)

TINY = WhisperConfig(
    n_mels=80,
    n_audio_ctx=50,  # 1 s windows keep the test fast
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=32,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def hf_pair():
    """Random-weight HF torch model + converted JAX params."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.WhisperConfig(
        vocab_size=TINY.n_vocab,
        num_mel_bins=TINY.n_mels,
        encoder_layers=TINY.n_audio_layer,
        encoder_attention_heads=TINY.n_audio_head,
        decoder_layers=TINY.n_text_layer,
        decoder_attention_heads=TINY.n_text_head,
        d_model=TINY.n_audio_state,
        max_source_positions=TINY.n_audio_ctx,
        max_target_positions=TINY.n_text_ctx,
        encoder_ffn_dim=4 * TINY.n_audio_state,
        decoder_ffn_dim=4 * TINY.n_text_state,
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(sd, cfg)
    return model, cfg, params


def test_config_from_hf_roundtrip(hf_pair):
    _, cfg, _ = hf_pair
    assert cfg == TINY


def test_encoder_logit_parity(hf_pair):
    torch = pytest.importorskip("torch")
    model, cfg, params = hf_pair
    rng = np.random.RandomState(0)
    mel = rng.randn(2, cfg.n_audio_ctx * 2, cfg.n_mels).astype(np.float32) * 0.5

    with torch.no_grad():
        hf_out = model.model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state
    with jax.default_matmul_precision("highest"):
        ours = encode(params, cfg, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(ours), hf_out.numpy(), atol=2e-4)


def test_decoder_logit_parity(hf_pair):
    torch = pytest.importorskip("torch")
    model, cfg, params = hf_pair
    rng = np.random.RandomState(1)
    mel = rng.randn(1, cfg.n_audio_ctx * 2, cfg.n_mels).astype(np.float32) * 0.5
    tokens = np.array([[cfg.token_sot, 123, 456, 789]], dtype=np.int64)

    with torch.no_grad():
        out = model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits
    with jax.default_matmul_precision("highest"):
        audio_states = encode(params, cfg, jnp.asarray(mel))
        ours = decode_logits(params, cfg, jnp.asarray(tokens.astype(np.int32)), audio_states)
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), atol=3e-3)


def test_kv_cache_matches_full_decode(hf_pair):
    """Incremental decode_step must produce the same logits as the
    teacher-forced full pass."""
    _, cfg, params = hf_pair
    rng = np.random.RandomState(2)
    mel = jnp.asarray(rng.randn(2, cfg.n_audio_ctx * 2, cfg.n_mels).astype(np.float32) * 0.5)
    tokens = jnp.asarray(rng.randint(0, cfg.n_vocab, size=(2, 6)), dtype=jnp.int32)

    with jax.default_matmul_precision("highest"):
        audio_states = encode(params, cfg, mel)
        full = decode_logits(params, cfg, tokens, audio_states)  # [2, 6, vocab]
        cache = init_kv_cache(params, cfg, audio_states, max_len=8)
        step_logits = []
        for i in range(6):
            logits, cache = decode_step(params, cfg, tokens[:, i], cache)
            step_logits.append(np.asarray(logits))
    inc = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full), atol=2e-3)


def test_greedy_decode_shapes_and_determinism():
    cfg = TINY
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    mel = jnp.asarray(rng.randn(2, cfg.n_audio_ctx * 2, cfg.n_mels).astype(np.float32))
    t1, l1 = greedy_decode(params, cfg, mel, max_tokens=16)
    t2, l2 = greedy_decode(params, cfg, mel, max_tokens=16)
    assert t1.shape == (2, 16)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(l1, l2)


def test_greedy_decode_batch_consistency():
    """Row i of a batched decode equals decoding row i alone (batching must
    not change results — the continuous batcher depends on this)."""
    cfg = TINY
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.RandomState(4)
    mel = rng.randn(3, cfg.n_audio_ctx * 2, cfg.n_mels).astype(np.float32)
    tb, lb = greedy_decode(params, cfg, jnp.asarray(mel), max_tokens=12)
    t0, l0 = greedy_decode(params, cfg, jnp.asarray(mel[1:2]), max_tokens=12)
    np.testing.assert_array_equal(tb[1], t0[0])


def test_load_pretrained_from_checkpoint_dir(tmp_path):
    """Full HF checkpoint-dir load path (save_pretrained → load_pretrained),
    including detokenizer vocab pickup."""
    torch = pytest.importorskip("torch")
    import json

    import transformers

    from streamkit_tpu.models.whisper import WhisperDetokenizer, load_pretrained

    hf_cfg = transformers.WhisperConfig(
        vocab_size=TINY.n_vocab,
        num_mel_bins=TINY.n_mels,
        encoder_layers=TINY.n_audio_layer,
        encoder_attention_heads=TINY.n_audio_head,
        decoder_layers=TINY.n_text_layer,
        decoder_attention_heads=TINY.n_text_head,
        d_model=TINY.n_audio_state,
        max_source_positions=TINY.n_audio_ctx,
        max_target_positions=TINY.n_text_ctx,
        encoder_ffn_dim=4 * TINY.n_audio_state,
        decoder_ffn_dim=4 * TINY.n_text_state,
    )
    torch.manual_seed(1)
    model = transformers.WhisperForConditionalGeneration(hf_cfg)
    model.save_pretrained(tmp_path)
    # minimal vocab.json so the detokenizer resolves text
    (tmp_path / "vocab.json").write_text(json.dumps({"hello": 1, "Ġworld": 2}))

    cfg, params = load_pretrained(str(tmp_path), dtype=jnp.float32)
    assert cfg == TINY
    # converted params drive the encoder to parity with the torch model
    rng = np.random.RandomState(7)
    mel = rng.randn(1, cfg.n_audio_ctx * 2, cfg.n_mels).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = model.model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state
    with jax.default_matmul_precision("highest"):
        ours = encode(params, cfg, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)

    detok = WhisperDetokenizer.from_model_dir(str(tmp_path))
    assert detok.decode([1, 2]) == "hello world"


def test_cross_kv_int8_close_to_exact(hf_pair):
    """Per-token int8 cross-KV shifts decode logits by <1% of their range
    and (on this fixture) preserves greedy tokens."""
    _, cfg, params = hf_pair
    rng = np.random.RandomState(5)
    mel = jnp.asarray(rng.randn(2, cfg.n_audio_ctx * 2, cfg.n_mels).astype(np.float32) * 0.5)
    tokens = jnp.asarray(rng.randint(0, cfg.n_vocab, size=(2, 5)), dtype=jnp.int32)
    with jax.default_matmul_precision("highest"):
        audio_states = encode(params, cfg, mel)
        exact = init_kv_cache(params, cfg, audio_states, max_len=8)
        quant = init_kv_cache(params, cfg, audio_states, max_len=8, cross_kv_int8=True)
        assert quant.xk.dtype == jnp.int8 and quant.cross_quantized
        assert not exact.cross_quantized
        for i in range(5):
            le, exact = decode_step(params, cfg, tokens[:, i], exact)
            lq, quant = decode_step(params, cfg, tokens[:, i], quant)
            le, lq = np.asarray(le), np.asarray(lq)
            span = np.abs(le).max()
            assert np.max(np.abs(le - lq)) < 0.01 * span
            np.testing.assert_array_equal(le.argmax(-1), lq.argmax(-1))


def test_greedy_decode_int8_flag():
    """cross_kv_int8 greedy runs end-to-end and matches exact tokens on the
    tiny fixture."""
    cfg = TINY
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(6)
    mel = jnp.asarray(rng.randn(2, cfg.n_audio_ctx * 2, cfg.n_mels).astype(np.float32))
    te, le = greedy_decode(params, cfg, mel, max_tokens=12, cross_kv_int8=False)
    tq, lq = greedy_decode(params, cfg, mel, max_tokens=12, cross_kv_int8=True)
    np.testing.assert_array_equal(te, tq)
    np.testing.assert_array_equal(le, lq)


def test_language_index_full_table():
    """The language-token table covers Whisper's full 99-language block in
    tokenizer order (reference forwards any code to whisper.cpp,
    plugins/native/whisper/src/lib.rs:249-253); unknown codes fall back to
    English."""
    from streamkit_tpu.models.whisper.config import WHISPER_LANGUAGES, language_index

    assert len(WHISPER_LANGUAGES) == 100  # 99 + large-v3's yue
    assert len(set(WHISPER_LANGUAGES)) == 100
    assert language_index("yue") == 99
    # anchors from the original 9-language map (token order is fixed)
    for code, idx in [("en", 0), ("zh", 1), ("de", 2), ("es", 3), ("ru", 4),
                      ("ko", 5), ("fr", 6), ("ja", 7), ("pt", 8), ("tr", 9)]:
        assert language_index(code) == idx, code
    assert language_index("xx") == 0
    assert language_index("") == 0
    assert language_index("SU") == language_index("su")


def test_suppression_biases_change_greedy_choice():
    """suppress_bias removes a token from the argmax everywhere; begin_bias
    only affects the first sampled token (whisper.cpp suppress_blank/nst)."""
    import jax
    import jax.numpy as jnp

    from streamkit_tpu.models.whisper.config import WhisperConfig
    from streamkit_tpu.models.whisper.decode import transcribe_window
    from streamkit_tpu.models.whisper.model import init_params

    cfg = WhisperConfig(
        n_audio_ctx=64, n_audio_state=64, n_audio_head=2, n_audio_layer=1,
        n_vocab=51865, n_text_ctx=32, n_text_state=64, n_text_head=2,
        n_text_layer=1,
    )
    params = init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    audio = rng.randn(1, 16000).astype(np.float32) * 0.1

    base_toks, base_lens = transcribe_window(
        params, cfg, audio, window_samples=16000, max_tokens=6
    )
    first = int(base_toks[0, 0])
    # suppress whatever greedy picked first, everywhere
    bias = np.zeros(cfg.n_vocab, np.float32)
    bias[first] = -1e9
    sup_toks, _ = transcribe_window(
        params, cfg, audio, window_samples=16000, max_tokens=6,
        suppress_bias=jnp.asarray(bias),
    )
    assert int(sup_toks[0, 0]) != first
    assert first not in [int(t) for t in sup_toks[0]]
    # begin-only bias: first token changes, the suppressed id may reappear
    beg_toks, _ = transcribe_window(
        params, cfg, audio, window_samples=16000, max_tokens=6,
        begin_bias=jnp.asarray(bias),
    )
    assert int(beg_toks[0, 0]) != first


def test_tokenizer_non_speech_set_from_vocab(tmp_path):
    """The suppression set derives from a real vocab like openai/whisper."""
    import json

    from streamkit_tpu.models.whisper.tokenizer import WhisperDetokenizer

    # tiny synthetic vocab: GPT-2 byte-level strings (printable ascii maps
    # to itself; space is 'Ġ')
    vocab = {"hello": 0, "(": 1, "[[": 2, "Ġ(": 3, "Ġ-": 4, "Ġ'": 5, "x": 6, "Ġ": 7}
    p = tmp_path / "vocab.json"
    p.write_text(json.dumps(vocab))
    tok = WhisperDetokenizer(str(p))
    nst = tok.non_speech_tokens()
    assert 1 in nst and 2 in nst and 3 in nst  # symbols, both forms
    assert 4 in nst and 5 in nst  # " -" and " '"
    assert 0 not in nst and 6 not in nst
    assert tok.blank_token() == 7
