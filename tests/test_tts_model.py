# SPDX-License-Identifier: Apache-2.0
"""TTS model tests: HiFi-GAN parity vs HF SpeechT5HifiGan (random weights) +
acoustic model mechanics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamkit_tpu.models.tts import (
    AcousticConfig,
    HifiGanConfig,
    acoustic_generate,
    acoustic_init_params,
    hifigan_generate,
    hifigan_init_params,
    hifigan_params_from_hf,
)

SMALL = HifiGanConfig(
    model_in_dim=20,
    upsample_initial_channel=64,
    upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3), (1, 3)),
)


def test_hifigan_parity_with_hf():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.SpeechT5HifiGanConfig(
        model_in_dim=SMALL.model_in_dim,
        upsample_initial_channel=SMALL.upsample_initial_channel,
        upsample_rates=list(SMALL.upsample_rates),
        upsample_kernel_sizes=list(SMALL.upsample_kernel_sizes),
        resblock_kernel_sizes=list(SMALL.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in SMALL.resblock_dilation_sizes],
        normalize_before=True,
    )
    torch.manual_seed(0)
    model = transformers.SpeechT5HifiGan(hf_cfg).eval()
    # freshly constructed models carry plain (non-weight-normed) weights
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    params = hifigan_params_from_hf(sd, SMALL)

    rng = np.random.RandomState(0)
    mel = rng.randn(40, SMALL.model_in_dim).astype(np.float32)
    with torch.no_grad():
        wav_hf = model(torch.from_numpy(mel)).numpy()
    with jax.default_matmul_precision("highest"):
        wav = np.asarray(hifigan_generate(params, SMALL, jnp.asarray(mel[None])))[0]
    assert wav.shape == wav_hf.shape
    np.testing.assert_allclose(wav, wav_hf, atol=2e-4)


def test_hifigan_upsample_factor():
    params = hifigan_init_params(SMALL, seed=1)
    mel = jnp.zeros((2, 10, SMALL.model_in_dim))
    wav = hifigan_generate(params, SMALL, mel)
    assert wav.shape == (2, 10 * 4 * 4)


def test_acoustic_shapes_and_determinism():
    cfg = AcousticConfig(d_model=64, heads=2, enc_layers=2, dec_layers=2, n_mels=20)
    params = acoustic_init_params(cfg, seed=0)
    tokens = jnp.asarray(np.frombuffer(b"hello world", np.uint8)[None].astype(np.int32))
    mel1 = acoustic_generate(params, cfg, tokens, n_frames=64)
    mel2 = acoustic_generate(params, cfg, tokens, n_frames=64)
    assert mel1.shape == (1, 64, 20)
    np.testing.assert_array_equal(np.asarray(mel1), np.asarray(mel2))


def test_acoustic_batched():
    cfg = AcousticConfig(d_model=64, heads=2, enc_layers=1, dec_layers=1, n_mels=20)
    params = acoustic_init_params(cfg, seed=0)
    tokens = jnp.asarray(np.random.RandomState(0).randint(1, 255, (3, 12)).astype(np.int32))
    mel = acoustic_generate(params, cfg, tokens, n_frames=96)
    assert mel.shape == (3, 96, 20)
    assert np.isfinite(np.asarray(mel)).all()
