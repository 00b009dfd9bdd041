# SPDX-License-Identifier: Apache-2.0
"""VITS logit/waveform parity vs torch transformers (random weights,
in-process — no network). Mirrors the whisper/nllb parity strategy:
instantiate a tiny HF VitsModel, convert its state dict, compare outputs
with all noise sources zeroed (deterministic synthesis)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from streamkit_tpu.models.vits import (  # noqa: E402
    VitsConfig,
    synthesize,
    text_encoder,
    vits_config_from_hf,
    vits_params_from_hf,
)


def _tiny_hf_config(stochastic: bool):
    return transformers.VitsConfig(
        vocab_size=40,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        window_size=4,
        ffn_dim=64,
        ffn_kernel_size=3,
        flow_size=16,
        spectrogram_bins=65,
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32,
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        prior_encoder_num_flows=2,
        prior_encoder_num_wavenet_layers=2,
        duration_predictor_filter_channels=48,
        duration_predictor_flow_bins=6,
        duration_predictor_num_flows=2,
        depth_separable_channels=2,
        depth_separable_num_layers=2,
        use_stochastic_duration_prediction=stochastic,
        noise_scale=0.0,  # deterministic: prior latents = means
        noise_scale_duration=0.0,  # deterministic: sdp noise zeroed
        speaking_rate=1.0,
    )


def _build(stochastic: bool):
    torch.manual_seed(7)
    hf_cfg = _tiny_hf_config(stochastic)
    model = transformers.VitsModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = vits_config_from_hf(hf_cfg)
    params = vits_params_from_hf(sd, cfg)
    return model, cfg, params


@pytest.mark.parametrize("stochastic", [False, True])
def test_waveform_parity(stochastic):
    model, cfg, params = _build(stochastic)
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 40, size=(1, 13)).astype(np.int64)

    with torch.no_grad():
        out = model(torch.from_numpy(ids))
    ref_wave = out.waveform.numpy()

    with jax.default_matmul_precision("highest"):
        wave, n_valid = synthesize(params, cfg, ids)
    wave = np.asarray(wave)

    assert int(n_valid[0]) == ref_wave.shape[-1]
    got = wave[:, : ref_wave.shape[-1]]
    err = np.max(np.abs(got - ref_wave))
    assert err < 2e-4, f"max waveform error {err} (stochastic={stochastic})"


def test_text_encoder_parity_with_padding():
    """Prior stats match under a padded batch (mask plumbing)."""
    model, cfg, params = _build(False)
    ids = np.array([[5, 9, 3, 17, 2, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0]], np.float32)

    with torch.no_grad():
        enc = model.text_encoder(
            input_ids=torch.from_numpy(ids),
            padding_mask=torch.from_numpy(mask).unsqueeze(-1),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        )
    with jax.default_matmul_precision("highest"):
        hidden, means, log_vars = text_encoder(params, cfg, ids, mask)
    np.testing.assert_allclose(
        np.asarray(hidden) * mask[..., None],
        enc.last_hidden_state.numpy() * mask[..., None],
        atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(means), enc.prior_means.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(log_vars), enc.prior_log_variances.numpy(), atol=2e-5
    )


def test_synthesize_jit_static_shapes():
    """The serving path jits with a fixed max_frames and masks the tail."""
    _, cfg, params = _build(False)
    ids = np.array([[5, 9, 3, 17, 2]], np.int64)

    with jax.default_matmul_precision("highest"):
        fn = jax.jit(lambda p, i: synthesize(p, cfg, i, max_frames=64))
        wave, n_valid = fn(params, ids)
        assert wave.shape == (1, 64 * cfg.hop)
        n = int(n_valid[0])
        assert 0 < n <= 64 * cfg.hop
        # eager (tight) output agrees with the jitted fixed-shape prefix
        # everywhere outside the decoder receptive field of the mask
        # boundary (the padded run sees zero latents there, the tight run
        # sees conv edge padding — last few frames differ by construction)
        wave_dyn, n_dyn = synthesize(params, cfg, ids)
        assert int(n_dyn[0]) == n
        safe = n - 8 * cfg.hop
        np.testing.assert_allclose(
            np.asarray(wave)[:, :safe], np.asarray(wave_dyn)[:, :safe], atol=2e-5
        )
