# SPDX-License-Identifier: Apache-2.0
"""Whisper weight loading: HF transformers checkpoint → JAX pytree.

The reference loads GGML files via whisper.cpp
(``plugins/native/whisper/src/lib.rs:170-180`` model cache). Here the
interchange format is the HF ``WhisperForConditionalGeneration`` state dict:
works with hub checkpoints on disk and with randomly initialized torch models
(used for logit-parity tests without network access).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

from .config import WhisperConfig

__all__ = ["config_from_hf", "params_from_hf_state_dict", "load_pretrained"]


def config_from_hf(hf_config) -> WhisperConfig:
    return WhisperConfig(
        n_mels=hf_config.num_mel_bins,
        n_audio_ctx=hf_config.max_source_positions,
        n_audio_state=hf_config.d_model,
        n_audio_head=hf_config.encoder_attention_heads,
        n_audio_layer=hf_config.encoder_layers,
        n_vocab=hf_config.vocab_size,
        n_text_ctx=hf_config.max_target_positions,
        n_text_state=hf_config.d_model,
        n_text_head=hf_config.decoder_attention_heads,
        n_text_layer=hf_config.decoder_layers,
    )


def params_from_hf_state_dict(sd: Dict[str, np.ndarray], cfg: WhisperConfig, dtype=jnp.float32):
    """Convert an HF state dict (numpy arrays) to this module's pytree."""

    def t(name):  # tensor
        return jnp.asarray(np.asarray(sd[name]), dtype)

    def lin(prefix, bias=True):
        p = {"w": t(f"{prefix}.weight").T}
        if bias:
            p["b"] = t(f"{prefix}.bias")
        return p

    def ln(prefix):
        return {"g": t(f"{prefix}.weight"), "b": t(f"{prefix}.bias")}

    def attn(prefix, has_k_bias=False):
        return {
            "q": lin(f"{prefix}.q_proj"),
            "k": lin(f"{prefix}.k_proj", bias=has_k_bias),
            "v": lin(f"{prefix}.v_proj"),
            "o": lin(f"{prefix}.out_proj"),
        }

    def enc_layer(i):
        p = f"model.encoder.layers.{i}"
        return {
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "attn": attn(f"{p}.self_attn"),
            "ln2": ln(f"{p}.final_layer_norm"),
            "mlp1": lin(f"{p}.fc1"),
            "mlp2": lin(f"{p}.fc2"),
        }

    def dec_layer(i):
        p = f"model.decoder.layers.{i}"
        return {
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "attn": attn(f"{p}.self_attn"),
            "ln_x": ln(f"{p}.encoder_attn_layer_norm"),
            "xattn": attn(f"{p}.encoder_attn"),
            "ln2": ln(f"{p}.final_layer_norm"),
            "mlp1": lin(f"{p}.fc1"),
            "mlp2": lin(f"{p}.fc2"),
        }

    # HF conv weight layout: [out, in, k] → ours [k, in, out]
    conv1_w = jnp.asarray(np.asarray(sd["model.encoder.conv1.weight"]), dtype).transpose(2, 1, 0)
    conv2_w = jnp.asarray(np.asarray(sd["model.encoder.conv2.weight"]), dtype).transpose(2, 1, 0)
    return {
        "enc": {
            "conv1": {"w": conv1_w, "b": t("model.encoder.conv1.bias")},
            "conv2": {"w": conv2_w, "b": t("model.encoder.conv2.bias")},
            "pos": t("model.encoder.embed_positions.weight"),
            "layers": [enc_layer(i) for i in range(cfg.n_audio_layer)],
            "ln_post": ln("model.encoder.layer_norm"),
        },
        "dec": {
            "tok_emb": t("model.decoder.embed_tokens.weight"),
            "pos_emb": t("model.decoder.embed_positions.weight"),
            "layers": [dec_layer(i) for i in range(cfg.n_text_layer)],
            "ln": ln("model.decoder.layer_norm"),
        },
    }


def load_pretrained(model_path: str, dtype=jnp.bfloat16):
    """Load an HF Whisper checkpoint directory → (config, params).

    Uses torch only for deserialization; weights land on the accelerator as
    the requested dtype (bf16 by default — the MXU-native format).
    """
    import transformers

    hf_cfg = transformers.WhisperConfig.from_pretrained(model_path)
    model = transformers.WhisperForConditionalGeneration.from_pretrained(model_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    cfg = config_from_hf(hf_cfg)
    return cfg, params_from_hf_state_dict(sd, cfg, dtype)
