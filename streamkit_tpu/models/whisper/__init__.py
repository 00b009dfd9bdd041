# SPDX-License-Identifier: Apache-2.0
"""Pure-JAX Whisper: config, model, HF weight conversion, greedy decode."""

from .config import WHISPER_CONFIGS, WhisperConfig
from .decode import greedy_decode, pad_or_trim, transcribe_ring, transcribe_window
from .load import config_from_hf, load_pretrained, params_from_hf_state_dict
from .model import decode_logits, decode_step, encode, init_kv_cache, init_params
from .tokenizer import WhisperDetokenizer
