# SPDX-License-Identifier: Apache-2.0
"""Utilities: checkpointing, shared helpers."""

from .checkpoint import latest_step, load_params, load_train_state, save_params, save_train_state
