# SPDX-License-Identifier: Apache-2.0
"""Sharded Whisper fine-tune step (dp × tp) — the multi-chip compute path.

The media plane stays host/QUIC (SURVEY.md §2.9); multi-chip compute enters
for (a) serving Whisper-large with tensor parallelism and (b) domain
fine-tuning. One jitted ``train_step``: forward (teacher-forced CE loss on
the decoder) → grads → AdamW update, with params/optimizer state laid out by
:func:`whisper_param_sharding` and batches sharded over ``dp``. XLA inserts
the psum/all-reduce collectives implied by the shardings.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.whisper.config import WhisperConfig
from ..models.whisper.model import decode_logits, encode

__all__ = ["TrainState", "make_train_step", "init_train_state"]


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def init_train_state(params, lr: float = 1e-4) -> TrainState:
    opt = make_optimizer(lr)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def loss_fn(params, cfg: WhisperConfig, mel, tokens_in, tokens_out, mask):
    """Teacher-forced cross entropy over the decoder."""
    audio_states = encode(params, cfg, mel)
    logits = decode_logits(params, cfg, tokens_in, audio_states)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tokens_out[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(cfg: WhisperConfig, lr: float = 1e-4):
    """Returns a jittable ``train_step(state, mel, tokens_in, tokens_out, mask)``.

    Jit it with sharding-annotated inputs; donation keeps params/opt-state
    in place in HBM.
    """
    opt = make_optimizer(lr)

    def train_step(state: TrainState, mel, tokens_in, tokens_out, mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, cfg, mel, tokens_in, tokens_out, mask
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step
