# SPDX-License-Identifier: Apache-2.0
"""Checkpoint save/restore tests (orbax), incl. sharded pytrees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamkit_tpu.models.whisper.config import WhisperConfig
from streamkit_tpu.models.whisper.model import init_params
from streamkit_tpu.parallel import init_train_state, make_mesh, shard_params
from streamkit_tpu.utils import latest_step, load_params, save_params

TINY = WhisperConfig(
    n_audio_ctx=16, n_audio_state=64, n_audio_head=2, n_audio_layer=1,
    n_vocab=128, n_text_ctx=8, n_text_state=64, n_text_head=2, n_text_layer=1,
)


def test_params_roundtrip(tmp_path):
    params = init_params(TINY, jax.random.PRNGKey(0))
    path = save_params(str(tmp_path), params, step=3)
    assert latest_step(str(tmp_path)) == 3
    restored = load_params(str(tmp_path), params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_params_roundtrip(tmp_path):
    mesh = make_mesh(8, tp=2)
    params = shard_params(mesh, init_params(TINY, jax.random.PRNGKey(1)))
    save_params(str(tmp_path), params, step=0)
    restored = load_params(str(tmp_path), params)
    leaf = restored["enc"]["layers"][0]["attn"]["q"]["w"]
    assert leaf.sharding.spec == params["enc"]["layers"][0]["attn"]["q"]["w"].sharding.spec
    np.testing.assert_array_equal(
        np.asarray(leaf), np.asarray(params["enc"]["layers"][0]["attn"]["q"]["w"])
    )


def test_missing_checkpoint_raises(tmp_path):
    params = init_params(TINY, jax.random.PRNGKey(0))
    with pytest.raises(FileNotFoundError):
        load_params(str(tmp_path / "nope"), params)
