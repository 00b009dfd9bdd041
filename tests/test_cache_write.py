# SPDX-License-Identifier: Apache-2.0
"""Pallas windowed cache write: bit-exact parity with the select-merge
path it replaces on TPU (ops/cache_write.py vs streaming's
_select_merge_chunks semantics), including ring wrap-around, commit
limits, and inert rows."""

import numpy as np
import pytest

import jax.numpy as jnp

from streamkit_tpu.ops.cache_write import supports, windowed_write


def _oracle(cache, upd, pos, lim):
    ref = cache.copy()
    S, _, T = cache.shape
    for s in range(S):
        for i in range(int(lim[s])):
            ref[s, :, (pos[s] + i) % T] = upd[s, :, i]
    return ref


@pytest.mark.parametrize(
    "S,F,T,c,dtype",
    [
        (4, 256, 512, 16, np.int8),  # enc-cache shape class (int8 KV)
        (3, 128, 256, 16, np.float32),  # scale-cache class
        (2, 128, 128, 8, np.int8),  # single-column-block ring
        (2, 64, 64, 16, np.float32),  # sub-lane T (tiny test configs)
    ],
)
def test_windowed_write_matches_oracle(S, F, T, c, dtype):
    rng = np.random.RandomState(0)
    if dtype == np.int8:
        cache = rng.randint(-127, 128, (S, F, T)).astype(dtype)
        upd = rng.randint(-127, 128, (S, F, c)).astype(dtype)
    else:
        cache = rng.randn(S, F, T).astype(dtype)
        upd = rng.randn(S, F, c).astype(dtype)
    pos = (rng.randint(0, T // 8, (S,)) * 8).astype(np.int32)
    pos[0] = T - 8  # force wrap-around
    lim = rng.randint(0, c + 1, (S,)).astype(np.int32)
    lim[S - 1] = 0  # inert row: cache must round-trip bit-exactly
    assert supports(T, c)
    out = np.asarray(
        windowed_write(
            jnp.asarray(cache), jnp.asarray(upd),
            jnp.asarray(pos), jnp.asarray(lim),
            interpret=True, fb=64,
        )
    )
    np.testing.assert_array_equal(out, _oracle(cache, upd, pos, lim))


def test_supports_contract():
    assert supports(512, 16)
    assert supports(128, 128)
    assert supports(64, 16)  # single sub-lane block
    assert not supports(264, 16)  # T neither lane-tiled nor single-block
    assert not supports(512, 129)  # window wider than two blocks


def test_bf16_roundtrip_exact():
    # the in-kernel one-hot matmul goes bf16 -> f32 -> bf16; values must
    # round-trip bit-exactly (one nonzero product per output column)
    rng = np.random.RandomState(1)
    cache = jnp.asarray(rng.randn(2, 64, 128), jnp.bfloat16)
    upd = jnp.asarray(rng.randn(2, 64, 8), jnp.bfloat16)
    pos = jnp.asarray([120, 0], jnp.int32)  # row 0 wraps
    lim = jnp.asarray([8, 8], jnp.int32)
    out = windowed_write(cache, upd, pos, lim, interpret=True, fb=64)
    ref = _oracle(
        np.asarray(cache, np.float32), np.asarray(upd, np.float32),
        np.asarray(pos), np.asarray(lim),
    )
    np.testing.assert_array_equal(np.asarray(out, np.float32), ref)


def _oracle4(cache, upd, pos, lim):
    ref = cache.copy()
    G, S, _, T = cache.shape
    for s in range(S):
        for i in range(int(lim[s])):
            ref[:, s, :, (pos[s] + i) % T] = upd[:, s, :, i]
    return ref


@pytest.mark.parametrize(
    "G,S,F,T,c,dtype,gb",
    [
        (4, 3, 256, 512, 16, np.int8, 0),  # layer-major enc-cache class
        (4, 2, 64, 512, 16, np.float32, 2),  # explicit group blocking
        (3, 2, 128, 128, 8, np.int8, 0),  # gb auto must divide G=3 -> 3 or 1
        (2, 2, 64, 64, 16, np.float32, 0),  # sub-lane T
    ],
)
def test_windowed_write_groups_matches_oracle(G, S, F, T, c, dtype, gb):
    from streamkit_tpu.ops.cache_write import windowed_write_groups

    rng = np.random.RandomState(0)
    if dtype == np.int8:
        cache = rng.randint(-127, 128, (G, S, F, T)).astype(dtype)
        upd = rng.randint(-127, 128, (G, S, F, c)).astype(dtype)
    else:
        cache = rng.randn(G, S, F, T).astype(dtype)
        upd = rng.randn(G, S, F, c).astype(dtype)
    pos = (rng.randint(0, max(T // 8, 1), (S,)) * 8 % T).astype(np.int32)
    pos[0] = T - 8  # force wrap-around
    lim = rng.randint(0, c + 1, (S,)).astype(np.int32)
    lim[S - 1] = 0  # inert row round-trips bit-exactly
    out = np.asarray(
        windowed_write_groups(
            jnp.asarray(cache), jnp.asarray(upd),
            jnp.asarray(pos), jnp.asarray(lim),
            interpret=True, gb=gb,
        )
    )
    np.testing.assert_array_equal(out, _oracle4(cache, upd, pos, lim))
