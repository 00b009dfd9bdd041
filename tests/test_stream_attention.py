# SPDX-License-Identifier: Apache-2.0
"""Fused int8-history attention kernel (ops/stream_attention.py) vs the
exact XLA formulation it replaces (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from streamkit_tpu.ops.stream_attention import (
    history_attention,
    history_attention_reference,
    supports,
)


def _case(B=4, H=4, c=16, hd=64, T=256, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    i8 = lambda *s: jnp.asarray(rng.integers(-127, 128, s), jnp.int8)  # noqa: E731
    sc = lambda *s: jnp.asarray(rng.uniform(0.001, 0.02, s), jnp.float32)  # noqa: E731
    return dict(
        qs=mk(B, H, c, hd) * 0.3,
        k8=i8(B, H, hd, T), ks=sc(B, H, T),
        v8=i8(B, H, hd, T), vs=sc(B, H, T),
        ck8=i8(B, H, hd, c), cks=sc(B, H, c),
        cv8=i8(B, H, hd, c), cvs=sc(B, H, c),
        op_scale=float(hd**-0.25),
    )


@pytest.mark.parametrize("pos", [[0, 8, 64, 256], [16, 16, 16, 16]])
def test_kernel_matches_reference(pos):
    kw = _case()
    p = jnp.asarray(pos, jnp.int32)
    want = np.asarray(history_attention_reference(**kw, pos=p))
    got = np.asarray(history_attention(**kw, pos=p, interpret=True))
    # random int8 V makes the attend a near-cancellation sum: tolerance is
    # set by the TERM scale (127 * scale), not the output scale
    term = 127 * 0.02
    np.testing.assert_allclose(got, want, atol=2e-3 * term, rtol=0)


def test_kernel_fresh_rows_ignore_history():
    """pos=0 rows attend only to candidates — history contents must not
    leak (the masked-row no-op contract of the fused step)."""
    kw = _case(seed=1)
    p = jnp.zeros((4,), jnp.int32)
    base = np.asarray(history_attention(**kw, pos=p, interpret=True))
    kw2 = dict(kw)
    kw2["k8"] = jnp.full_like(kw["k8"], 99)
    kw2["v8"] = jnp.full_like(kw["v8"], -99)
    other = np.asarray(history_attention(**kw2, pos=p, interpret=True))
    np.testing.assert_array_equal(base, other)


def test_supports_gates():
    assert supports(20, 64, 512, 16)
    assert supports(20, 64, 512, 64)
    assert not supports(20, 64, 64, 16)  # tiny test enc_t: not tileable
    assert not supports(20, 64, 512, 12)
