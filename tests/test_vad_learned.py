# SPDX-License-Identifier: Apache-2.0
"""Learned (Silero-class) VAD tests: state layout parity with the reference
contract (vad.rs:19-60), batched-vs-single equivalence, and segmentation
accuracy on held-out synthesized speech with ground-truth boundaries."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from streamkit_tpu.models import silero_vad as sv
from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "streamkit_tpu",
    "models",
    "weights",
    "vad_synth.npz",
)

needs_weights = pytest.mark.skipif(
    not os.path.exists(WEIGHTS), reason="bundled VAD weights not trained yet"
)


def test_state_layout_matches_reference_contract():
    """Reference Silero wrapper carries RNN state [2, B, 128] + 64-sample
    context (vad.rs:19-60); our state maps onto exactly that."""
    state = sv.init_state((3,))
    assert state.h.shape == (3, 128)
    assert state.c.shape == (3, 128)
    assert state.context.shape == (3, 64)
    assert state.as_silero_layout().shape == (2, 3, 128)
    assert sv.FRAME == 512 and sv.CONTEXT == 64


def test_apply_shapes_and_determinism():
    params = {k: jnp.asarray(v) for k, v in sv.init_params(0).items()}
    frames = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 512)), jnp.float32)
    state = sv.init_state((2,))
    p1, s1 = sv.apply(params, state, frames)
    p2, _ = sv.apply(params, state, frames)
    assert p1.shape == (2, 5)
    assert jnp.all((p1 >= 0) & (p1 <= 1))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_batched_matches_single_row():
    """Slot-table requirement: scoring rows in a batch must equal scoring
    each row alone (no cross-session leakage)."""
    params = {k: jnp.asarray(v) for k, v in sv.init_params(1).items()}
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.standard_normal((4, 6, 512)) * 0.1, jnp.float32)
    batch_probs, batch_state = sv.apply(params, sv.init_state((4,)), frames)
    for i in range(4):
        solo_probs, solo_state = sv.apply(params, sv.init_state(()), frames[i])
        np.testing.assert_allclose(np.asarray(batch_probs[i]), np.asarray(solo_probs), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batch_state.h[i]), np.asarray(solo_state.h), atol=1e-5)


@needs_weights
def test_learned_backend_loads():
    from streamkit_tpu.ops import vad as vad_mod

    params = sv.load_params(WEIGHTS)
    assert set(params) == set(sv.PARAM_SHAPES)


@needs_weights
def test_segmentation_accuracy_on_heldout_speech():
    """Frame accuracy ≥ 0.9 on held-out synthesized speech (seeds unseen in
    training), and every true utterance boundary found within ±4 frames
    (±128 ms) by the thresholded probability track."""
    params = {k: jnp.asarray(v) for k, v in sv.load_params(WEIGHTS).items()}
    frame_s = sv.FRAME / 16000.0
    accs = []
    for seed in (1_000_003, 2_000_039):  # held-out seeds
        audio, plan = synth_speech_with_plan(12.0, 16000, seed=seed)
        n = len(audio) // sv.FRAME
        frames = jnp.asarray(audio[: n * sv.FRAME].reshape(1, n, sv.FRAME))
        probs, _ = sv.apply(params, sv.init_state((1,)), frames)
        probs = np.asarray(probs[0])
        labels = plan.speech_mask(frame_s)[:n]
        pred = probs > 0.5
        accs.append(float((pred == labels).mean()))

        # boundary check: each labelled speech onset has a predicted onset
        # within ±4 frames
        onsets = np.nonzero(np.diff(labels.astype(int)) == 1)[0]
        pred_on = set(np.nonzero(np.diff(pred.astype(int)) == 1)[0])
        pred_on |= {0} if pred[0] else set()
        for onset in onsets:
            assert any(
                abs(onset - p) <= 4 for p in pred_on
            ), f"seed {seed}: onset at frame {onset} missed (pred onsets {sorted(pred_on)})"
    assert min(accs) >= 0.90, accs


@needs_weights
def test_rejects_noise_and_music():
    from streamkit_tpu.utils.speechsynth import synth_music

    params = {k: jnp.asarray(v) for k, v in sv.load_params(WEIGHTS).items()}
    rng = np.random.default_rng(17)
    n = 60
    noise = rng.standard_normal((n * sv.FRAME,)).astype(np.float32) * 0.1
    music = synth_music(n * sv.FRAME / 16000.0 + 0.1, 16000, seed=31)[: n * sv.FRAME]
    for name, sig in (("noise", noise), ("music", music)):
        frames = jnp.asarray(sig.reshape(1, n, sv.FRAME))
        probs, _ = sv.apply(params, sv.init_state((1,)), frames)
        frac = float((np.asarray(probs[0]) > 0.5).mean())
        assert frac < 0.2, f"{name}: {frac:.2f} of frames misclassified as speech"


@needs_weights
def test_ring_table_integration_with_learned_backend():
    """The slot-table VAD path works with the learned state pytree."""
    import importlib

    from streamkit_tpu.ops import vad as vad_mod

    # force a fresh backend resolution with the bundled weights
    vad_mod._BACKEND = None
    vad_mod._LEARNED_APPLY = None
    os.environ.pop("SK_VAD_BACKEND", None)
    assert vad_mod.vad_backend() == "learned"

    from streamkit_tpu.engine.audio_ring import SessionAudioRing

    ring = SessionAudioRing(max_slots=4, ring_samples=1 << 15)
    slot = ring.alloc()
    audio, plan = synth_speech_with_plan(2.0, 16000, seed=5_000_011)
    n = len(audio) // sv.FRAME
    frames = audio[: n * sv.FRAME].reshape(1, n, sv.FRAME)
    probs = ring.vad_append([slot], [0], jnp.asarray(frames))
    assert np.asarray(probs).shape == (1, n)
    labels = plan.speech_mask(sv.FRAME / 16000.0)[:n]
    acc = float(((np.asarray(probs)[0] > 0.5) == labels).mean())
    assert acc >= 0.85, acc
    ring.free(slot)
