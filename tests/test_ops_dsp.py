# SPDX-License-Identifier: Apache-2.0
"""Device DSP op tests: gain/mix/convert parity with the reference's f32 CPU
math, resampler streaming invariants, mel frontend vs torch/scipy reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamkit_tpu.ops import (
    LinearResampler,
    apply_gain,
    convert_channels,
    f32_to_s16le,
    log_mel_spectrogram,
    mel_filterbank,
    mix_frames,
    resample_chunk,
    s16le_to_f32,
    vad_frame_probs,
    vad_init_state,
)
from streamkit_tpu.ops.vad import VAD_FRAME


# ------------------------------------------------------------------- gain/mix
def test_gain_exact_f32():
    x = np.random.RandomState(0).randn(960).astype(np.float32)
    out = np.asarray(apply_gain(jnp.asarray(x), 2.0))
    np.testing.assert_array_equal(out, x * np.float32(2.0))


def test_mix_same_channels_bit_exact():
    rng = np.random.RandomState(1)
    a = rng.randn(1920).astype(np.float32)
    b = rng.randn(1920).astype(np.float32)
    c = rng.randn(1920).astype(np.float32)
    out = np.asarray(mix_frames([jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)], [2, 2, 2], 2, 1920))
    # reference: sequential += into zeroed buffer, left-to-right
    expected = ((np.float32(0) + a) + b) + c
    np.testing.assert_array_equal(out, expected)


def test_mix_mono_to_stereo():
    mono = np.arange(4, dtype=np.float32)
    out = np.asarray(mix_frames([jnp.asarray(mono)], [1], 2, 8))
    np.testing.assert_array_equal(out, np.repeat(mono, 2))


def test_mix_stereo_to_mono_average():
    st = np.array([1.0, 3.0, 5.0, 7.0], dtype=np.float32)  # L,R,L,R
    out = np.asarray(mix_frames([jnp.asarray(st)], [2], 1, 2))
    np.testing.assert_array_equal(out, np.array([(1 + 3) * 0.5, (5 + 7) * 0.5], dtype=np.float32))


def test_mix_short_input_zero_padded():
    a = np.ones(4, dtype=np.float32)
    out = np.asarray(mix_frames([jnp.asarray(a)], [1], 1, 8))
    np.testing.assert_array_equal(out, np.array([1, 1, 1, 1, 0, 0, 0, 0], dtype=np.float32))


def test_convert_generic_cyclic():
    x = np.arange(6, dtype=np.float32)  # 2 frames, 3 channels
    out = np.asarray(convert_channels(jnp.asarray(x), 3, 2))
    np.testing.assert_array_equal(out, np.array([0, 1, 3, 4], dtype=np.float32))


def test_s16_roundtrip():
    s = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    f = np.asarray(s16le_to_f32(jnp.asarray(s)))
    back = np.asarray(f32_to_s16le(jnp.asarray(f)))
    np.testing.assert_array_equal(back, s)
    assert f.max() < 1.0 and f.min() == -1.0


# ------------------------------------------------------------------- resampler
def _stream_resample(x, src, dst, chunk=960, channels=1):
    r = LinearResampler(src, dst, chunk, channels)
    outs = []
    n = (len(x) // (chunk * channels)) * chunk * channels
    for i in range(0, n, chunk * channels):
        outs.append(r.process(x[i : i + chunk * channels]))
    return np.concatenate(outs) if outs else np.zeros(0, np.float32)


def test_resample_ratio_and_continuity_48k_to_16k():
    t = np.arange(48000 * 2, dtype=np.float64) / 48000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = _stream_resample(x, 48000, 16000)
    assert abs(len(y) - len(x) / 3) <= 2
    # downsampled sine must match the ideal 440 Hz sine at 16 kHz closely
    ty = np.arange(len(y), dtype=np.float64) / 16000
    ideal = np.sin(2 * np.pi * 440 * ty).astype(np.float32)
    err = np.abs(y[10:-10] - ideal[10 : len(y) - 10])
    assert err.max() < 0.01


def test_resample_upsample_16k_to_48k():
    t = np.arange(16000, dtype=np.float64) / 16000
    x = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    y = _stream_resample(x, 16000, 48000)
    consumed = (len(x) // 960) * 960
    # streaming latency: the final input sample of each chunk is emitted with
    # the next chunk, so total output trails the exact count by ≤ ratio
    assert abs(len(y) - 3 * consumed) <= 3
    ty = np.arange(len(y), dtype=np.float64) / 48000
    ideal = np.sin(2 * np.pi * 200 * ty).astype(np.float32)
    assert np.abs(y[10:-10] - ideal[10 : len(y) - 10]).max() < 0.01


def test_resample_no_phase_drift_irrational_ratio():
    """Exact rational phase: output count over many chunks equals the exact
    rational expectation (no f64 drift)."""
    r = LinearResampler(44100, 16000, 960, 1)
    total_out = 0
    n_chunks = 500  # ~11 s of audio
    x = np.zeros(960, dtype=np.float32)
    for _ in range(n_chunks):
        total_out += len(r.process(x))
    expected = n_chunks * 960 * 16000 / 44100
    assert abs(total_out - expected) <= 1


def test_host_path_is_pure_numpy(monkeypatch):
    """Regression for the round-3 chip-bench stall: the "host" backend must
    never dispatch to a JAX device (on a remote TPU each fetch costs ~24 ms
    RTT, serialized on the event loop — 128 sessions x 50 chunks/s = total
    stall). Patch every JAX entry point the module could reach to raise."""
    import streamkit_tpu.ops.resample as rs

    def _boom(*a, **k):
        raise AssertionError("host resampler path dispatched to JAX")

    monkeypatch.setattr(rs, "resample_chunk", _boom)
    monkeypatch.setattr(rs.jnp, "asarray", _boom)
    monkeypatch.setattr(rs.jnp, "zeros", _boom)
    monkeypatch.setattr(rs.jnp, "concatenate", _boom)
    r = rs.LinearResampler(48000, 16000, 960, 2)
    x = np.random.RandomState(7).randn(1920).astype(np.float32)
    y1 = r.process(x)
    y2 = r.process(x)
    assert isinstance(y1, np.ndarray) and y1.dtype == np.float32
    assert len(y1) + len(y2) > 0
    assert isinstance(r._phase_num, int)


def test_host_path_matches_device_kernel():
    """Byte-identity between the numpy host path and the jitted device
    kernel, multi-chunk, stereo, at an irrational-ish ratio."""
    rng = np.random.RandomState(11)
    src_rate, dst_rate, chunk, ch = 44100, 16000, 960, 2
    r = LinearResampler(src_rate, dst_rate, chunk, ch)
    g = np.gcd(src_rate, dst_rate)
    src_num, dst_num = src_rate // g, dst_rate // g
    hist = jnp.zeros((ch,), dtype=jnp.float32)
    phase = jnp.asarray(dst_num, dtype=jnp.int32)
    for _ in range(5):
        x = rng.randn(chunk * ch).astype(np.float32)
        host_out = r.process(x)
        dev = jnp.asarray(x).reshape(chunk, ch)
        out, n_valid, phase, hist = resample_chunk(
            hist, dev, phase, src_num, dst_num, r.max_out
        )
        dev_out = np.asarray(out)[: int(n_valid)].reshape(-1)
        np.testing.assert_array_equal(host_out, dev_out)


def test_resample_chunk_batched():
    """Batched kernel: 4 independent sessions in one call."""
    chunk = jnp.asarray(np.random.RandomState(0).randn(4, 960, 1).astype(np.float32))
    hist = jnp.zeros((4, 1), dtype=jnp.float32)
    phase = jnp.full((4,), 1, dtype=jnp.int32)
    out, n_valid, new_phase, new_hist = resample_chunk(hist, chunk, phase, 3, 1, 322)
    assert out.shape == (4, 322, 1)
    assert n_valid.shape == (4,)
    assert new_hist.shape == (4, 1)
    assert np.all(np.asarray(n_valid) == np.asarray(n_valid)[0])


def test_resample_identity_ratio_exact():
    x = np.random.RandomState(2).randn(960 * 3).astype(np.float32)
    y = _stream_resample(x, 48000, 48000)
    # ratio 1: pure gather — bit-exact, one sample still in flight at EOF
    assert len(y) in (len(x), len(x) - 1)
    np.testing.assert_array_equal(y, x[: len(y)])


# ------------------------------------------------------------------- mel
def test_mel_filterbank_matches_librosa_spec():
    fb = mel_filterbank(80)
    assert fb.shape == (80, 201)
    # each filter sums to ~ 2/(bandwidth) — just verify triangles partition
    assert fb.min() >= 0
    # every FFT bin (within range) is covered by some filter
    assert (fb.sum(axis=0)[5:195] > 0).all()


def test_log_mel_whisper_shape_and_range():
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(x), 80))
    assert mel.shape == (100, 80)  # 1 s → 100 frames @ hop 160
    assert mel.max() <= 2.0 and mel.min() >= -2.0  # whisper normalization bounds


def test_log_mel_matches_torch_reference():
    """Parity with the canonical torch/whisper mel implementation."""
    torch = pytest.importorskip("torch")
    sr = 16000
    rng = np.random.RandomState(3)
    x = (rng.randn(sr) * 0.1).astype(np.float32)

    xt = torch.from_numpy(x)
    window = torch.hann_window(400)
    stft = torch.stft(xt, 400, 160, window=window, center=True, pad_mode="reflect", return_complex=True)
    power = stft.abs() ** 2  # [201, frames+1]
    power = power[..., :-1]
    fb = torch.from_numpy(mel_filterbank(80))
    mel = fb @ power
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    expected = ((log_spec + 4.0) / 4.0).numpy().T  # [frames, 80]

    got = np.asarray(log_mel_spectrogram(jnp.asarray(x), 80))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-4)


# ------------------------------------------------------------------- vad
def test_vad_speech_vs_silence():
    from streamkit_tpu.utils.speechsynth import synth_speech_with_plan

    rng = np.random.RandomState(4)
    sr = 16000
    # 1 s silence (tiny noise), then 1 s of synthesized speech
    silence = (rng.randn(sr) * 1e-4).astype(np.float32)
    speech, _ = synth_speech_with_plan(
        1.0, sr, seed=9, pause_range=(0.01, 0.02), utt_range=(0.95, 1.0), lead_silence_s=0.0
    )
    speech = speech[:sr]
    x = np.concatenate([silence, speech])
    n_frames = len(x) // VAD_FRAME
    frames = jnp.asarray(x[: n_frames * VAD_FRAME].reshape(n_frames, VAD_FRAME))
    probs, _ = vad_frame_probs(vad_init_state(), frames)
    probs = np.asarray(probs)
    half = n_frames // 2
    assert probs[5:half].mean() < 0.3, f"silence scored {probs[5:half].mean()}"
    assert probs[half + 5 :].mean() > 0.6, f"speech scored {probs[half+5:].mean()}"


def test_vad_batched_state_shape():
    frames = jnp.zeros((3, 10, VAD_FRAME), dtype=jnp.float32)
    probs, st = vad_frame_probs(vad_init_state((3,)), frames)
    assert probs.shape == (3, 10)
    assert st.context.shape == (3, 64)


# ------------------------------------------------------------------- flash attention
def test_flash_attention_matches_reference():
    """Pallas kernel (interpret mode on CPU) vs XLA attention oracle,
    odd sequence length exercising pad/mask paths."""
    from streamkit_tpu.ops.attention import attention_reference, flash_attention

    rng = np.random.RandomState(0)
    b, h, t, d = 2, 4, 300, 64
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    scale = d ** -0.25
    ref = attention_reference(q, k, v, scale)
    out = flash_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_attention_cross_shapes():
    """Cross-attention shape (Tq != Tkv)."""
    from streamkit_tpu.ops.attention import attention_reference, flash_attention

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 7, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 390, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 390, 64).astype(np.float32))
    ref = attention_reference(q, k, v, 0.125)
    out = flash_attention(q, k, v, 0.125, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
