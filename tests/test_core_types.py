# SPDX-License-Identifier: Apache-2.0
"""Core type-system tests (parity targets: reference core/src/types.rs doctests,
packet_meta.rs compatibility matrix)."""

import numpy as np
import pytest

from streamkit_tpu.core import (
    AudioFormat,
    AudioFrame,
    CustomPacketData,
    Packet,
    PacketMetadata,
    PacketType,
    SampleFormat,
    can_connect,
    can_connect_any,
)


def test_audio_frame_duration():
    fmt = AudioFormat(48000, 2)
    frame = AudioFrame(np.zeros(960 * 2, dtype=np.float32), fmt)
    assert frame.frames_per_channel == 960
    assert frame.duration_us() == 20_000


def test_audio_frame_clone_shares_buffer():
    fmt = AudioFormat(48000, 1)
    buf = np.arange(480, dtype=np.float32)
    a = AudioFrame(buf, fmt)
    b = a.clone()
    assert np.shares_memory(a.samples, b.samples)
    # COW: mutating the clone must not affect the original
    m = b.make_samples_mut()
    m[0] = 99.0
    assert a.samples[0] == 0.0
    assert b.samples[0] == 99.0


def test_audio_frame_samples_readonly():
    frame = AudioFrame(np.zeros(4, dtype=np.float32), AudioFormat(48000, 1))
    with pytest.raises(ValueError):
        frame.samples[0] = 1.0


def test_packet_constructors_and_type():
    fmt = AudioFormat(16000, 1)
    p = Packet.new_audio(AudioFrame(np.zeros(160, np.float32), fmt))
    assert p.packet_type() == PacketType.raw_audio(fmt)
    assert Packet.new_text("hi").packet_type() == PacketType.text()
    c = Packet.new_custom(CustomPacketData("ns::x/y@1", {"a": 1}))
    assert c.packet_type().type_id == "ns::x/y@1"
    b = Packet.new_binary(b"abc", content_type="audio/ogg")
    assert b.packet_type() == PacketType.binary()


def test_can_connect_matrix():
    # Any matches everything
    assert can_connect(PacketType.any(), PacketType.opus_audio())
    assert can_connect(PacketType.binary(), PacketType.any())
    # different kinds never match
    assert not can_connect(PacketType.text(), PacketType.binary())
    assert not can_connect(PacketType.opus_audio(), PacketType.raw_audio())
    # exact kinds match
    assert can_connect(PacketType.transcription(), PacketType.transcription())


def test_raw_audio_wildcards():
    exact = PacketType.raw_audio(AudioFormat(48000, 2))
    any_rate = PacketType.raw_audio(AudioFormat(0, 2))
    any_all = PacketType.raw_audio(AudioFormat(0, 0))
    absent = PacketType.raw_audio()
    other = PacketType.raw_audio(AudioFormat(16000, 2))

    assert can_connect(exact, any_rate)
    assert can_connect(any_rate, exact)
    assert can_connect(exact, any_all)
    assert can_connect(exact, absent)
    assert not can_connect(exact, other)
    # sample_format has no wildcard
    s16 = PacketType.raw_audio(AudioFormat(48000, 2, SampleFormat.S16LE))
    assert not can_connect(exact, s16)


def test_custom_type_matching():
    a = PacketType.custom("plugin::native::vad/vad-event@1")
    assert can_connect(a, PacketType.custom("plugin::native::vad/vad-event@1"))
    assert not can_connect(a, PacketType.custom("other"))
    assert can_connect(a, PacketType.custom("plugin::native::vad/*"))


def test_passthrough_unresolved_is_incompatible():
    assert not can_connect(PacketType.passthrough(), PacketType.text())
    assert can_connect(PacketType.passthrough(), PacketType.any())


def test_can_connect_any():
    out = PacketType.opus_audio()
    assert can_connect_any(out, [PacketType.text(), PacketType.opus_audio()])
    assert not can_connect_any(out, [PacketType.text(), PacketType.binary()])
