# SPDX-License-Identifier: Apache-2.0
"""Codec + container tests against the reference's real sample media
(parity: nodes/src/audio/codecs/opus.rs + containers/ogg.rs behavior)."""

import asyncio
import os
import struct

import numpy as np
import pytest

from streamkit_tpu.api import compile_yaml
from streamkit_tpu.core import NodeRegistry
from streamkit_tpu.engine import run_oneshot_pipeline
from streamkit_tpu.nodes import register_nodes
from streamkit_tpu.nodes.containers.ogg import (
    OggPageReader,
    OggPageWriter,
    _opus_packet_samples,
    ogg_crc,
    opus_head,
    opus_tags,
)

REF_AUDIO = "/root/reference/samples/audio/system"
SAMPLE_OGG = os.path.join(REF_AUDIO, "sample.ogg")
SPEECH_OPUS = os.path.join(REF_AUDIO, "speech_2m.opus")


@pytest.fixture(scope="module")
def registry():
    reg = NodeRegistry()
    register_nodes(reg)
    return reg


def test_opus_codec_registered(registry):
    assert registry.contains("audio::opus::decoder")
    assert registry.contains("audio::opus::encoder")
    assert registry.contains("audio::mp3::decoder")


def test_ogg_crc_known_vector():
    # CRC of an all-zero page header must be stable/deterministic
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"OggS") == ogg_crc(b"OggS")
    assert ogg_crc(b"a") != ogg_crc(b"b")


def test_ogg_page_roundtrip():
    w = OggPageWriter()
    r = OggPageReader()
    pkts = [b"hello", b"x" * 300, b"tail"]  # includes a >255 lacing case
    page = w.page(pkts, granule=4242)
    out = r.feed(page)
    assert [p for p, g in out] == pkts
    assert all(g == 4242 for _, g in out)


def test_ogg_page_roundtrip_chunked_feed():
    w = OggPageWriter()
    r = OggPageReader()
    page = w.page([b"abc" * 100], granule=7)
    out = []
    for i in range(0, len(page), 13):  # dribble bytes
        out.extend(r.feed(page[i : i + 13]))
    assert out == [(b"abc" * 100, 7)]


def test_opus_packet_samples_toc():
    # CELT 20ms stereo config 31, code 0 → 960 samples
    assert _opus_packet_samples(bytes([31 << 3])) == 960
    # SILK config 1 (20ms) → 960
    assert _opus_packet_samples(bytes([1 << 3])) == 960


@pytest.mark.skipif(not os.path.exists(SAMPLE_OGG), reason="reference media not mounted")
def test_reference_ogg_transcode_roundtrip(registry, tmp_path):
    """Decode the reference's shipped sample.ogg, re-encode, decode again —
    the double_volume.yml pipeline shape with real media."""
    yaml_text = f"""
mode: oneshot
nodes:
  reader:
    kind: core::file_reader
    params: {{path: "{SAMPLE_OGG}"}}
  demux: {{kind: "containers::ogg::demuxer", needs: reader}}
  dec: {{kind: "audio::opus::decoder", params: {{channels: 2}}, needs: demux}}
  gain: {{kind: "audio::gain", params: {{gain: 2.0}}, needs: dec}}
  enc: {{kind: "audio::opus::encoder", needs: gain}}
  mux: {{kind: "containers::ogg::muxer", params: {{channels: 2}}, needs: enc}}
  out: {{kind: streamkit::http_output, needs: mux}}
"""
    pipeline = compile_yaml(yaml_text)

    async def main():
        result = await run_oneshot_pipeline(registry, pipeline)
        data = await result.read_all()
        return data, result.content_type

    data, ctype = asyncio.run(main())
    assert ctype == "audio/ogg"
    assert data[:4] == b"OggS"
    # the output must itself demux+decode back to audio of similar duration
    reader = OggPageReader()
    packets = reader.feed(data)
    assert packets[0][0][:8] == b"OpusHead"
    audio_packets = packets[2:]
    total_samples = sum(_opus_packet_samples(p) for p, _ in audio_packets)
    in_size = os.path.getsize(SAMPLE_OGG)
    assert total_samples > 48000  # at least a second of audio came through
    # and the opus decoder accepts the re-encoded packets
    from streamkit_tpu.nodes.codecs.opus import OpusDecoder

    dec = OpusDecoder(48000, 2)
    pcm = dec.decode(audio_packets[10][0])
    assert pcm.shape[0] > 0
    assert np.isfinite(pcm).all()


@pytest.mark.skipif(not os.path.exists(SPEECH_OPUS), reason="reference media not mounted")
def test_speech_opus_to_wav_pipeline(registry, tmp_path):
    """speech_2m.opus → decode → resample 16k → wav; verify format chain."""
    out = str(tmp_path / "speech.wav")
    yaml_text = f"""
mode: oneshot
nodes:
  reader:
    kind: core::file_reader
    params: {{path: "{SPEECH_OPUS}"}}
  demux: {{kind: "containers::ogg::demuxer", needs: reader}}
  dec: {{kind: "audio::opus::decoder", params: {{channels: 1}}, needs: demux}}
  resample:
    kind: audio::resampler
    params: {{target_sample_rate: 16000}}
    needs: dec
  mux: {{kind: "containers::wav::muxer", needs: resample}}
  http_output: {{kind: streamkit::http_output, needs: mux}}
"""
    pipeline = compile_yaml(yaml_text)

    async def main():
        result = await run_oneshot_pipeline(registry, pipeline)
        return await result.read_all()

    data = asyncio.run(main())
    code, ch, rate = struct.unpack("<HHI", data[20:28])
    assert rate == 16000 and ch == 1
    y = np.frombuffer(data[44:], dtype="<i2").astype(np.float32) / 32768.0
    # ~2 minutes of speech at 16k
    assert len(y) > 100 * 16000
    assert 0.01 < np.abs(y).max() <= 1.0


def test_opus_batch_decode_matches_single():
    """The native batched decode path must produce the same PCM as the
    per-packet ctypes path for the same packet stream (separate decoder
    instances: Opus decode is stateful, so each path owns its stream)."""
    from streamkit_tpu.nodes.codecs.opus import OpusDecoder, OpusEncoder, _batch_shim

    sr, ch = 48000, 1
    enc = OpusEncoder(sr, ch, 64000)
    t = np.arange(sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    packets = [enc.encode(audio[i * 960 : (i + 1) * 960]) for i in range(40)]

    d_single = OpusDecoder(sr, ch)
    singles = [d_single.decode(p) for p in packets]

    d_batch = OpusDecoder(sr, ch)
    batched = []
    for i in range(0, len(packets), 7):  # uneven batches exercise offsets
        batched.extend(d_batch.decode_batch(packets[i : i + 7]))

    assert len(batched) == len(singles)
    for a, b in zip(singles, batched):
        np.testing.assert_array_equal(a, b)
    if _batch_shim() is None:
        pytest.skip("native batch shim not built — fallback path verified only")


def test_opus_native_rate_decode():
    """The decoder node's sample_rate param decodes natively at 16 kHz
    (RFC 6716: any of 8/12/16/24/48 k regardless of encode rate) — the
    basis of the compiler's fuse-decode-resample pass."""
    import numpy as np

    from streamkit_tpu.core.errors import ConfigurationError
    from streamkit_tpu.nodes.codecs.opus import (
        OpusDecoder,
        OpusDecoderNode,
        OpusEncoder,
    )

    sr, f0 = 48000, 440.0
    t = np.arange(sr, dtype=np.float32) / sr
    pcm = (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    enc = OpusEncoder(sr, 1)
    packets = [enc.encode(pcm[i : i + 960]) for i in range(0, sr - 960, 960)]

    dec16 = OpusDecoder(16000, 1)
    out = np.concatenate([dec16.decode(p) for p in packets])
    # 20 ms packets -> 320 samples each at 16 kHz
    assert len(out) == len(packets) * 320
    # the 440 Hz tone survives: dominant DFT bin within 2 bins of 440
    tail = out[len(out) // 2 :]
    spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
    peak_hz = np.argmax(spec[1:]) + 1
    peak_hz = peak_hz * 16000 / len(tail)
    assert abs(peak_hz - f0) < 15.0, peak_hz

    node = OpusDecoderNode({"channels": 1, "sample_rate": 16000})
    assert node.output_pins()[0].produces_type.audio_format.sample_rate == 16000
    try:
        OpusDecoderNode({"sample_rate": 22050})
        raise AssertionError("22050 must be rejected")
    except ConfigurationError:
        pass
