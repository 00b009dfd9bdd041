# SPDX-License-Identifier: Apache-2.0
"""libav decode shim tests (audio::flac::decoder parity, flac.rs):
decodes a hand-built FLAC (verbatim subframes) and the reference's
sample.ogg through the same universal node."""

import asyncio
import os
import struct
import subprocess

import numpy as np
import pytest

from streamkit_tpu.api import compile_yaml
from streamkit_tpu.core import NodeRegistry
from streamkit_tpu.engine import run_oneshot_pipeline
from streamkit_tpu.nodes import register_nodes

NATIVE = "/root/repo/native"
SAMPLE_OGG = "/root/reference/samples/audio/system/sample.ogg"


@pytest.fixture(scope="module")
def registry():
    subprocess.run(["make", "-C", NATIVE], check=True, capture_output=True)
    reg = NodeRegistry()
    register_nodes(reg)
    if not reg.contains("audio::flac::decoder"):
        pytest.skip("libav shim unavailable")
    return reg


# ---------------------------------------------------------------------------
# minimal FLAC encoder (verbatim subframes) — enough for libav to decode
# ---------------------------------------------------------------------------
def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for bit in self.bits[i : i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
        return bytes(out)


def make_flac(samples: np.ndarray, sample_rate: int = 16000, block: int = 4096) -> bytes:
    """Mono 16-bit FLAC with verbatim subframes."""
    total = len(samples)
    out = bytearray(b"fLaC")
    # STREAMINFO (34 bytes), last-metadata flag set
    si = _BitWriter()
    si.write(block, 16)  # min blocksize
    si.write(block, 16)  # max blocksize
    si.write(0, 24)  # min framesize (unknown)
    si.write(0, 24)  # max framesize
    si.write(sample_rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bits per sample - 1
    si.write(total, 36)
    si_bytes = si.bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    s16 = np.clip(samples * 32767, -32768, 32767).astype(">i2")
    for frame_idx, start in enumerate(range(0, total, block)):
        chunk = s16[start : start + block]
        n = len(chunk)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)  # sync
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize stream
        if n == block:
            bs_code, bs_extra = 0b0111 if block == 4096 else 0b0110, None
            if block == 4096:
                bs_code, bs_extra = 0b1100, None  # 2^12
            else:
                bs_code, bs_extra = 0b0111, n - 1  # 16-bit end-of-header field
        else:
            bs_code, bs_extra = 0b0111, n - 1
        hdr.write(bs_code, 4)
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(0b0000, 4)  # mono
        hdr.write(0b100, 3)  # 16 bits per sample
        hdr.write(0, 1)  # reserved
        # UTF-8 coded frame number (fits 7 bits for our sizes)
        assert frame_idx < 128
        hdr.write(frame_idx, 8)
        if bs_extra is not None:
            hdr.write(bs_extra, 16)
        hdr_bytes = hdr.bytes()
        hdr_bytes += bytes([_crc8(hdr_bytes)])
        body = _BitWriter()
        body.write(0, 1)  # subframe header: zero pad
        body.write(0b000001, 6)  # verbatim
        body.write(0, 1)  # no wasted bits
        for s in chunk:
            body.write(int(s) & 0xFFFF, 16)
        frame = hdr_bytes + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


async def _run(registry, yaml_text, body):
    pipeline = compile_yaml(yaml_text)

    async def stream():
        for i in range(0, len(body), 8192):
            yield body[i : i + 8192]

    res = await run_oneshot_pipeline(registry, pipeline, input_stream=stream())
    return await res.read_all()


FLAC_TO_WAV = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: audio::flac::decoder
  - kind: containers::wav::muxer
  - kind: streamkit::http_output
"""


def test_flac_decode_roundtrip(registry):
    t = np.arange(16000, dtype=np.float64) / 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    flac = make_flac(x)
    data = asyncio.run(_run(registry, FLAC_TO_WAV, flac))
    code, ch, rate = struct.unpack("<HHI", data[20:28])
    assert rate == 16000 and ch == 1
    y = np.frombuffer(data[44:], dtype="<i2").astype(np.float32) / 32768.0
    assert abs(len(y) - 16000) < 64
    # FLAC is lossless: samples match to 16-bit quantization
    np.testing.assert_allclose(y[: len(x)], x[: len(y)], atol=2e-4)


@pytest.mark.skipif(not os.path.exists(SAMPLE_OGG), reason="reference media not mounted")
def test_universal_decoder_on_reference_ogg(registry):
    """The same libav node decodes the reference's ogg/vorbis sample."""
    body = open(SAMPLE_OGG, "rb").read()
    data = asyncio.run(_run(registry, FLAC_TO_WAV, body))
    code, ch, rate = struct.unpack("<HHI", data[20:28])
    assert rate > 0 and ch in (1, 2)
    y = np.frombuffer(data[44:], dtype="<i2")
    assert len(y) > rate  # at least a second decoded
