# SPDX-License-Identifier: Apache-2.0
"""moq-lite draft-02 wire + session tests (moq/lite.py, moq/lite_session.py):

* byte-level vectors for the reference-pinned constants (0xff0bbb02
  version, hang varint-microsecond frame header, catalog JSON shape,
  audio/data track at priority 80 — peer.rs:870,1022-1060),
* message codec round-trips,
* full WebTransport loopback: moq-lite publisher → relay → moq-lite
  subscriber on the same acceptor that speaks the native protocol,
* cross-protocol interop: moq-lite publisher → native subscriber.
"""

import asyncio

import numpy as np
import pytest

from streamkit_tpu.moq import lite
from streamkit_tpu.quic.packet import decode_varint, encode_varint


def test_version_constant_bytes():
    """Draft02 = 0xff0bbb02 (peer.rs:870) encodes as an 8-byte QUIC varint."""
    enc = encode_varint(lite.VERSION_DRAFT_02)
    v, off = decode_varint(enc, 0)
    assert v == 0xFF0BBB02
    assert off == len(enc) == 8


def test_hang_frame_vector():
    """hang frame = varint u64 MICROSECOND timestamp + media bytes
    (peer.rs:868-871); ms-granularity stamps stay exact."""
    payload = b"\x01\x02\x03opus"
    frame = lite.encode_hang_frame(payload, 1_234_000)  # 1234 ms
    # strip the moq-lite frame length prefix
    ln, off = decode_varint(frame, 0)
    inner = frame[off:]
    assert len(inner) == ln
    media, ts = lite.decode_hang_frame(inner)
    assert ts == 1_234_000 and media == payload
    # wire bytes: varint(1234000) then payload
    tsv, toff = decode_varint(inner, 0)
    assert tsv == 1_234_000 and inner[toff:] == payload


def test_catalog_shape():
    cat = lite.build_catalog()
    tracks = lite.parse_catalog(cat)
    assert tracks and tracks[0][0] == "audio/data"  # peer.rs:1022
    cfg = tracks[0][1]
    assert cfg["codec"] == "opus"
    assert cfg["sampleRate"] == 48000 and cfg["channelCount"] == 1
    import json

    doc = json.loads(cat)
    assert doc["audio"]["priority"] == 80  # peer.rs:1048


def test_session_handshake_roundtrip():
    msg = lite.encode_session_client([lite.VERSION_DRAFT_02], {0x5: b"ext"})
    versions, ext, off = lite.decode_session_client(msg)
    assert versions == [lite.VERSION_DRAFT_02] and ext == {5: b"ext"} and off == len(msg)
    srv = lite.encode_session_server()
    v, ext2, off2 = lite.decode_session_server(srv)
    assert v == lite.VERSION_DRAFT_02 and off2 == len(srv)


def test_subscribe_roundtrip():
    msg = lite.encode_subscribe(7, "room/alice", "audio/data", priority=80)
    sub_id, broadcast, track, prio, off = lite.decode_subscribe(msg)
    assert (sub_id, broadcast, track, prio) == (7, "room/alice", "audio/data", 80)
    assert off == len(msg)


def test_announce_parser_incremental():
    p = lite.AnnounceParser()
    data = (
        lite.encode_announce(lite.ANNOUNCE_ACTIVE, "a/b")
        + lite.encode_announce(lite.ANNOUNCE_ENDED, "a/b")
        + lite.encode_announce(lite.ANNOUNCE_LIVE)
    )
    out = []
    for i in range(0, len(data), 3):  # drip-feed
        out.extend(p.feed(data[i : i + 3]))
    assert out == [
        (lite.ANNOUNCE_ACTIVE, "a/b"),
        (lite.ANNOUNCE_ENDED, "a/b"),
        (lite.ANNOUNCE_LIVE, ""),
    ]


def test_group_parser_split_frames():
    gp = lite.LiteGroupParser()
    wire = (
        lite.encode_group_header(3, 9)
        + lite.encode_hang_frame(b"xx", 20_000)
        + lite.encode_hang_frame(b"yyyy", 40_000)
    )
    frames = []
    for i in range(0, len(wire), 5):
        frames.extend(gp.feed(wire[i : i + 5]))
    assert gp.sub_id == 3 and gp.sequence == 9
    assert [lite.decode_hang_frame(f) for f in frames] == [
        (b"xx", 20_000),
        (b"yyyy", 40_000),
    ]


# ---------------------------------------------------------------------------
# WebTransport loopback
# ---------------------------------------------------------------------------
async def _start_wt():
    from streamkit_tpu.moq.relay import MoqRelay
    from streamkit_tpu.server.webtransport import WebTransportServer

    relay = MoqRelay()
    wt = WebTransportServer(relay, None, host="127.0.0.1", port=0)
    port = await wt.start()
    fp = [bytes.fromhex(wt.fingerprint)]
    return relay, wt, port, fp


def test_lite_publish_subscribe_loopback():
    from streamkit_tpu.moq.lite_session import MoqLiteClient

    async def main():
        relay, wt, port, fp = await _start_wt()
        pub_c = MoqLiteClient()
        sub_c = MoqLiteClient()
        await pub_c.connect("127.0.0.1", port, fp)
        await sub_c.connect("127.0.0.1", port, fp)
        pub = await pub_c.publish("lite/audio")
        await asyncio.sleep(0.3)  # server announce/subscribe handshake
        sub = await sub_c.subscribe("lite/audio", timeout=10)
        for i in range(10):
            pub.send(bytes([i]) * 40, i * 20_000, key=(i % 5 == 0))
        got = []
        for _ in range(10):
            f = await sub.recv(timeout=5)
            assert f is not None
            got.append(f)
        payloads = [g[0][0] for g in got]
        first = payloads[0]
        assert payloads == list(range(first, first + len(payloads)))
        ts = [g[1] for g in got]
        assert ts == sorted(ts)
        assert got[0][2] is True  # group boundary
        pub_c.close()
        sub_c.close()
        await wt.stop()

    asyncio.run(main())


def test_lite_publisher_native_subscriber_interop():
    """A moq-lite publisher and a native-protocol subscriber exchange media
    through the same relay — both protocols on one acceptor."""
    from streamkit_tpu.moq.lite_session import MoqLiteClient
    from streamkit_tpu.moq.session import MoqClient

    async def main():
        relay, wt, port, fp = await _start_wt()
        pub_c = MoqLiteClient()
        await pub_c.connect("127.0.0.1", port, fp)
        pub = await pub_c.publish("interop/audio")
        await asyncio.sleep(0.3)
        sub_c = MoqClient()
        await sub_c.connect("127.0.0.1", port, fp)
        sub = await sub_c.subscribe("interop/audio")
        for i in range(5):
            pub.send(b"frame%d" % i, i * 20_000, key=(i == 0))
        got = []
        for _ in range(5):
            f = await sub.recv(timeout=5)
            assert f is not None
            got.append(f)
        assert [g[0] for g in got] == [b"frame%d" % i for i in range(5)]
        assert [g[1] for g in got] == [i * 20_000 for i in range(5)]
        pub_c.close()
        sub_c.close()
        await wt.stop()

    asyncio.run(main())


def test_cli_moq_publish_lite_subscribe_native(tmp_path):
    """The CLI `moq` command round-trips media: publish a WAV as opus over
    moq-lite, subscribe via the native protocol, against the full server
    app (fingerprints fetched over HTTP)."""
    import sys
    import types
    import wave

    from aiohttp.test_utils import TestClient, TestServer

    from streamkit_tpu.cli.main import _run_moq
    from streamkit_tpu.moq.session import MoqClient
    from streamkit_tpu.server import ServerConfig, create_app

    wav_path = tmp_path / "tone.wav"
    sr = 48_000
    t = np.arange(sr) / sr
    tone = (0.25 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())

    async def main():
        cfg = ServerConfig()
        cfg.moq_port = 0
        app = create_app(cfg)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        state = app["state"]
        wt = state.webtransport
        http_url = f"http://127.0.0.1:{client.port}"

        sub_c = MoqClient()
        await sub_c.connect("127.0.0.1", wt.port, [bytes.fromhex(wt.fingerprint)])

        args = types.SimpleNamespace(
            server=http_url, moq_cmd="publish", broadcast="cli/audio",
            wav=str(wav_path), protocol="lite", moq_port=wt.port,
        )
        pub_task = asyncio.ensure_future(_run_moq(args))
        await asyncio.sleep(0.6)  # publisher connected + announced
        sub = await sub_c.subscribe("cli/audio")
        frames = []
        while len(frames) < 10:
            f = await sub.recv(timeout=10)
            assert f is not None, "no frames over CLI moq-lite publish"
            frames.append(f)
        assert all(len(p[0]) > 0 for p in frames)
        ts = [p[1] for p in frames]
        assert ts == sorted(ts)
        pub_task.cancel()
        sub_c.close()
        await client.close()

    asyncio.run(main())
