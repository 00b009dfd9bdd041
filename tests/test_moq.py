# SPDX-License-Identifier: Apache-2.0
"""MoQ transport tests: gateway routing + the reference moq.yml loopback
(publish → peer → decode → gain → encode → peer → subscribe) over the WS
media binding (parity: transport/moq/peer.rs + samples/pipelines/dynamic/moq.yml)."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from streamkit_tpu.core.moq_gateway import (
    MoqConnection,
    MoqGateway,
    decode_media_frame,
    encode_media_frame,
)
from streamkit_tpu.server import ServerConfig, create_app

MOQ_YAML = """
mode: dynamic
nodes:
  moq_peer:
    kind: transport::moq::peer
    params:
      gateway_path: /transcoder
      allow_reconnect: true
    needs: opus_encoder
  opus_decoder:
    kind: audio::opus::decoder
    needs: moq_peer
  gain:
    kind: audio::gain
    params: {gain: 2.0}
    needs: opus_decoder
  opus_encoder:
    kind: audio::opus::encoder
    needs: gain
"""


def test_media_frame_roundtrip():
    frame = encode_media_frame(b"opusdata", 123456, key=True)
    payload, ts, key = decode_media_frame(frame)
    assert payload == b"opusdata" and ts == 123456 and key


def test_gateway_route_registration_and_wait():
    async def main():
        gw = MoqGateway()
        route = await gw.register_route("/x/input")
        with pytest.raises(ValueError):
            await gw.register_route("/x/input")
        conn = MoqConnection("/x/input", "publish")
        ok = await gw.accept_connection(conn)
        assert ok
        got = await route.recv()
        assert got is conn
        await gw.unregister_route("/x/input")
        # unknown route times out — use a short deadline via monkeypatched wait
        import streamkit_tpu.core.moq_gateway as mg

        old = mg.ROUTE_WAIT_SECS
        mg.ROUTE_WAIT_SECS = 0.2
        try:
            assert not await gw.accept_connection(MoqConnection("/nope", "publish"))
        finally:
            mg.ROUTE_WAIT_SECS = old

    asyncio.run(main())


def test_moq_loopback_transcoder_over_ws():
    """The reference's moq.yml: a browser publishes opus, the pipeline
    transcodes (gain 2x), subscribers receive the re-encoded stream."""
    from streamkit_tpu.nodes.codecs.opus import OpusDecoder, OpusEncoder

    async def main():
        app = create_app(ServerConfig())
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()

        resp = await client.post("/api/v1/sessions", json={"name": "moq", "yaml": MOQ_YAML})
        assert resp.status == 201, await resp.text()

        # subscriber first (route waits), then publisher
        sub_ws = await client.ws_connect("/moq/transcoder/output?direction=subscribe")
        pub_ws = await client.ws_connect("/moq/transcoder/input?direction=publish")

        # publish 25 opus frames of a 0.25-amplitude tone
        enc = OpusEncoder(48000, 1, 64000)
        t = np.arange(48000) / 48000
        tone = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        for i in range(25):
            pcm = tone[i * 960 : (i + 1) * 960]
            pkt = enc.encode(pcm)
            await pub_ws.send_bytes(encode_media_frame(pkt, i * 20000))

        # collect re-encoded frames from the subscriber
        frames = []
        try:
            while len(frames) < 15:
                msg = await asyncio.wait_for(sub_ws.receive(), timeout=10)
                if msg.type.name == "BINARY":
                    frames.append(msg.data)
                elif msg.type.name in ("CLOSE", "CLOSED", "ERROR"):
                    break
        finally:
            await pub_ws.close()
            await sub_ws.close()
            await client.close()
        return frames

    frames = asyncio.run(main())
    assert len(frames) >= 15, f"only got {len(frames)} frames back"
    # decode a middle frame and check the 2x gain made it through the loop
    dec = OpusDecoder(48000, 1)
    payload, ts, _ = decode_media_frame(frames[10])
    pcm = dec.decode(payload)
    # warm the decoder with a couple frames for accurate amplitude
    for f in frames[11:14]:
        pcm = dec.decode(decode_media_frame(f)[0])
    peak = np.abs(pcm).max()
    assert 0.35 < peak < 0.75, f"expected ~0.5 after 2x gain, got {peak}"


def test_webm_muxer_pipeline():
    """kokoro-tts.yml tail: opus packets → webm stream with valid EBML."""
    from streamkit_tpu.api import compile_yaml
    from streamkit_tpu.core import NodeRegistry
    from streamkit_tpu.engine import run_oneshot_pipeline
    from streamkit_tpu.nodes import register_nodes

    reg = NodeRegistry()
    register_nodes(reg)
    yaml_text = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: containers::wav::demuxer
  - kind: audio::opus::encoder
  - kind: containers::webm::muxer
    params: {channels: 1, sample_rate: 48000}
  - kind: streamkit::http_output
"""
    import io
    import wave

    x = (np.sin(2 * np.pi * 440 * np.arange(48000) / 48000) * 0.3).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes((x * 32767).astype("<i2").tobytes())

    async def main():
        async def stream():
            yield buf.getvalue()

        res = await run_oneshot_pipeline(reg, compile_yaml(yaml_text), input_stream=stream())
        data = await res.read_all()
        return data, res.content_type

    data, ctype = asyncio.run(main())
    assert ctype == "video/webm"
    assert data[:4] == b"\x1a\x45\xdf\xa3"  # EBML magic
    assert b"webm" in data[:64]
    assert b"A_OPUS" in data[:512]
    assert b"\x1f\x43\xb6\x75" in data  # at least one Cluster


def test_metrics_endpoint():
    async def main():
        app = create_app(ServerConfig())
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        await client.post("/api/v1/sessions", json={"name": "m"})
        resp = await client.get("/api/v1/metrics")
        text = await resp.text()
        await client.close()
        return text

    text = asyncio.run(main())
    assert "skit_sessions_active 1" in text
    assert "skit_uptime_seconds" in text
