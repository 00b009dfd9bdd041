# SPDX-License-Identifier: Apache-2.0
"""MoQ over WebTransport/QUIC integration tests (the reference's defining
dynamic-mode transport, server.rs:1975-2085 + transport/moq/peer.rs):

* fingerprint endpoints
* relay broadcast publish → subscribe over real UDP WebTransport
* the full loop: WT publisher → transport::moq::peer pipeline (opus decode →
  gain → encode) → WT subscriber
"""

import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from streamkit_tpu.moq.session import MoqClient
from streamkit_tpu.server import ServerConfig, create_app

PEER_YAML = """
mode: dynamic
nodes:
  moq_peer:
    kind: transport::moq::peer
    params:
      gateway_path: /wt-transcoder
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


async def _start_app(moq_port: int = 0):
    cfg = ServerConfig()
    cfg.moq_port = moq_port  # 0 = ephemeral
    app = create_app(cfg)
    server = TestServer(app)
    client = TestClient(server)
    await client.start_server()
    state = app["state"]
    assert state.webtransport is not None, "WebTransport acceptor missing"
    return client, state


def test_fingerprint_endpoints():
    async def main():
        client, state = await _start_app()
        resp = await client.get("/api/v1/moq/fingerprints")
        doc = await resp.json()
        resp2 = await client.get("/certificate.sha256")
        text = await resp2.text()
        await client.close()
        return doc, text, state.webtransport.fingerprint

    doc, text, fp = asyncio.run(main())
    assert doc["fingerprints"] == [fp]
    assert text == fp
    assert len(bytes.fromhex(fp)) == 32


def test_wt_relay_publish_subscribe():
    """Two independent WebTransport clients meet at a relay broadcast."""

    async def main():
        client, state = await _start_app()
        wt = state.webtransport
        fp = [bytes.fromhex(wt.fingerprint)]

        sub_client = MoqClient()
        await sub_client.connect("127.0.0.1", wt.port, fp)
        pub_client = MoqClient()
        await pub_client.connect("127.0.0.1", wt.port, fp)

        pub = await pub_client.publish("wt-room")
        # wait for the broadcast to exist, then subscribe
        sub_task = asyncio.ensure_future(sub_client.subscribe("wt-room"))
        await asyncio.sleep(0.3)
        sub = await sub_task
        await asyncio.sleep(0.2)  # let SUBSCRIBE reach the relay consumer

        for i in range(30):
            pub.send(f"frame-{i}".encode(), timestamp_us=i * 20_000, key=(i % 10 == 0))
        frames = []
        while len(frames) < 25:
            f = await sub.recv(timeout=10)
            assert f is not None
            frames.append(f)
        pub.end()
        sub_client.close()
        pub_client.close()
        await client.close()
        return frames

    frames = asyncio.run(main())
    payloads = [f[0].decode() for f in frames]
    # in-order, gap-free from the first received frame
    first = int(payloads[0].split("-")[1])
    assert payloads == [f"frame-{i}" for i in range(first, first + len(payloads))]
    assert frames[0][2] is True  # starts on a group boundary
    ts = [f[1] for f in frames]
    assert ts == sorted(ts)


def test_wt_publisher_peer_subscriber_loop():
    """The reference moq.yml loop over real QUIC: publish opus frames via
    WebTransport, pipeline transcodes with 2x gain, subscribe re-encoded
    audio via WebTransport."""
    from streamkit_tpu.nodes.codecs.opus import OpusDecoder, OpusEncoder

    async def main():
        client, state = await _start_app()
        wt = state.webtransport
        fp = [bytes.fromhex(wt.fingerprint)]

        resp = await client.post("/api/v1/sessions", json={"name": "wt", "yaml": PEER_YAML})
        assert resp.status == 201, await resp.text()

        sub_client = MoqClient()
        await sub_client.connect("127.0.0.1", wt.port, fp)
        sub = await sub_client.subscribe("/wt-transcoder/output")

        pub_client = MoqClient()
        await pub_client.connect("127.0.0.1", wt.port, fp)
        pub = await pub_client.publish("/wt-transcoder/input")
        await asyncio.sleep(0.2)

        enc = OpusEncoder(48000, 1, 64000)
        t = np.arange(48000) / 48000
        tone = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        for i in range(40):
            pkt = enc.encode(tone[i * 960 : (i + 1) * 960])
            pub.send(pkt, timestamp_us=i * 20_000, key=(i % 5 == 0))

        frames = []
        while len(frames) < 20:
            f = await sub.recv(timeout=15)
            assert f is not None
            frames.append(f)
        pub.end()
        sub_client.close()
        pub_client.close()
        await client.close()
        return frames

    frames = asyncio.run(main())
    assert len(frames) >= 20
    from streamkit_tpu.nodes.codecs.opus import OpusDecoder

    dec = OpusDecoder(48000, 1)
    pcm = None
    for payload, _ts, _key in frames[5:12]:
        pcm = dec.decode(payload)
    peak = float(np.abs(pcm).max())
    assert 0.35 < peak < 0.75, f"expected ~0.5 after 2x gain through WT loop, got {peak}"
