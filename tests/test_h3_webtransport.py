# SPDX-License-Identifier: Apache-2.0
"""HTTP/3 + WebTransport layer tests: QPACK vectors, extended CONNECT,
WT uni/bidi streams and datagrams over loopback QUIC."""

import asyncio
import hashlib

from streamkit_tpu.quic.connection import StreamEvent
from streamkit_tpu.quic.endpoint import connect, serve
from streamkit_tpu.quic.h3 import (
    H3Connection,
    SessionRequest,
    WtDatagram,
    WtStreamData,
)
from streamkit_tpu.quic.qpack import (
    decode_field_section,
    encode_field_section,
    huffman_decode,
)
from streamkit_tpu.quic.tls import generate_self_signed


def test_qpack_roundtrip_connect_headers():
    hs = [
        (":method", "CONNECT"),
        (":protocol", "webtransport"),
        (":scheme", "https"),
        (":authority", "localhost:4443"),
        (":path", "/moq"),
        ("origin", "https://localhost"),
    ]
    assert decode_field_section(encode_field_section(hs)) == hs
    # static-table exact hits stay 1 byte each
    assert len(encode_field_section([(":method", "CONNECT"), (":scheme", "https")])) == 4


def test_hpack_huffman_rfc7541_vectors():
    assert huffman_decode(bytes.fromhex("f1e3c2e5f23a6ba0ab90f4ff")) == b"www.example.com"
    assert huffman_decode(bytes.fromhex("6402")) == b"302"
    assert huffman_decode(bytes.fromhex("aec3771a4b")) == b"private"
    assert huffman_decode(bytes.fromhex("d07abe941054d444a8200595040b8166e082a62d1bff")) == (
        b"Mon, 21 Oct 2013 20:13:21 GMT"
    )


def test_webtransport_session_streams_datagrams():
    async def main():
        cert, key = generate_self_signed()
        fp = hashlib.sha256(cert).digest()

        async def on_conn(proto):
            await proto.handshake_done
            h3 = H3Connection(proto, True)
            h3.start()
            while True:
                ev = await h3.events.get()
                if isinstance(ev, SessionRequest):
                    assert ev.path == "/moq"
                    h3.accept_session(ev.session_id)
                elif isinstance(ev, WtStreamData):
                    if ev.bidi and ev.data:
                        h3.send_stream(ev.stream_id, b"reply:" + ev.data, fin=ev.fin)
                    elif not ev.bidi and ev.data:
                        out = h3.open_wt_uni(ev.session_id)
                        h3.send_stream(out, b"uni-reply:" + ev.data, fin=True)
                elif isinstance(ev, WtDatagram):
                    h3.send_wt_datagram(ev.session_id, b"dg-reply:" + ev.data)

        server, tr = await serve("127.0.0.1", 0, cert, key, on_conn)
        port = tr.get_extra_info("sockname")[1]
        client, proto = await connect("127.0.0.1", port, [fp])
        h3 = H3Connection(proto, False)
        h3.start()
        session = await h3.connect_session("/moq", "localhost")

        bidi = h3.open_wt_bidi(session)
        h3.send_stream(bidi, b"hello-bidi")
        uni = h3.open_wt_uni(session)
        h3.send_stream(uni, b"hello-uni", fin=True)
        h3.send_wt_datagram(session, b"hello-dg")

        got = {}
        while len(got) < 3:
            ev = await asyncio.wait_for(h3.events.get(), timeout=5)
            if isinstance(ev, WtStreamData) and ev.bidi and ev.data:
                got["bidi"] = ev.data
            elif isinstance(ev, WtStreamData) and not ev.bidi and ev.data:
                got["uni"] = ev.data
            elif isinstance(ev, WtDatagram):
                got["dg"] = ev.data
        client.close()
        server.close()
        return got

    got = asyncio.run(main())
    assert got["bidi"] == b"reply:hello-bidi"
    assert got["uni"] == b"uni-reply:hello-uni"
    assert got["dg"] == b"dg-reply:hello-dg"
