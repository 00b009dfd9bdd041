# SPDX-License-Identifier: Apache-2.0
"""Byte-level golden vectors for the MoQ wire protocols.

The vectors (tests/golden/moq_vectors.json, generated + hand-verified by
tools/gen_golden_moq.py) pin the exact on-wire bytes of the moq-lite
draft-02 grammar (streamkit_tpu/moq/lite.py) and the native control
protocol (moq/wire.py). Both stacks are otherwise only tested
against themselves — a self-consistent misreading of the draft (encode and
decode drifting together) stays green in those tests; it fails here, because
these bytes were derived BY HAND from the varint/message layout
(QUIC RFC 9000 §16 + moq-lite draft-02; reference peer:
/root/reference/crates/transport/src/moq/peer.rs:459-880).

Two directions per vector: encoders must reproduce the frozen bytes
byte-for-byte, and decoders must parse the frozen bytes back
field-for-field (incl. byte-at-a-time incremental feeds).
"""

import json
import os

import pytest

from streamkit_tpu.moq import lite, wire

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "moq_vectors.json")

with open(GOLDEN) as f:
    VEC = {k: bytes.fromhex(v) for k, v in json.load(f).items()}


# -- encoders reproduce the frozen bytes -------------------------------------
ENCODE_CASES = [
    ("lite_session_client", lambda: lite.encode_session_client()),
    ("lite_session_server", lambda: lite.encode_session_server()),
    ("lite_announce_please", lambda: lite.encode_announce_please("demo/")),
    ("lite_announce_active", lambda: lite.encode_announce(lite.ANNOUNCE_ACTIVE, "room1")),
    ("lite_announce_live", lambda: lite.encode_announce(lite.ANNOUNCE_LIVE)),
    ("lite_subscribe", lambda: lite.encode_subscribe(7, "demo/room1", "audio/data", priority=80)),
    ("lite_subscribe_ok", lambda: lite.encode_subscribe_ok(80)),
    ("lite_group_header", lambda: lite.encode_group_header(7, 64)),
    ("lite_hang_frame", lambda: lite.encode_hang_frame(b"opus-pkt", 300_000)),
    ("lite_catalog", lambda: lite.build_catalog()),
    ("native_setup", lambda: wire.encode_msg(wire.MSG_SETUP, wire.MOQ_VERSION)),
    ("native_subscribe", lambda: wire.encode_msg(wire.MSG_SUBSCRIBE, 3, b"demo/room1/audio/data")),
    ("native_group_header", lambda: wire.encode_group_header(3, 17)),
    ("native_frame", lambda: wire.encode_frame(b"opus-pkt", 300_000, key=True)),
]


@pytest.mark.parametrize("name,enc", ENCODE_CASES, ids=[c[0] for c in ENCODE_CASES])
def test_encoder_matches_golden(name, enc):
    assert enc().hex() == VEC[name].hex()


# -- hand-derived spot checks (independent of the generator) -----------------
def test_hand_derived_layouts():
    # varint classes: 1-byte (<2^6), 2-byte 0b01 prefix, 8-byte 0b11 prefix
    assert VEC["lite_session_client"] == bytes.fromhex("01c0000000ff0bbb0200")
    assert VEC["lite_group_header"] == bytes.fromhex("074040")  # 64 → 40 40
    # hang frame: size(12) + ts varint(300000 → 4-byte class 80 04 93 e0)
    assert VEC["lite_hang_frame"][:1] == b"\x0c"
    assert VEC["lite_hang_frame"][1:5] == bytes.fromhex("800493e0")


# -- decoders parse the frozen bytes back ------------------------------------
def test_decode_session_handshake():
    versions, exts, off = lite.decode_session_client(VEC["lite_session_client"])
    assert versions == [lite.VERSION_DRAFT_02] and exts == {}
    assert off == len(VEC["lite_session_client"])
    version, exts, off = lite.decode_session_server(VEC["lite_session_server"])
    assert version == lite.VERSION_DRAFT_02 and exts == {}
    assert off == len(VEC["lite_session_server"])


def test_decode_announce_flow():
    prefix, off = lite.decode_announce_please(VEC["lite_announce_please"])
    assert prefix == "demo/" and off == len(VEC["lite_announce_please"])
    p = lite.AnnounceParser()
    # byte-at-a-time: incremental parsing must tolerate any split
    msgs = []
    for stream in (VEC["lite_announce_active"], VEC["lite_announce_live"]):
        for i in range(len(stream)):
            msgs.extend(p.feed(stream[i : i + 1]))
    assert msgs == [(lite.ANNOUNCE_ACTIVE, "room1"), (lite.ANNOUNCE_LIVE, "")]


def test_decode_subscribe_flow():
    sub_id, broadcast, track, priority, off = lite.decode_subscribe(VEC["lite_subscribe"])
    assert (sub_id, broadcast, track, priority) == (7, "demo/room1", "audio/data", 80)
    assert off == len(VEC["lite_subscribe"])
    priority, off = lite.decode_subscribe_ok(VEC["lite_subscribe_ok"])
    assert priority == 80 and off == 1


def test_decode_lite_group_stream():
    p = lite.LiteGroupParser()
    stream = VEC["lite_group_header"] + VEC["lite_hang_frame"]
    frames = []
    for i in range(len(stream)):  # worst-case fragmentation
        frames.extend(p.feed(stream[i : i + 1]))
    assert p.sub_id == 7 and p.sequence == 64
    assert len(frames) == 1
    payload, ts = lite.decode_hang_frame(frames[0])
    assert payload == b"opus-pkt" and ts == 300_000


def test_decode_catalog():
    tracks = lite.parse_catalog(VEC["lite_catalog"])
    assert any(t == "audio/data" for t, _ in tracks)


def test_decode_native_control():
    p = wire.ControlParser()
    stream = VEC["native_setup"] + VEC["native_subscribe"]
    msgs = []
    for i in range(len(stream)):
        msgs.extend(p.feed(stream[i : i + 1]))
    assert msgs[0] == (wire.MSG_SETUP, (wire.MOQ_VERSION,))
    assert msgs[1] == (wire.MSG_SUBSCRIBE, (3, "demo/room1/audio/data"))


def test_decode_native_group_stream():
    p = wire.GroupParser()
    stream = VEC["native_group_header"] + VEC["native_frame"]
    frames = []
    for i in range(len(stream)):
        frames.extend(p.feed(stream[i : i + 1]))
    assert p.alias == 3 and p.group_seq == 17
    assert frames == [(b"opus-pkt", 300_000, True)]
