# SPDX-License-Identifier: Apache-2.0
"""MoQ wire-protocol unit tests: control message round-trips under
fragmented delivery, group stream parsing, unknown-message rejection."""

import pytest

from streamkit_tpu.moq.wire import (
    MOQ_VERSION,
    MSG_PUBLISH,
    MSG_SETUP,
    MSG_SUBSCRIBE,
    MSG_SUBSCRIBE_ERROR,
    ControlParser,
    GroupParser,
    encode_frame,
    encode_group_header,
    encode_msg,
)


def test_control_roundtrip_fragmented():
    blob = (
        encode_msg(MSG_SETUP, MOQ_VERSION)
        + encode_msg(MSG_PUBLISH, 7, "/transcoder/input")
        + encode_msg(MSG_SUBSCRIBE, 8, "lt-live")
        + encode_msg(MSG_SUBSCRIBE_ERROR, 8, "broadcast not announced")
    )
    # feed one byte at a time: the parser must reassemble exactly
    p = ControlParser()
    msgs = []
    for i in range(len(blob)):
        msgs += p.feed(blob[i : i + 1])
    assert msgs == [
        (MSG_SETUP, (MOQ_VERSION,)),
        (MSG_PUBLISH, (7, "/transcoder/input")),
        (MSG_SUBSCRIBE, (8, "lt-live")),
        (MSG_SUBSCRIBE_ERROR, (8, "broadcast not announced")),
    ]
    assert not p.buf


def test_control_unknown_message_raises():
    p = ControlParser()
    with pytest.raises(ValueError, match="unknown MoQ control message"):
        p.feed(bytes([0x3F]) + b"xx")


def test_group_parser_fragmented_frames():
    stream = encode_group_header(alias=5, group_seq=9)
    payloads = [(b"frame-one", 1000, True), (b"x" * 300, 2000, False), (b"", 3000, False)]
    for data, ts, key in payloads:
        stream += encode_frame(data, ts, key)

    gp = GroupParser()
    out = []
    # fragment at awkward boundaries
    for i in range(0, len(stream), 7):
        out += gp.feed(stream[i : i + 7])
    assert gp.alias == 5 and gp.group_seq == 9
    assert out == payloads


def test_group_parser_single_feed():
    stream = encode_group_header(2, 0) + encode_frame(b"abc", 42, False)
    gp = GroupParser()
    out = gp.feed(stream)
    assert out == [(b"abc", 42, False)]


def test_batcher_gather_window():
    """A kind with gather_ms holds a partial batch; a second co-arriving
    submission coalesces into one device call."""
    import asyncio

    import numpy as np

    from streamkit_tpu.engine.batcher import DeviceBatcher

    async def main():
        b = DeviceBatcher(tick_ms=2.0)
        b.register("echo", lambda x: x * 2, max_batch=8, pad_to=4, gather_ms=80.0)
        b.start()

        async def submit_delayed(v, delay):
            await asyncio.sleep(delay)
            return await b.submit("echo", np.asarray([v], np.float32))

        r1, r2 = await asyncio.gather(
            submit_delayed(1.0, 0.0), submit_delayed(2.0, 0.03)
        )
        stats = b.stats()
        b.stop()
        return float(r1[0]), float(r2[0]), stats

    r1, r2, stats = asyncio.run(main())
    assert (r1, r2) == (2.0, 4.0)
    # both items rode ONE gathered call
    assert stats["device_calls"] == 1, stats
    assert stats["batched_items"] == 2


def test_batcher_gather_dispatches_after_window():
    """A lone submission still dispatches once the gather window expires."""
    import asyncio
    import time

    import numpy as np

    from streamkit_tpu.engine.batcher import DeviceBatcher

    async def main():
        b = DeviceBatcher(tick_ms=2.0)
        b.register("echo1", lambda x: x + 1, max_batch=8, gather_ms=50.0)
        b.start()
        t0 = time.monotonic()
        out = await b.submit("echo1", np.asarray([1.0], np.float32))
        dt = time.monotonic() - t0
        b.stop()
        return float(out[0]), dt

    out, dt = asyncio.run(main())
    assert out == 2.0
    assert 0.04 <= dt < 1.0, dt  # waited the window, then fired
