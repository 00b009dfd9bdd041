# SPDX-License-Identifier: Apache-2.0
"""MoQ relay tests: broadcast namespace, group-based dropping, announce-wait,
and the self-contained publisher → relay → subscriber pipeline (parity with
reference loadtest pipelines/moq_selfcontained.yml which meets at a relay)."""

import asyncio

import pytest

pytestmark = pytest.mark.slow

from streamkit_tpu.moq import MoqRelay, init_moq_relay


def test_publish_subscribe_ordering():
    async def main():
        relay = MoqRelay()
        b = relay.announce("room")
        sub = await relay.subscribe("room", wait=0.1)
        for i in range(10):
            b.publish(bytes([i]), timestamp_us=i * 1000, key=(i % 5 == 0))
        got = [await sub.recv() for _ in range(10)]
        assert [f.payload[0] for f in got] == list(range(10))
        assert got[0].key and got[5].key and not got[1].key
        b.end()
        assert await sub.recv() is None

    asyncio.run(main())


def test_slow_subscriber_drops_whole_groups():
    async def main():
        relay = MoqRelay()
        b = relay.announce("room")
        sub = await relay.subscribe("room", wait=0.1)
        # publish 20 groups of 4 frames without the subscriber reading
        for g in range(20):
            for i in range(4):
                b.publish(f"{g}:{i}".encode(), key=(i == 0))
        # subscriber should have skipped ahead in whole-group units
        first = await sub.recv()
        g0 = int(first.payload.split(b":")[0])
        assert g0 >= 12, f"expected old groups dropped, first group {g0}"
        assert first.key  # always lands on a group boundary
        assert sub.dropped_groups >= 12
        # the remaining frames arrive in order
        seen = [first.payload.decode()]
        for _ in range(4 * (20 - g0) - 1):
            f = await sub.recv()
            seen.append(f.payload.decode())
        assert seen == [f"{g}:{i}" for g in range(g0, 20) for i in range(4)]

    asyncio.run(main())


def test_subscribe_waits_for_announce():
    async def main():
        relay = MoqRelay()

        async def announce_later():
            await asyncio.sleep(0.05)
            b = relay.announce("later")
            # live media: frames published before a consumer attaches are not
            # retro-buffered, so wait for the subscriber before publishing
            while b.subscriber_count == 0:
                await asyncio.sleep(0.01)
            b.publish(b"hi", key=True)

        task = asyncio.ensure_future(announce_later())
        sub = await relay.subscribe("later", wait=2.0)
        assert sub is not None
        f = await sub.recv()
        assert f.payload == b"hi"
        await task

        # timeout path
        assert await relay.subscribe("never", wait=0.05) is None

    asyncio.run(main())


def test_announce_replace_semantics():
    async def main():
        relay = MoqRelay()
        b1 = relay.announce("room")
        sub = await relay.subscribe("room", wait=0.1)
        b2 = relay.announce("room")  # replaces b1, ends its consumers
        assert await sub.recv() is None
        with pytest.raises(ValueError):
            relay.announce("room", replace=False)
        assert relay.announced()[0]["name"] == "room"
        b2.end()
        assert relay.announced() == []

    asyncio.run(main())


def test_selfcontained_pub_sub_pipeline():
    """file audio → opus → publisher ⇒ relay ⇒ subscriber → decoder → gain →
    sink, all in one dynamic session (the moq_selfcontained loadtest shape)."""
    import numpy as np

    from streamkit_tpu.api import compile_yaml
    from streamkit_tpu.core import NodeRegistry
    from streamkit_tpu.engine.dynamic import DynamicEngineConfig, start_dynamic_engine
    from streamkit_tpu.nodes import register_nodes
    from streamkit_tpu.nodes.codecs.opus import OpusEncoder

    yaml_text = """
mode: dynamic
nodes:
  sub:
    kind: transport::moq::subscriber
    params: {broadcast: lt-input}
  decode:
    kind: audio::opus::decoder
    needs: sub
  gain:
    kind: audio::gain
    params: {gain: 1.0}
    needs: decode
  encode:
    kind: audio::opus::encoder
    needs: gain
  pub_out:
    kind: transport::moq::publisher
    params: {broadcast: lt-output, group_duration_ms: 40}
    needs: encode
"""

    async def main():
        relay = init_moq_relay()
        reg = NodeRegistry()
        register_nodes(reg)
        handle = start_dynamic_engine(reg, DynamicEngineConfig(session_id="lt"))
        pipeline = compile_yaml(yaml_text)
        for node_id, n in pipeline.nodes.items():
            await handle.add_node(node_id, n.kind, n.params)
        for c in pipeline.connections:
            await handle.connect(c.from_node, c.from_pin, c.to_node, c.to_pin)

        out_sub = asyncio.ensure_future(relay.subscribe("lt-output", wait=10.0))
        await asyncio.sleep(0.1)
        b = relay.announce("lt-input")
        for _ in range(500):  # wait for the subscriber node to attach
            if b.subscriber_count > 0:
                break
            await asyncio.sleep(0.01)
        assert b.subscriber_count > 0
        enc = OpusEncoder(48000, 1, 64000)
        t = np.arange(48000) / 48000
        tone = (0.25 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
        for i in range(25):
            b.publish(enc.encode(tone[i * 960 : (i + 1) * 960]), i * 20000, key=(i % 2 == 0))
        consumer = await out_sub
        assert consumer is not None
        frames = []
        while len(frames) < 10:
            f = await asyncio.wait_for(consumer.recv(), timeout=10)
            assert f is not None
            frames.append(f)
        b.end()
        await handle.shutdown_and_wait()
        return frames

    frames = asyncio.run(main())
    assert len(frames) >= 10
    assert all(isinstance(f.payload, bytes) and len(f.payload) > 0 for f in frames)
