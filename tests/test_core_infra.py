# SPDX-License-Identifier: Apache-2.0
"""Channel, registry, resource manager, frame pool, stats tests."""

import asyncio

import numpy as np
import pytest

from streamkit_tpu.core import (
    AudioFormat,
    AudioFramePool,
    Channel,
    ChannelClosed,
    ChannelFull,
    ConfigurationError,
    NodeRegistry,
    NodeStatsTracker,
    ProcessorNode,
    ResourceKey,
    ResourceManager,
    ResourcePolicy,
)


# ---------------------------------------------------------------- channels
def test_channel_basic_try_ops():
    ch = Channel(2)
    ch.try_send(1)
    ch.try_send(2)
    with pytest.raises(ChannelFull):
        ch.try_send(3)
    assert ch.try_recv() == 1
    assert ch.try_recv() == 2


def test_channel_close_drains_then_raises():
    ch = Channel(4)
    ch.try_send("a")
    ch.close()
    assert ch.try_recv() == "a"
    with pytest.raises(ChannelClosed):
        ch.try_recv()
    with pytest.raises(ChannelClosed):
        ch.try_send("b")


def test_channel_backpressure():
    async def main():
        ch = Channel(1)
        ch.try_send(0)
        sent = []

        async def producer():
            for i in range(1, 4):
                await ch.send(i)
                sent.append(i)

        task = asyncio.ensure_future(producer())
        await asyncio.sleep(0.01)
        assert sent == []  # blocked: capacity 1 is full
        got = [await ch.recv() for _ in range(4)]
        await task
        assert got == [0, 1, 2, 3]

    asyncio.run(main())


def test_channel_recv_blocks_until_send():
    async def main():
        ch = Channel(1)

        async def late_send():
            await asyncio.sleep(0.01)
            ch.try_send(42)

        asyncio.ensure_future(late_send())
        assert await ch.recv() == 42

    asyncio.run(main())


def test_channel_close_wakes_receivers():
    async def main():
        ch = Channel(1)

        async def closer():
            await asyncio.sleep(0.01)
            ch.close()

        asyncio.ensure_future(closer())
        assert await ch.recv_optional() is None

    asyncio.run(main())


# ---------------------------------------------------------------- registry
class _DummyNode(ProcessorNode):
    KIND = "test::dummy"

    def __init__(self, params):
        self.params = params

    async def run(self, ctx):
        pass


def test_registry_create_and_definitions():
    reg = NodeRegistry()
    reg.register("test::dummy", lambda p: _DummyNode(p), description="a dummy")
    assert reg.contains("test::dummy")
    node = reg.create_node("test::dummy", {"x": 1})
    assert node.params == {"x": 1}
    defs = reg.definitions()
    assert len(defs) == 1 and defs[0].kind == "test::dummy"
    with pytest.raises(ConfigurationError):
        reg.create_node("nope")


# ---------------------------------------------------------------- resources
def test_resource_manager_single_flight_and_lru():
    async def main():
        rm = ResourceManager(ResourcePolicy(max_memory_mb=100))
        loads = []

        def make_loader(name, size):
            async def loader():
                loads.append(name)
                await asyncio.sleep(0.01)
                return name

            return loader

        k1 = ResourceKey.from_params("whisper", {"size": "tiny"})
        # concurrent loads dedupe to one loader call
        vals = await asyncio.gather(
            *[rm.get_or_create(k1, make_loader("tiny", 50), 50) for _ in range(5)]
        )
        assert vals == ["tiny"] * 5
        assert loads == ["tiny"]
        # release refs, then overflow memory → LRU eviction
        for _ in range(5):
            rm.release(k1)
        k2 = ResourceKey.from_params("whisper", {"size": "base"})
        await rm.get_or_create(k2, make_loader("base", 80), 80)
        stats = rm.stats()
        assert stats["evictions"] == 1
        assert stats["entries"] == 1

    asyncio.run(main())


def test_resource_key_stable():
    a = ResourceKey.from_params("k", {"b": 2, "a": 1})
    b = ResourceKey.from_params("k", {"a": 1, "b": 2})
    assert a == b


# ---------------------------------------------------------------- frame pool
def test_frame_pool_reuse():
    pool = AudioFramePool(buckets=(480, 960), max_per_bucket=4)
    frame = pool.acquire_frame(480, AudioFormat(48000, 1))
    frame.release()
    buf2 = pool.acquire(480)
    assert pool.stats()["pooled_hits"] == 1
    assert buf2.shape == (480,)
    assert np.all(buf2 == 0.0)


def test_frame_pool_oversize_not_pooled():
    pool = AudioFramePool(buckets=(480,))
    buf = pool.acquire(100_000)
    assert buf.shape == (100_000,)


# ---------------------------------------------------------------- stats
def test_stats_tracker_throttles():
    fake_now = [0.0]
    sink = Channel(64)
    t = NodeStatsTracker("n", sink, clock=lambda: fake_now[0])
    for _ in range(999):
        t.packet_received()
    assert sink.is_empty  # under both thresholds
    t.packet_received()  # 1000th → flush
    assert sink.qsize() == 1
    t.packet_sent()
    fake_now[0] = 3.0  # time threshold
    t.packet_sent()
    assert sink.qsize() == 2
    update = sink.try_recv()
    assert update.stats.received == 1000


def test_stats_tracker_proc_latency_ewma():
    """receive→send gaps feed the proc_ms EWMA (first sample seeds it);
    a send with no pending receive adds no sample."""
    fake_now = [0.0]
    t = NodeStatsTracker("n", None, clock=lambda: fake_now[0])
    t.packet_received()
    fake_now[0] = 0.010  # 10 ms handling
    t.packet_sent()
    assert t.stats.proc_ms == pytest.approx(10.0)
    t.packet_sent()  # no pending receive — unchanged
    assert t.stats.proc_ms == pytest.approx(10.0)
    t.packet_received()
    fake_now[0] = 0.030  # 20 ms sample → 0.9*10 + 0.1*20
    t.packet_sent()
    assert t.stats.proc_ms == pytest.approx(11.0)
    assert t.stats.to_json()["proc_ms"] == pytest.approx(11.0)
