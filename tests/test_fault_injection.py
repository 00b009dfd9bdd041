# SPDX-License-Identifier: Apache-2.0
"""Fault injection: a node crashing mid-stream must not take the session
down — the engine marks it FAILED, fans the state out to subscribers,
downstream nodes drain and stop, and the session stays controllable
(query/remove/shutdown). Reference analog: dynamic_actor keeps serving
control messages after a node task errors."""

import asyncio

import numpy as np
import pytest

from streamkit_tpu.core import (
    AudioFormat,
    AudioFrame,
    InputPin,
    NodeRegistry,
    OutputPin,
    Packet,
    PacketType,
    ProcessorNode,
)
from streamkit_tpu.core.state import NodeStateKind
from streamkit_tpu.engine.dynamic import DynamicEngineConfig, start_dynamic_engine
from streamkit_tpu.nodes import register_nodes


class CrashAfterN(ProcessorNode):
    """Passes through N packets, then raises."""

    KIND = "test::crash_after_n"

    def __init__(self, params):
        self.n = int((params or {}).get("n", 3))

    def input_pins(self):
        return [InputPin("in", [PacketType.raw_audio(AudioFormat(16000, 0))])]

    def output_pins(self):
        return [OutputPin("out", PacketType.raw_audio(AudioFormat(16000, 1)))]

    async def run(self, ctx):
        seen = 0
        while True:
            pkt = await ctx.recv_with_cancellation("in")
            if pkt is None:
                break
            seen += 1
            if seen > self.n:
                raise RuntimeError("injected fault")
            await ctx.output.send("out", pkt)


class SlowSource(ProcessorNode):
    """Emits audio packets forever (until output closes)."""

    KIND = "test::slow_source"

    def __init__(self, params):
        pass

    def input_pins(self):
        return []

    def output_pins(self):
        return [OutputPin("out", PacketType.raw_audio(AudioFormat(16000, 1)))]

    async def run(self, ctx):
        from streamkit_tpu.core import ChannelClosed

        fmt = AudioFormat(16000, 1)
        try:
            for _ in range(10_000):
                await ctx.output.send(
                    "out", Packet.new_audio(AudioFrame(np.zeros(320, np.float32), fmt))
                )
                await asyncio.sleep(0.001)
        except ChannelClosed:
            pass


class CountSink(ProcessorNode):
    KIND = "test::count_sink"
    counts: dict = {}

    def __init__(self, params):
        self.key = (params or {}).get("key", "default")

    def input_pins(self):
        return [InputPin("in", [PacketType.raw_audio(AudioFormat(16000, 0))])]

    def output_pins(self):
        return []

    async def run(self, ctx):
        n = 0
        while True:
            pkt = await ctx.recv_with_cancellation("in")
            if pkt is None:
                break
            n += 1
        CountSink.counts[self.key] = n


@pytest.fixture()
def registry():
    reg = NodeRegistry()
    register_nodes(reg)
    reg.register(CrashAfterN.KIND, CrashAfterN)
    reg.register(SlowSource.KIND, SlowSource)
    reg.register(CountSink.KIND, CountSink)
    return reg


def test_node_crash_isolates_and_session_stays_live(registry):
    async def main():
        handle = start_dynamic_engine(registry, DynamicEngineConfig(session_id="fi1"))
        states_ch = await handle.subscribe_state()
        await handle.add_node("src", "test::slow_source")
        await handle.add_node("boom", "test::crash_after_n", {"n": 3})
        await handle.add_node("sink", "test::count_sink", {"key": "fi1"})
        await handle.connect("src", "out", "boom", "in")
        await handle.connect("boom", "out", "sink", "in")

        # wait for the injected crash to surface as a FAILED state
        failed_seen = False
        for _ in range(400):
            await asyncio.sleep(0.01)
            states = await handle.get_node_states()
            if states.get("boom") and states["boom"].kind == NodeStateKind.FAILED:
                failed_seen = True
                break
        assert failed_seen, f"crash not surfaced: {await handle.get_node_states()}"
        assert "injected fault" in (states["boom"].reason or "")

        # the state fan-out carried the failure to subscribers
        from streamkit_tpu.core import ChannelFull

        saw_failed_event = False
        while True:
            try:
                upd = states_ch.try_recv()
            except ChannelFull:  # empty — try_recv reuses it as "would block"
                break
            if upd.node_name == "boom" and upd.state.kind == NodeStateKind.FAILED:
                saw_failed_event = True
        assert saw_failed_event, "FAILED state update not fanned out"

        # downstream drains and stops (its input closed when boom died)
        for _ in range(400):
            await asyncio.sleep(0.01)
            states = await handle.get_node_states()
            if states["sink"].kind == NodeStateKind.STOPPED:
                break
        else:
            raise AssertionError(f"sink did not stop: {await handle.get_node_states()}")
        assert CountSink.counts.get("fi1", 0) == 3  # exactly the pre-fault packets

        # session remains controllable: query, remove the failed node, shutdown
        pipeline = await handle.get_pipeline()
        assert set(pipeline["nodes"]) == {"src", "boom", "sink"}
        await handle.remove_node("boom")
        pipeline = await handle.get_pipeline()
        assert "boom" not in pipeline["nodes"]
        await handle.shutdown_and_wait()

    asyncio.run(main())


def test_source_survives_until_shutdown_after_downstream_crash(registry):
    """The upstream of a crashed node keeps running (its sends go nowhere
    once the distributor prunes the closed downstream) and shuts down
    cleanly on request — no deadlock, no unhandled-exception teardown."""

    async def main():
        handle = start_dynamic_engine(registry, DynamicEngineConfig(session_id="fi2"))
        await handle.add_node("src", "test::slow_source")
        await handle.add_node("boom", "test::crash_after_n", {"n": 2})
        await handle.connect("src", "out", "boom", "in")

        for _ in range(400):
            await asyncio.sleep(0.01)
            states = await handle.get_node_states()
            if states["boom"].kind == NodeStateKind.FAILED:
                break
        else:
            raise AssertionError("crash not surfaced")

        # src is still alive (not failed/stopped — test nodes don't emit
        # RUNNING themselves, so INITIALIZING counts as alive) and the
        # session shuts down cleanly — no deadlock on the dead downstream
        await asyncio.sleep(0.05)
        states = await handle.get_node_states()
        assert states["src"].kind not in (NodeStateKind.FAILED,)
        await asyncio.wait_for(handle.shutdown_and_wait(), timeout=10)

    asyncio.run(main())
