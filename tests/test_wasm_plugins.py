# SPDX-License-Identifier: Apache-2.0
"""WASM plugin runtime tests: interpreter correctness, guardrails (fuel,
memory cap, OOB traps), the assembled gain plugin, pipeline integration,
and upload via the plugins API (reference crates/plugin-wasm/src/lib.rs)."""

import asyncio
import os
import struct

import numpy as np
import pytest

from streamkit_tpu.plugins.wasm import WasmInstance, load_wasm_plugin
from streamkit_tpu.plugins.wasm_asm import (
    BLOCK,
    BR,
    BR_IF,
    END,
    I32,
    I32_ADD,
    I32_CONST,
    I32_GE_U,
    I64,
    LOCAL_GET,
    LOCAL_SET,
    LOOP,
    VOID,
    WasmModuleBuilder,
    sleb,
)

RT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "build", "libskit_wasm.so"
)
needs_rt = pytest.mark.skipif(not os.path.exists(RT), reason="libskit_wasm.so not built")


def _build_gain_wasm() -> bytes:
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
        "plugins",
        "gain_wasm",
        "build_gain_wasm.py",
    )
    spec = importlib.util.spec_from_file_location("build_gain_wasm", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.build()


@needs_rt
def test_add_function():
    b = WasmModuleBuilder()
    f = b.add_func(
        [I32, I32], [I32], bytes([LOCAL_GET, 0, LOCAL_GET, 1, I32_ADD, END])
    )
    b.export_func("add", f)
    inst = WasmInstance(b.build())
    assert inst.call("add", 2, 40) == [42]
    assert inst.call("add", -5 & 0xFFFFFFFF, 3)[0] & 0xFFFFFFFF == (-2 & 0xFFFFFFFF)


@needs_rt
def test_fuel_exhaustion_stops_infinite_loop():
    b = WasmModuleBuilder()
    f = b.add_func([], [], bytes([BLOCK, VOID, LOOP, VOID, BR, 0, END, END, END]))
    b.export_func("spin", f)
    inst = WasmInstance(b.build(), fuel=10_000)
    with pytest.raises(RuntimeError, match="fuel"):
        inst.call("spin", nresults=0)


@needs_rt
def test_oob_memory_access_traps():
    from streamkit_tpu.plugins.wasm_asm import I32_LOAD, memarg

    b = WasmModuleBuilder()
    f = b.add_func(
        [I32], [I32], bytes([LOCAL_GET, 0, I32_LOAD]) + memarg(2, 0) + bytes([END])
    )
    b.export_func("peek", f)
    inst = WasmInstance(b.build())
    assert inst.call("peek", 0) == [0]
    with pytest.raises(RuntimeError, match="memory"):
        inst.call("peek", 1 << 30)


@needs_rt
def test_memory_cap_64mib():
    """memory.grow beyond the 64 MiB cap must fail (return -1), mirroring the
    reference store limit (plugin-wasm/src/lib.rs:40-57)."""
    from streamkit_tpu.plugins.wasm_asm import MEMORY_GROW

    b = WasmModuleBuilder()
    f = b.add_func([I32], [I32], bytes([LOCAL_GET, 0, MEMORY_GROW, 0, END]))
    b.export_func("grow", f)
    inst = WasmInstance(b.build())
    assert inst.call("grow", 10)[0] != 0xFFFFFFFF  # 10 pages OK
    assert inst.call("grow", 2048)[0] & 0xFFFFFFFF == 0xFFFFFFFF  # +128 MiB refused


@needs_rt
def test_gain_plugin_process():
    wasm = _build_gain_wasm()
    inst = WasmInstance(wasm)
    samples = np.array([0.5, -1.0, 0.25, 2.0], np.float32)
    out = inst.process(samples.tobytes(), [3.0])
    result = np.frombuffer(out, np.float32)
    np.testing.assert_allclose(result, samples * 3.0, rtol=1e-6)
    # large payload crossing page boundaries (forces memory.grow)
    big = np.linspace(-1, 1, 200_000).astype(np.float32)
    out = inst.process(big.tobytes(), [0.5])
    np.testing.assert_allclose(np.frombuffer(out, np.float32), big * 0.5, rtol=1e-6)


@needs_rt
def test_wasm_node_in_pipeline():
    """plugin::wasm::gain node transforms packets inside a dynamic engine."""
    from streamkit_tpu.core import NodeRegistry, Packet
    from streamkit_tpu.engine.dynamic import DynamicEngineConfig, start_dynamic_engine
    from streamkit_tpu.nodes import register_nodes

    wasm_path = os.path.join(os.path.dirname(RT), "gain.wasm")
    if not os.path.exists(wasm_path):
        with open(wasm_path, "wb") as f:
            f.write(_build_gain_wasm())

    async def main():
        reg = NodeRegistry()
        register_nodes(reg)
        plugin = load_wasm_plugin(reg, wasm_path)
        assert plugin.kind == "plugin::wasm::gain"

        import tempfile
        import wave

        x = np.array([0.1, 0.2, -0.3, 0.4] * 100, np.float32)
        src = tempfile.NamedTemporaryFile(suffix=".bin", delete=False)
        src.write(x.tobytes())
        src.close()
        dst = tempfile.NamedTemporaryFile(suffix=".bin", delete=False)
        dst.close()

        handle = start_dynamic_engine(reg, DynamicEngineConfig(session_id="wasm"))
        await handle.add_node("reader", "core::file_reader", {"path": src.name})
        await handle.add_node("gain", "plugin::wasm::gain", {"gain": 2.0})
        await handle.add_node("writer", "core::file_writer", {"path": dst.name})
        await handle.connect("reader", "out", "gain", "in")
        await handle.connect("gain", "out", "writer", "in")
        for _ in range(400):
            await asyncio.sleep(0.05)
            if os.path.getsize(dst.name) >= x.nbytes:
                break
        await handle.shutdown_and_wait()
        out = np.frombuffer(open(dst.name, "rb").read(), np.float32)
        os.unlink(src.name)
        os.unlink(dst.name)
        return x, out

    x, out = asyncio.run(main())
    assert len(out) == len(x)
    np.testing.assert_allclose(out, x * 2.0, rtol=1e-6)


@needs_rt
def test_upload_wasm_plugin_via_api(tmp_path):
    from aiohttp import FormData
    from aiohttp.test_utils import TestClient, TestServer

    from streamkit_tpu.server import ServerConfig, create_app

    async def main():
        cfg = ServerConfig()
        cfg.plugins_dir = str(tmp_path)
        cfg.moq_port = 0
        app = create_app(cfg)
        client = TestClient(TestServer(app))
        await client.start_server()

        form = FormData()
        form.add_field("file", _build_gain_wasm(), filename="wgain.wasm")
        resp = await client.post("/api/v1/plugins", data=form)
        doc = await resp.json()
        assert resp.status == 201, doc
        assert doc["kind"] == "plugin::wasm::wgain"

        resp = await client.get("/api/v1/plugins")
        plugins = (await resp.json())["plugins"]
        assert any(p["kind"] == "plugin::wasm::wgain" and p["runtime"] == "wasm" for p in plugins)

        resp = await client.delete("/api/v1/plugins/plugin::wasm::wgain")
        assert resp.status == 200
        await client.close()

    asyncio.run(main())


@needs_rt
def test_unbounded_recursion_traps_not_segfaults():
    """A self-calling function must trap on the interpreter's call-depth
    limit (~1000 frames) long before the host C stack overflows — the
    sandbox contract wasmtime enforces via store/stack limits
    (reference plugin-wasm/src/lib.rs:40-57)."""
    from streamkit_tpu.plugins.wasm_asm import CALL

    b = WasmModuleBuilder()
    f = b.add_func([], [], bytes([CALL, 0, END]))
    b.export_func("recurse", f)
    inst = WasmInstance(b.build(), fuel=1_000_000_000)
    with pytest.raises(RuntimeError, match="call stack"):
        inst.call("recurse", nresults=0)


@needs_rt
def test_truncated_f32_const_body_traps():
    """An f32.const immediate cut off by the function-body end must trap
    ('eof'), not read host-heap bytes past the module buffer."""
    # body: f32.const <only 2 of 4 bytes> — assembler would pad, so build
    # the truncated body by hand and fix up the code-section size.
    from streamkit_tpu.plugins.wasm_asm import F32_CONST

    b = WasmModuleBuilder()
    f = b.add_func([], [I32], bytes([F32_CONST, 0x00, 0x00, END]))
    b.export_func("bad", f)
    inst = WasmInstance(b.build())
    with pytest.raises(RuntimeError, match="eof|trunc|stack"):
        inst.call("bad")


@needs_rt
def test_multiple_active_data_segments_all_applied():
    """Every active data segment must be copied into memory — a module with
    two segments (as wasm-ld emits without segment merging) must see both."""
    from streamkit_tpu.plugins.wasm_asm import I32_LOAD8_U, memarg

    b = WasmModuleBuilder()
    b.set_memory(1)
    b.add_data(16, bytes([0xAA]))
    b.add_data(32, bytes([0xBB]))
    f = b.add_func(
        [I32], [I32], bytes([LOCAL_GET, 0, I32_LOAD8_U]) + memarg(0, 0) + bytes([END])
    )
    b.export_func("peek8", f)
    inst = WasmInstance(b.build())
    assert inst.call("peek8", 16) == [0xAA]
    assert inst.call("peek8", 32) == [0xBB]
