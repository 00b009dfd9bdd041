# SPDX-License-Identifier: Apache-2.0
"""Component-model WASM host tests.

Covers: binary-grammar parity against the reference's own WIT package
binary (sdks/plugin-sdk/wit/streamkit-plugin.wasm), canonical-ABI
lift/lower in both flat and memory form, the end-to-end gain plugin
component (build -> parse -> instantiate -> canon calls -> host
send-output), the pipeline node adapter, API upload, and hostile inputs.
Reference host: crates/plugin-wasm/src/lib.rs + wit/plugin.wit:83-130.
"""

import asyncio
import os

import numpy as np
import pytest

from streamkit_tpu.plugins.component import (
    ComponentError,
    ComponentInstance,
    Resource,
    describe_wit_package,
    flatten_type,
    parse_component,
    size_align,
    wit_plugin_world,
)
from streamkit_tpu.plugins.component_asm import (
    HOST_IFACE,
    NODE_IFACE,
    build_gain_component,
    lower_static,
)

RT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "build", "libskit_wasm.so",
)
needs_rt = pytest.mark.skipif(not os.path.exists(RT), reason="libskit_wasm.so not built")

WIT_PKG = "/root/reference/sdks/plugin-sdk/wit/streamkit-plugin.wasm"
needs_ref = pytest.mark.skipif(not os.path.exists(WIT_PKG), reason="reference WIT package absent")


# ---------------------------------------------------------------- grammar


@needs_ref
def test_reference_wit_package_parses():
    """Our type/export-section grammar decodes the reference's own binary
    WIT package — interfaces, funcs, resource methods, and the full world
    (including its WASI import graph) parse without error."""
    d = describe_wit_package(open(WIT_PKG, "rb").read())
    host = d["host"]["streamkit:plugin/host@0.1.0"]
    assert set(host["funcs"]) == {"send-output", "log"}
    node = d["node"]["streamkit:plugin/node@0.1.0"]
    assert set(node["funcs"]) == {
        "metadata",
        "[constructor]node-instance",
        "[method]node-instance.process",
        "[method]node-instance.update-params",
        "[method]node-instance.cleanup",
    }
    # node-instance is a genuine resource type; constructor returns own<it>
    assert isinstance(node["types"]["node-instance"], Resource)
    ctor = node["funcs"]["[constructor]node-instance"]
    assert ctor[0] == "func" and ctor[2][0] == "own"
    # process(self: borrow, input-pin: string, packet) -> result<_, string>
    proc = node["funcs"]["[method]node-instance.process"]
    pnames = [p[0] for p in proc[1]]
    assert pnames == ["self", "input-pin", "packet"]
    assert proc[1][0][1][0] == "borrow"
    assert proc[2][0] == "result" and proc[2][1] is None and proc[2][2] == "string"
    # packet-type variant arms (this WIT snapshot predates `custom`)
    types = d["types"]["streamkit:plugin/types@0.1.0"]["types"]
    arms = [c[0] for c in types["packet-type"][1]]
    assert arms[:4] == ["raw-audio", "opus-audio", "text", "binary"]
    # log is (level: enum, message: string) -> ()
    log = host["funcs"]["log"]
    assert log[1][0][1][0] == "enum" and log[2] is None


def test_flatten_and_size_rules():
    w = wit_plugin_world()
    # packet: disc + 5 joined slots (custom-packet is the widest case)
    assert len(flatten_type(w["packet"])) == 6
    # audio-frame: u32 + u16 + list -> 4 core values
    assert flatten_type(w["audio-frame"]) == ["i32", "i32", "i32", "i32"]
    # result<_, string> -> disc + 2 > MAX_FLAT_RESULTS (spills)
    assert len(flatten_type(("result", None, "string"))) == 3
    # audio-format memory layout: u32@0, u16@4, enum-u8@6, size 8 align 4
    assert size_align(w["audio-format"]) == (8, 4)
    # packet-type: 1-byte disc, payload at 4, max payload 8 -> 12/4
    assert size_align(w["packet-type"]) == (12, 4)
    assert size_align("string") == (8, 4)
    assert size_align(("own", w["node-instance"])) == (4, 4)


def test_cabi_memory_roundtrip():
    """store/load agree for a nested value (records, variants, options,
    results, lists, strings, chars, u64) — the memory half of the ABI."""
    from streamkit_tpu.plugins.component import _Cabi
    from streamkit_tpu.plugins.component_asm import _StaticMemory

    t = (
        "record",
        (
            ("name", "string"),
            ("tags", ("list", "string")),
            ("pos", ("tuple", ("u32", "s64"))),
            ("flag", ("option", "f64")),
            ("st", ("result", "u8", "string")),
            ("mode", ("enum", ("a", "b", "c"))),
            ("caps", ("flags", ("x", "y", "z"))),
            ("ch", "char"),
            ("blob", ("list", "u8")),
        ),
    )
    v = {
        "name": "héllo",
        "tags": ["a", "bb", ""],
        "pos": (7, -(1 << 40)),
        "flag": 2.5,
        "st": ("error", "nope"),
        "mode": "c",
        "caps": {"x", "z"},
        "ch": "λ",
        "blob": b"\x00\x01\xff",
    }
    sm = _StaticMemory(0x100)
    cabi = _Cabi(sm)
    size, align = size_align(t)
    ptr = sm.call_core("cabi_realloc", 0, 0, align, size)[0]
    cabi.store(t, v, ptr)
    assert cabi.load(t, ptr) == v


def test_static_metadata_blob_layout():
    """lower_static produces a blob the loader's reader decodes back."""
    from streamkit_tpu.plugins.component import _Cabi
    from streamkit_tpu.plugins.component_asm import _StaticMemory

    w = wit_plugin_world()
    value = {
        "kind": "plugin::wasm::x",
        "inputs": [{"name": "in", "accepts-types": [("text", None)]}],
        "outputs": [{"name": "out", "produces-type": ("text", None)}],
        "param-schema": "{}",
        "categories": ["t"],
    }
    base = 0x2000
    ptr, blob = lower_static(w["node-metadata"], value, base)
    assert ptr == base
    sm = _StaticMemory(base)
    sm.full[base : base + len(blob)] = blob
    assert _Cabi(sm).load(w["node-metadata"], ptr) == value


# ------------------------------------------------------------- end-to-end


@needs_rt
def test_gain_component_end_to_end():
    comp = build_gain_component()
    assert comp[:8] == b"\x00asm\x0d\x00\x01\x00"
    pc = parse_component(comp)
    funcs = pc.export_instance_funcs(NODE_IFACE)
    assert set(funcs) >= {"metadata", "[constructor]node-instance",
                          "[method]node-instance.process"}

    sent = []
    inst = ComponentInstance(
        pc,
        host_funcs={(HOST_IFACE, "send-output"):
                    lambda pin, pkt: (sent.append((pin, pkt)), ("ok", None))[1]},
    )
    meta = inst.call_lifted(funcs["metadata"])
    assert meta["kind"] == "plugin::wasm::gain"
    assert meta["inputs"][0]["name"] == "in"
    assert meta["outputs"][0]["produces-type"][0] == "raw-audio"

    h = inst.call_lifted(funcs["[constructor]node-instance"], "3")
    # methods take the BORROW HANDLE as self (the guest unwraps it through
    # canon [resource-rep], like real wit-bindgen output)
    res = inst.call_lifted(
        funcs["[method]node-instance.process"], h, "in",
        ("audio", {"sample-rate": 16000, "channels": 1,
                   "samples": [1.0, 2.0, -0.5]}),
    )
    assert res == ("ok", None)
    pin, pkt = sent[0]
    assert pin == "out" and pkt[0] == "audio"
    assert pkt[1]["samples"] == [3.0, 6.0, -1.5]
    assert pkt[1]["sample-rate"] == 16000

    # live param update through the lifted method
    assert inst.call_lifted(
        funcs["[method]node-instance.update-params"], h, "5"
    ) == ("ok", None)
    sent.clear()
    inst.call_lifted(
        funcs["[method]node-instance.process"], h, "in",
        ("audio", {"sample-rate": 8000, "channels": 1, "samples": [2.0]}),
    )
    assert sent[0][1][1]["samples"] == [10.0]

    # non-audio packets are accepted but not transformed/re-emitted
    sent.clear()
    res = inst.call_lifted(
        funcs["[method]node-instance.process"], h, "in", ("text", "hi"),
    )
    assert res == ("ok", None) and sent == []

    inst.call_lifted(funcs["[method]node-instance.cleanup"], h)


@needs_rt
def test_resource_handle_table():
    comp = build_gain_component()
    pc = parse_component(comp)
    funcs = pc.export_instance_funcs(NODE_IFACE)
    inst = ComponentInstance(pc)
    ni = pc.parsed_resource()
    h1 = inst.call_lifted(funcs["[constructor]node-instance"], None)
    h2 = inst.call_lifted(funcs["[constructor]node-instance"], "7")
    assert h1 != h2
    assert set(inst.handles[ni]) == {h1, h2}
    # distinct state: h2's gain is 7, h1's stays 1
    import struct as _s

    mem = inst.core.memory()
    g1 = _s.unpack("<f", mem[inst.handles[ni][h1]: inst.handles[ni][h1] + 4])[0]
    g2 = _s.unpack("<f", mem[inst.handles[ni][h2]: inst.handles[ni][h2] + 4])[0]
    assert (g1, g2) == (1.0, 7.0)


@needs_rt
def test_missing_host_function_traps_cleanly():
    comp = build_gain_component()
    pc = parse_component(comp)
    funcs = pc.export_instance_funcs(NODE_IFACE)
    inst = ComponentInstance(pc)  # no send-output provided
    h = inst.call_lifted(funcs["[constructor]node-instance"], None)
    with pytest.raises(ComponentError, match="send-output not provided"):
        inst.call_lifted(
            funcs["[method]node-instance.process"], h, "in",
            ("audio", {"sample-rate": 1, "channels": 1, "samples": [0.0]}),
        )


def test_hostile_binaries_rejected():
    with pytest.raises(ComponentError, match="magic"):
        parse_component(b"nope")
    with pytest.raises(ComponentError, match="layer"):
        parse_component(b"\x00asm\x01\x00\x00\x00")  # core module, not component
    comp = build_gain_component()
    with pytest.raises(ComponentError):
        parse_component(comp[: len(comp) // 2])
    # flipped section id inside → parse error, not crash
    bad = bytearray(comp)
    bad[8] = 99
    with pytest.raises(ComponentError):
        parse_component(bytes(bad))


# ----------------------------------------------------------- node adapter


@needs_rt
def test_component_node_processes_audio_packets():
    from streamkit_tpu.core import (
        AudioFormat,
        AudioFrame,
        Channel,
        NodeContext,
        NodeRegistry,
        OutputSender,
        Packet,
    )
    from streamkit_tpu.plugins.wasm import load_wasm_plugin

    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".wasm", delete=False) as f:
        f.write(build_gain_component())
        path = f.name
    try:
        reg = NodeRegistry()
        plugin = load_wasm_plugin(reg, path)
        assert plugin.kind == "plugin::wasm::gain"  # from component metadata
        node = reg.create_node(plugin.kind, {"gain": 2})

        async def main():
            inputs = {p.name: Channel(16) for p in node.input_pins()}
            out_ch = Channel(64)
            ctx = NodeContext(
                node_name="g",
                inputs=inputs,
                output=OutputSender("g", direct={p.name: out_ch for p in node.output_pins()}),
            )
            fmt = AudioFormat(sample_rate=16000, channels=1)
            x = np.array([0.25, -0.5, 1.0], np.float32)
            await inputs["in"].send(Packet.new_audio(AudioFrame(x, fmt)))
            inputs["in"].close()
            await node.run(ctx)
            return await out_ch.recv_optional()

        out = asyncio.run(main())
        assert out is not None and out.audio is not None
        # the adapter passes params as JSON; the fixture guest scans for
        # the first digit, so {"gain": 2} applies gain 2
        np.testing.assert_allclose(out.audio.samples, [0.5, -1.0, 2.0])
        assert out.audio.format.sample_rate == 16000
    finally:
        os.unlink(path)


@needs_rt
def test_upload_component_plugin_via_api(tmp_path):
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
        form.add_field("file", build_gain_component(), filename="cgain.wasm")
        resp = await client.post("/api/v1/plugins", data=form)
        doc = await resp.json()
        assert resp.status == 201, doc
        assert doc["kind"] == "plugin::wasm::gain"
        await client.close()

    asyncio.run(main())


def test_component_parser_fuzz_never_crashes():
    """Byte-flip fuzz over the valid component: the parser must either
    parse or raise ComponentError/UnicodeDecodeError — never crash or
    hang (the upload endpoint feeds it attacker bytes)."""
    import random

    comp = bytearray(build_gain_component())
    rng = random.Random(0)
    for trial in range(300):
        mutated = bytearray(comp)
        for _ in range(rng.randint(1, 8)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        try:
            parse_component(bytes(mutated))
        except (ComponentError, UnicodeDecodeError):
            pass
    # truncations at every section boundary region
    for cut in range(8, len(comp), 97):
        try:
            parse_component(bytes(comp[:cut]))
        except (ComponentError, UnicodeDecodeError):
            pass


@needs_rt
def test_post_returns_invoked_after_lift():
    """wit-bindgen structural parity: the fixture guest exports
    ``cabi_post_*`` post-returns (as the reference's generated bindings do
    — plugin.rs export_name attributes), the component's canon lifts carry
    canonopt 0x05, and the host invokes the post AFTER lifting each call's
    results. The guest's post poisons the result area (0xEE discriminant),
    so a host that lifted after post-return would fail deterministically —
    repeated calls below double as the ordering proof."""
    comp = build_gain_component()
    pc = parse_component(comp)
    funcs = pc.export_instance_funcs(NODE_IFACE)
    # the lifts carry post-return options
    posted = [n for n, f in funcs.items()
              if f[0] == "lift" and "post-return" in f[2]]
    assert set(posted) >= {"metadata", "[method]node-instance.process",
                           "[method]node-instance.update-params"}

    inst = ComponentInstance(
        pc,
        host_funcs={(HOST_IFACE, "send-output"): lambda pin, pkt: ("ok", None)},
    )
    calls = []
    orig = inst.call_core

    def spy(name, *a, **k):
        calls.append(name)
        return orig(name, *a, **k)

    inst.call_core = spy
    inst.call_lifted(funcs["metadata"])
    h = inst.call_lifted(funcs["[constructor]node-instance"], "2")
    for _ in range(3):
        res = inst.call_lifted(
            funcs["[method]node-instance.process"], h, "in",
            ("audio", {"sample-rate": 16000, "channels": 1, "samples": [1.0]}),
        )
        assert res == ("ok", None)  # poison from the PREVIOUS post never leaks
    post_meta = [c for c in calls if c == f"cabi_post_{NODE_IFACE}#metadata"]
    post_proc = [
        c for c in calls
        if c == f"cabi_post_{NODE_IFACE}#[method]node-instance.process"
    ]
    assert len(post_meta) == 1
    assert len(post_proc) == 3
    # ordering: the post for each process call comes after its main call
    main_i = [i for i, c in enumerate(calls)
              if c == f"{NODE_IFACE}#[method]node-instance.process"]
    post_i = [i for i, c in enumerate(calls)
              if c == f"cabi_post_{NODE_IFACE}#[method]node-instance.process"]
    assert all(p > m for m, p in zip(main_i, post_i))
