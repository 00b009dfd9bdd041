# SPDX-License-Identifier: Apache-2.0
"""Headless browser e2e: the web UI's ACTUAL JavaScript executes under the
package's own JS interpreter against a DOM shim, talking real HTTP + WS to
the real server (reference drives the same flows with Playwright —
``e2e/tests/monitor.spec.ts``, ``design.spec.ts``; no browser ships in this
image, so the rendering engine is the only mocked part).

Flows covered: script boot + live WS status, tab switching, YAML validate
round-trip, palette from the live schema endpoint, session create →
monitor live graph → destroy, oneshot convert through multipart upload,
sample list → load-into-designer, design persistence via localStorage,
and editor drag-drop + port wiring."""

from __future__ import annotations

import os
import socket
import sys
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e.harness import HeadlessBrowser, ServerThread  # noqa: E402
from streamkit_tpu.server import ServerConfig  # noqa: E402


def _free_udp_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("media") / "tone.wav"
    sr = 16000
    t = np.arange(sr) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * 0.4 * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return str(path)


@pytest.fixture(scope="module")
def server(wav_path):
    cfg = ServerConfig()
    cfg.moq_port = _free_udp_port()
    cfg.allowed_file_paths = [os.path.dirname(wav_path)]
    srv = ServerThread(cfg)
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture()
def browser(server):
    b = HeadlessBrowser(server)
    b.open("/")
    assert b.pump_until(lambda: b.by_id("ws-status")._get_text() == "live", 15), (
        "control WS never connected"
    )
    return b


def test_boot_ws_live_and_views(browser):
    # all four nav views exist; stream view starts inactive, monitor clickable
    for view in ("design", "monitor", "convert", "stream"):
        assert browser.by_id(f"{view}-view") is not None
    nav = browser.doc.query_selector('nav a[data-view="monitor"]')
    nav.dispatch("click")
    assert "active" in browser.by_id("monitor-view")._classes()
    assert "active" not in browser.by_id("design-view")._classes()


def test_palette_renders_node_kinds_from_live_schema(browser):
    assert browser.pump_until(
        lambda: len(browser.by_id("palette").element_children()) > 20, 10
    ), "palette never populated from /api/v1/schema/nodes"
    texts = browser.by_id("palette")._get_text()
    assert "core::passthrough" in texts or "passthrough" in texts


def test_validate_yaml_roundtrip_and_editor_import(browser):
    browser.by_id("design-yaml")["value"] = (
        "mode: oneshot\nsteps:\n"
        "  - kind: streamkit::http_input\n"
        "  - kind: audio::gain\n    params: {gain: 2.0}\n"
        "  - kind: streamkit::http_output\n"
    )
    browser.by_id("btn-validate").dispatch("click")
    assert browser.pump_until(
        lambda: "valid" in browser.by_id("design-result")._get_text(), 10
    )
    assert "3 nodes" in browser.by_id("design-result")._get_text()
    # validate imports the compiled pipeline into the graph editor
    nodes = browser.by_id("editor").query_selector_all("g[data-node]")
    assert len(nodes) == 3


def test_invalid_yaml_shows_error(browser):
    browser.by_id("design-yaml")["value"] = "mode: oneshot\nsteps:\n  - kind: no::such_node\n"
    browser.by_id("btn-validate").dispatch("click")
    assert browser.pump_until(
        lambda: "✗" in browser.by_id("design-result")._get_text(), 10
    )


def test_session_lifecycle_and_monitor_graph(browser, wav_path):
    # create a dynamic session from the Design view (file_reader → sink,
    # the reference e2e's plugin-free pipeline — monitor.spec.ts:13-20)
    browser.by_id("sample-name")["value"] = "e2e-mon"
    browser.by_id("design-yaml")["value"] = (
        "mode: dynamic\nnodes:\n"
        "  src:\n    kind: core::file_reader\n"
        f'    params: {{path: "{wav_path}"}}\n'
        "  out:\n    kind: core::sink\n    needs: src\n"
    )
    browser.by_id("btn-design-session").dispatch("click")
    assert browser.pump_until(
        lambda: "session created" in browser.by_id("design-result")._get_text(), 15
    ), browser.by_id("design-result")._get_text()

    # the sessioncreated WS event refreshes the session lists
    assert browser.pump_until(
        lambda: "e2e-mon" in browser.by_id("mon-sessions")._get_text(), 10
    )
    # click the session card → live pipeline graph renders nodes + states
    card = None
    for el in browser.by_id("mon-sessions").element_children():
        if "e2e-mon" in el._get_text():
            card = el
            break
    assert card is not None
    card.dispatch("click")
    assert browser.pump_until(
        lambda: len(browser.by_id("mon-pipeline").query_selector_all("g[data-node]")) == 2,
        10,
    ), browser.by_id("mon-pipeline")._get_inner_html()[:300]
    graph_text = browser.by_id("mon-pipeline")._get_text()
    assert "src" in graph_text and "out" in graph_text
    assert "core::file_reader" in graph_text

    # node click opens the live tuner panel
    g = browser.by_id("mon-pipeline").query_selector_all("g[data-node]")[0]
    g.dispatch("click")
    browser.pump(0.5)
    assert browser.by_id("mon-tune")._get_text() != "click a node in the graph"

    # destroy from the Stream view session list; sessiondestroyed refreshes
    destroy = None
    for el in browser.by_id("stream-sessions").iter_tree():
        if el.tag == "button" and el._get_text() == "destroy":
            destroy = el
            break
    assert destroy is not None
    destroy.dispatch("click")
    assert browser.pump_until(
        lambda: "e2e-mon" not in browser.by_id("mon-sessions")._get_text(), 15
    )


def test_convert_oneshot_audio_roundtrip(browser, wav_path):
    """The Convert view runs a real oneshot through multipart upload and
    renders the audio result (UI → POST /api/v1/process → wav out)."""
    browser.by_id("convert-yaml")["value"] = (
        "mode: oneshot\nsteps:\n"
        "  - kind: streamkit::http_input\n"
        "  - kind: containers::wav::demuxer\n"
        "  - kind: audio::gain\n    params: {gain: 0.5}\n"
        "  - kind: containers::wav::muxer\n"
        "  - kind: streamkit::http_output\n"
    )
    # attach a "file" (the DOM shim's file objects carry bytes + name)
    from streamkit_tpu.utils.mjs import JSArray, JSObject

    f = JSObject()
    f["_bytes"] = open(wav_path, "rb").read()
    f["name"] = "tone.wav"
    f["type"] = "audio/wav"
    browser.by_id("convert-file")["_files"] = JSArray([f])
    browser.by_id("btn-convert").dispatch("click")
    assert browser.pump_until(
        lambda: browser.by_id("convert-status")._get_text() in ("done",)
        or "error" in browser.by_id("convert-status")._get_text()
        or "failed" in browser.by_id("convert-status")._get_text(),
        30,
    )
    assert browser.by_id("convert-status")._get_text() == "done", (
        browser.by_id("convert-status")._get_text()
        + " | "
        + browser.by_id("convert-out")._get_text()[:300]
    )
    # audio branch rendered a player + download link
    html = browser.by_id("convert-out")._get_inner_html()
    assert "<audio" in html and "download" in html


def test_samples_list_loads_into_designer(browser):
    assert browser.pump_until(
        lambda: len(browser.by_id("sample-list").element_children()) > 0, 10
    ), "sample list never populated"
    load_btn = None
    for el in browser.by_id("sample-list").iter_tree():
        if el.tag == "button" and "Design" in el._get_text():
            load_btn = el
            break
    assert load_btn is not None
    load_btn.dispatch("click")
    browser.pump(0.3)
    assert browser.by_id("design-yaml")["value"].strip() != ""
    assert "active" in browser.by_id("design-view")._classes()


def test_editor_drag_drop_wire_and_persistence(browser, server):
    """Drag a kind onto the canvas, wire two nodes port-to-port (validated
    through the real compiler), and confirm localStorage persistence
    restores the graph in a fresh page load."""
    from streamkit_tpu.utils.mjs import JSObject

    browser.eval("ed.nodes = []; ed.edges = []; ed.sel = null; ed.render()")
    svg = browser.by_id("editor")

    def drop(kind, x, y):
        dt = JSObject()
        dt["getData"] = lambda *_a: kind
        svg.dispatch("drop", {"offsetX": x, "offsetY": y, "dataTransfer": dt})

    drop("core::passthrough", 60, 40)
    drop("core::sink", 60, 160)
    browser.pump(0.2)
    assert len(svg.query_selector_all("g[data-node]")) == 2

    # wire passthrough.out → sink.in: mousedown on the out-port, mouseup on
    # the in-port (the svg handlers use closest([data-outport]))
    browser.by_id("ed-mode")["value"] = "dynamic"
    outport = svg.query_selector("[data-outport]")
    inports = svg.query_selector_all("[data-inport]")
    assert outport is not None and inports
    # target the sink's input, not the passthrough's own
    sink_in = [p for p in inports if p.attrs["data-inport"].startswith("sink")]
    assert sink_in
    outport.dispatch("mousedown", {"offsetX": 60, "offsetY": 40})
    sink_in[0].dispatch("mouseup", {})
    assert browser.pump_until(
        lambda: "wired" in browser.by_id("ed-status")._get_text(), 10
    ), browser.by_id("ed-status")._get_text()
    assert browser.eval("ed.edges.length") == 1

    # persistence: the saved graph survives a fresh page load
    saved = browser.local_storage.get("sk-design-graph", "")
    assert "passthrough" in saved
    b2 = HeadlessBrowser(server)
    b2.local_storage.update(browser.local_storage)
    b2.open("/")
    b2.pump(0.5)
    assert b2.eval("ed.nodes.length") == 2
    assert b2.eval("ed.edges.length") == 1
    assert len(b2.by_id("editor").query_selector_all("g[data-node]")) == 2


def test_stream_view_create_session_and_events(browser):
    browser.by_id("stream-name")["value"] = "e2e-stream"
    browser.by_id("stream-yaml")["value"] = (
        "mode: dynamic\nnodes:\n"
        "  p:\n    kind: core::pacer\n"
        "  out:\n    kind: core::sink\n    needs: p\n"
    )
    browser.by_id("btn-stream-create").dispatch("click")
    assert browser.pump_until(
        lambda: "e2e-stream" in browser.by_id("stream-sessions")._get_text(), 15
    )
    # events stream logs the lifecycle (WS broadcast → logEvent)
    assert browser.pump_until(
        lambda: "sessioncreated" in browser.by_id("stream-events")._get_text(), 10
    ), browser.by_id("stream-events")._get_text()[:200]
    # cleanup
    for el in browser.by_id("stream-sessions").iter_tree():
        if el.tag == "button" and el._get_text() == "destroy":
            el.dispatch("click")
            break
    browser.pump(1.0)


def test_staged_changes_validate_and_apply_batch(browser, wav_path):
    """Reference stagingStore.ts workflow: queue 3 edits against a LIVE
    session, validate-batch (0 errors), apply-batch, and observe the new
    nodes land in the monitor graph (NodeAdded events refresh it)."""
    browser.by_id("sample-name")["value"] = "e2e-stage"
    browser.by_id("design-yaml")["value"] = (
        "mode: dynamic\nnodes:\n"
        "  src:\n    kind: core::file_reader\n"
        f'    params: {{path: "{wav_path}"}}\n'
        "  out:\n    kind: core::sink\n    needs: src\n"
    )
    browser.by_id("btn-design-session").dispatch("click")
    assert browser.pump_until(
        lambda: "session created" in browser.by_id("design-result")._get_text(), 15
    )
    assert browser.pump_until(
        lambda: "e2e-stage" in browser.by_id("mon-sessions")._get_text(), 10
    )
    card = None
    for el in browser.by_id("mon-sessions").element_children():
        if "e2e-stage" in el._get_text():
            card = el
            break
    card.dispatch("click")
    assert browser.pump_until(
        lambda: len(browser.by_id("mon-pipeline").query_selector_all("g[data-node]")) == 2, 10
    )

    # stage 3 edits: passthrough node, sink node, connect them
    assert browser.pump_until(
        lambda: len(browser.by_id("stage-kind").element_children()) > 5, 10
    ), "stage kind picker never populated"
    browser.by_id("stage-kind")["value"] = "core::passthrough"
    browser.by_id("stage-node-id")["value"] = "tap"
    browser.by_id("btn-stage-add").dispatch("click")
    browser.by_id("stage-kind")["value"] = "core::sink"
    browser.by_id("stage-node-id")["value"] = "tap_sink"
    browser.by_id("btn-stage-add").dispatch("click")
    browser.by_id("stage-from")["value"] = "tap"
    browser.by_id("stage-to")["value"] = "tap_sink"
    browser.by_id("btn-stage-connect").dispatch("click")
    ops_text = browser.by_id("stage-ops")._get_text()
    assert "add tap" in ops_text and "add tap_sink" in ops_text and "connect tap.out" in ops_text

    # validate-batch: all three ops valid
    browser.by_id("btn-stage-validate").dispatch("click")
    assert browser.pump_until(
        lambda: "3 operation(s) valid" in browser.by_id("stage-status")._get_text(), 10
    ), browser.by_id("stage-status")._get_text()

    # apply-batch: ops land atomically, staging list clears, graph grows
    browser.by_id("btn-stage-apply").dispatch("click")
    assert browser.pump_until(
        lambda: "applied 3" in browser.by_id("stage-status")._get_text(), 10
    ), browser.by_id("stage-status")._get_text()
    assert "no staged operations" in browser.by_id("stage-ops")._get_text()
    assert browser.pump_until(
        lambda: len(browser.by_id("mon-pipeline").query_selector_all("g[data-node]")) == 4, 10
    ), browser.by_id("mon-pipeline")._get_text()[:300]
    graph_text = browser.by_id("mon-pipeline")._get_text()
    assert "tap" in graph_text and "tap_sink" in graph_text

    # an invalid batch is rejected by validate
    browser.by_id("stage-kind")["value"] = "core::passthrough"
    browser.by_id("stage-node-id")["value"] = "x"
    browser.by_id("btn-stage-add").dispatch("click")
    browser.by_id("stage-from")["value"] = "ghost"
    browser.by_id("stage-to")["value"] = "x"
    browser.by_id("btn-stage-connect").dispatch("click")
    browser.by_id("btn-stage-validate").dispatch("click")
    assert browser.pump_until(
        lambda: "✗" in browser.by_id("stage-status")._get_text(), 10
    )
    browser.by_id("btn-stage-clear").dispatch("click")

    # cleanup
    for el in browser.by_id("stream-sessions").iter_tree():
        if el.tag == "button" and el._get_text() == "destroy":
            el.dispatch("click")
            break
    browser.pump(1.0)


def test_wire_drag_type_compatibility_highlighting(browser):
    """While a wire is dragged from an output port, compatible input ports
    glow and incompatible ones dim (reference packetTypeRegistry UX) —
    resolved client-side incl. passthrough chains."""
    from streamkit_tpu.utils.mjs import JSObject

    browser.eval("ed.nodes = []; ed.edges = []; ed.sel = null; ed.render()")
    svg = browser.by_id("editor")

    def drop(kind, x, y):
        dt = JSObject()
        dt["getData"] = lambda *_a: kind
        svg.dispatch("drop", {"offsetX": x, "offsetY": y, "dataTransfer": dt})

    drop("audio::gain", 60, 40)       # produces passthrough (unresolved)
    drop("audio::resampler", 60, 160)  # accepts raw_audio
    drop("core::text_chunker", 220, 160)  # accepts text/transcription/binary
    browser.pump(0.2)

    # direct unit probes of the client-side resolver
    assert browser.eval(
        "ed.typesConnect({type:'raw_audio'}, {type:'raw_audio'})"
    ) is True
    assert browser.eval(
        "ed.typesConnect({type:'raw_audio'}, {type:'text'})"
    ) is False
    assert browser.eval(
        "ed.typesConnect({type:'raw_audio', format:{sample_rate:48000, channels:0, sample_format:'f32'}},"
        " {type:'raw_audio', format:{sample_rate:16000, channels:0, sample_format:'f32'}})"
    ) is False
    assert browser.eval(
        "ed.typesConnect({type:'custom', type_id:'a/b@1'}, {type:'custom', type_id:'a/*'})"
    ) is True
    assert browser.eval("ed.typesConnect({type:'any'}, {type:'text'})") is True

    # drag a wire from the resampler's raw_audio output: text_chunker's
    # input (text/transcription/binary) must dim, gain's raw_audio glows
    rs = browser.eval("ed.nodes.find((n) => n.kind === 'audio::resampler').id")
    browser.eval(
        f"ed.wire = {{from: '{rs}', fromPin: 'out', x: 0, y: 0}}; ed.render()"
    )
    good = browser.eval(
        "ed.wireAccepts(ed.nodes.find((n) => n.kind === 'audio::gain'), 'in')"
    )
    bad = browser.eval(
        "ed.wireAccepts(ed.nodes.find((n) => n.kind === 'core::text_chunker'), 'in')"
    )
    assert good is True and bad is False
    # and the rendered ports reflect it (dimmed port has reduced opacity)
    ports = browser.by_id("editor").query_selector_all("[data-inport]")
    dimmed = [p for p in ports if p.attrs.get("opacity") == "0.45"]
    glowing = [p for p in ports if p.attrs.get("stroke") == "#7fd1b9"]
    assert dimmed and glowing
    browser.eval("ed.wire = null; ed.render()")


def test_editor_viewport_zoom_pan_fit_minimap(browser):
    """Reference DesignView (xyflow) viewport parity: wheel zoom at the
    cursor, canvas-drag pan, fit-to-content, and a minimap that mirrors
    the graph and recenters the view on click."""
    from streamkit_tpu.utils.mjs import JSObject

    browser.eval("ed.nodes = []; ed.edges = []; ed.sel = null; ed.view = null; ed.render()")
    svg = browser.by_id("editor")

    def drop(kind, x, y):
        dt = JSObject()
        dt["getData"] = lambda *_a: kind
        svg.dispatch("drop", {"clientX": x, "clientY": y, "dataTransfer": dt})

    drop("core::passthrough", 120, 80)
    drop("core::sink", 120, 220)
    assert browser.eval("ed.view") is None  # auto-fit until user navigates

    # wheel zoom in at (100, 80): viewport narrows around the cursor
    w0 = browser.eval("ed.viewBox().w")
    svg.dispatch("wheel", {"deltaY": -120, "clientX": 100, "clientY": 80})
    assert browser.eval("ed.view !== null")
    w1 = browser.eval("ed.view.w")
    assert w1 < w0
    # the svg viewBox attribute tracks the viewport
    vb = svg.attrs["viewBox"].split()
    assert abs(float(vb[2]) - w1) < 1e-6

    # canvas pan: mousedown on empty canvas, drag right/down — content
    # follows the pointer (view origin moves opposite), no deselect
    browser.eval("ed.sel = ed.nodes[0].id; ed.render()")
    x0 = browser.eval("ed.view.x")
    svg.dispatch("mousedown", {"clientX": 400, "clientY": 300})
    svg.dispatch("mousemove", {"clientX": 440, "clientY": 300})
    svg.dispatch("mouseup", {"clientX": 440, "clientY": 300})
    assert browser.eval("ed.view.x") < x0
    assert browser.eval("ed.sel") is not None  # moved pan keeps selection

    # plain canvas click (no movement) still deselects
    svg.dispatch("mousedown", {"clientX": 400, "clientY": 300})
    svg.dispatch("mouseup", {"clientX": 400, "clientY": 300})
    assert browser.eval("ed.sel") is None

    # minimap mirrors nodes + viewport rect; click recenters the view
    mm = browser.by_id("minimap")
    rects = mm.query_selector_all("rect")
    assert len(rects) == 3  # 2 nodes + view rect
    assert mm.query_selector("[data-mm-view]") is not None
    mm.dispatch("mousedown", {"clientX": 50, "clientY": 40})
    v = browser.eval("ed.view")
    assert abs(v["x"] - (50 - v["w"] / 2)) < 1e-6

    # fit returns to auto-fit (view = null) and the content bbox
    browser.by_id("btn-ed-fit").dispatch("click")
    assert browser.eval("ed.view") is None
    vb = svg.attrs["viewBox"].split()
    assert float(vb[0]) == 0.0 and float(vb[2]) >= 500


def test_editor_undo_redo_history(browser):
    """Reference layoutStore history parity: node add, wire, and node move
    are each ONE undo step; ctrl+z / ctrl+shift+z and the buttons walk the
    history; redo is invalidated by a new edit."""
    from streamkit_tpu.utils.mjs import JSObject

    browser.eval(
        "ed.nodes = []; ed.edges = []; ed.sel = null; ed.view = null;"
        "ed.hist = []; ed.histPos = -1; ed.commit(); ed.render()"
    )
    svg = browser.by_id("editor")

    def drop(kind, x, y):
        dt = JSObject()
        dt["getData"] = lambda *_a: kind
        svg.dispatch("drop", {"clientX": x, "clientY": y, "dataTransfer": dt})

    drop("core::passthrough", 120, 60)
    drop("core::sink", 120, 220)
    browser.pump(0.2)

    # wire passthrough.out -> sink.in (commits one history step on success)
    outport = svg.query_selector("[data-outport]")
    sink_in = [
        p for p in svg.query_selector_all("[data-inport]")
        if p.attrs["data-inport"].startswith("sink")
    ]
    outport.dispatch("mousedown", {"clientX": 120, "clientY": 60})
    sink_in[0].dispatch("mouseup", {})
    assert browser.pump_until(lambda: browser.eval("ed.edges.length") == 1, 10)
    assert browser.eval("ed.hist.length") == 4  # seed + 2 adds + wire

    # node move is one step: drag the selected node, commit on mouseup
    browser.eval("ed.sel = null")
    node_g = svg.query_selector("g[data-node]")
    node_g.dispatch("mousedown", {"clientX": 130, "clientY": 70})
    svg.dispatch("mousemove", {"clientX": 190, "clientY": 110})
    svg.dispatch("mouseup", {"clientX": 190, "clientY": 110})
    assert browser.eval("ed.hist.length") == 5

    # undo walks back: move -> wire -> node -> node -> seed
    browser.by_id("btn-ed-undo").dispatch("click")          # undo move
    assert browser.eval("ed.edges.length") == 1
    svg.dispatch("keydown", {"key": "z", "ctrlKey": True})  # undo wire
    assert browser.eval("ed.edges.length") == 0
    assert browser.eval("ed.nodes.length") == 2
    browser.by_id("btn-ed-undo").dispatch("click")
    browser.by_id("btn-ed-undo").dispatch("click")
    assert browser.eval("ed.nodes.length") == 0
    browser.by_id("btn-ed-undo").dispatch("click")          # no-op at seed
    assert browser.eval("ed.nodes.length") == 0

    # redo forward (button + ctrl+shift+z)
    browser.by_id("btn-ed-redo").dispatch("click")
    assert browser.eval("ed.nodes.length") == 1
    svg.dispatch("keydown", {"key": "z", "ctrlKey": True, "shiftKey": True})
    svg.dispatch("keydown", {"key": "y", "ctrlKey": True})
    assert browser.eval("ed.nodes.length") == 2
    assert browser.eval("ed.edges.length") == 1

    # a fresh edit truncates the redo tail
    browser.by_id("btn-ed-undo").dispatch("click")
    drop("core::pacer", 300, 60)
    assert browser.eval("ed.histPos") == browser.eval("ed.hist.length") - 1
    browser.by_id("btn-ed-redo").dispatch("click")  # no-op
    assert browser.eval("ed.nodes.length") == 3


def test_stream_timeline_renders_vad_partials_finals(browser):
    """The Stream view's utterance timeline: telemetry events arriving on
    the control WS populate VAD segment bars, partial tick marks, and
    final markers on a shared 60s axis (reference TelemetryTimeline shows
    the same event classes)."""
    now = browser.eval("Date.now() / 1000")
    for dt, et, text in [
        (-8, "vad.speech_start", ""),
        (-6.5, "stt.partial", "hello"),
        (-6.0, "stt.partial", "hello wor"),
        (-5, "vad.speech_end", ""),
        (-4.8, "stt.result", "hello world"),
        (-2, "vad.speech_start", ""),  # still-open segment
    ]:
        browser.eval(
            "recordTimeline({event: 'nodetelemetry', session_id: 's1',"
            f" node_id: 'stt', data: {{event_type: {et!r}, text: {text!r}}}}})"
        )
        browser.eval(f"tlEvents[tlEvents.length - 1].t = {now + dt}")
    browser.eval("renderTimeline()")
    tl = browser.by_id("timeline")
    segs = tl.query_selector_all("[data-tl-seg]")
    assert len(segs) == 2  # one closed + one open segment
    assert any("data-tl-open" in s.attrs for s in segs)
    assert len(tl.query_selector_all("[data-tl-partial]")) == 2
    finals = tl.query_selector_all("[data-tl-final]")
    assert len(finals) == 1
    # final marker carries the transcript as a tooltip
    assert finals[0].query_selector("title")._get_text() == "hello world"
    # events older than the 60s window are evicted on the next arrival
    browser.eval(f"tlEvents.unshift({{t: {now - 100}, kind: 'final', node: 'x', text: ''}})")
    browser.eval(
        "recordTimeline({event: 'nodetelemetry', session_id: 's1',"
        " node_id: 'stt', data: {event_type: 'stt.partial', text: 'y'}})"
    )
    assert browser.eval(f"tlEvents.every((e) => e.t > {now - 70})")


def test_monitor_rate_and_latency_charts(browser):
    """Monitor telemetry charts: the session events/s chart buckets all WS
    events for the selected session, and per-node rows chart pkts/s plus
    the proc_ms latency EWMA from nodestatsupdated."""
    now = browser.eval("Date.now() / 1000")
    browser.eval("currentMon = 'sX'")
    for i in range(6):
        browser.eval(
            "recordRate({event: 'nodetelemetry', session_id: 'sX'})"
        )
    # two stats flushes 2s apart: 100 packets sent in between, 7.5ms proc
    browser.eval(
        "recordStats({event: 'nodestatsupdated', session_id: 'sX', node_id: 'stt',"
        " stats: {sent: 100, received: 100, proc_ms: 5.0}})"
    )
    browser.eval(
        "recordStats({event: 'nodestatsupdated', session_id: 'sX', node_id: 'stt',"
        " stats: {sent: 300, received: 300, proc_ms: 7.5}})"
    )
    browser.eval(f"statHist.get('sX|stt')[0].t = {now - 2}")
    browser.eval("renderCharts()")
    rate = browser.by_id("mon-rate")
    assert "events/s" in rate._get_text()
    assert rate.query_selector("polyline") is not None
    charts = browser.by_id("mon-charts")
    assert "stt" in charts._get_text()
    # two sparklines per node row: throughput + latency
    assert len(charts.query_selector_all("polyline")) == 2
    assert "8 ms" in charts._get_text()  # 7.5 rounds to 8
    # pkts/s from the delta: (300-100)/~2s ≈ 100/s (wall-clock skew allowed)
    import re as _re

    m = _re.search(r"(\d+\.\d)/s", charts._get_text())
    assert m and 95.0 <= float(m.group(1)) <= 105.0, charts._get_text()
    browser.eval("currentMon = null")


def test_editor_auto_layout(browser):
    """Layered auto-layout (reference LayoutPresetButtons): depth from
    sources becomes the column, siblings stack, the viewport re-fits, and
    the whole rearrangement is one undo step."""
    from streamkit_tpu.utils.mjs import JSObject

    browser.eval(
        "ed.nodes = []; ed.edges = []; ed.sel = null; ed.view = null;"
        "ed.hist = []; ed.histPos = -1; ed.commit(); ed.render()"
    )
    svg = browser.by_id("editor")

    def drop(kind, x, y):
        dt = JSObject()
        dt["getData"] = lambda *_a: kind
        svg.dispatch("drop", {"clientX": x, "clientY": y, "dataTransfer": dt})

    # scrambled positions: a -> b -> d, a -> c -> d
    drop("core::passthrough", 500, 300)  # a
    drop("audio::gain", 40, 40)          # b
    drop("audio::gain", 420, 30)         # c
    drop("core::sink", 60, 250)          # d
    ids = [browser.eval(f"ed.nodes[{i}].id") for i in range(4)]
    a, b, c, d = ids
    browser.eval(
        f"ed.edges = [{{from: '{a}', fromPin: 'out', to: '{b}', toPin: 'in'}},"
        f" {{from: '{a}', fromPin: 'out', to: '{c}', toPin: 'in'}},"
        f" {{from: '{b}', fromPin: 'out', to: '{d}', toPin: 'in'}},"
        f" {{from: '{c}', fromPin: 'out', to: '{d}', toPin: 'in'}}]; ed.commit()"
    )
    hist0 = browser.eval("ed.hist.length")
    browser.by_id("btn-ed-layout").dispatch("click")
    # columns by depth: a=0, b=c=1, d=2
    xs = {n: browser.eval(f"ed.nodes.find((x) => x.id === '{n}').x") for n in ids}
    ys = {n: browser.eval(f"ed.nodes.find((x) => x.id === '{n}').y") for n in ids}
    assert xs[a] < xs[b] == xs[c] < xs[d]
    assert ys[b] != ys[c]  # siblings stack, not overlap
    assert browser.eval("ed.view") is None  # re-fit
    assert browser.eval("ed.hist.length") == hist0 + 1  # one undo step
    browser.by_id("btn-ed-undo").dispatch("click")
    assert browser.eval(f"ed.nodes.find((x) => x.id === '{a}').x") != xs[a]
