# SPDX-License-Identifier: Apache-2.0
"""OTLP/HTTP push telemetry: JSON encoding shape + live export against an
in-process collector sink (parity: apps/skit/src/telemetry.rs 5s periodic
OTLP exporter)."""

import asyncio
import json

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from streamkit_tpu.server import ServerConfig, create_app
from streamkit_tpu.server.otlp import OtlpPusher, encode_logs, encode_metrics


def test_encode_metrics_otlp_json_shape():
    req = encode_metrics(
        [
            ("skit_sessions_active", "gauge", 3, {}),
            ("skit_node_packets_sent", "counter", 42, {"node": "gain"}),
            ("skit_node_packets_sent", "counter", 7, {"node": "mix"}),
            ("skit_uptime_seconds", "gauge", 1.5, {}),
        ],
        now_ns=1_000,
        start_ns=500,
    )
    (rm,) = req["resourceMetrics"]
    attrs = {a["key"]: a["value"]["stringValue"] for a in rm["resource"]["attributes"]}
    assert attrs["service.name"] == "streamkit-tpu"
    metrics = {m["name"]: m for m in rm["scopeMetrics"][0]["metrics"]}
    assert metrics["skit_sessions_active"]["gauge"]["dataPoints"][0]["asInt"] == "3"
    s = metrics["skit_node_packets_sent"]["sum"]
    assert s["isMonotonic"] is True and s["aggregationTemporality"] == 2
    assert len(s["dataPoints"]) == 2  # one per label set
    assert s["dataPoints"][0]["startTimeUnixNano"] == "500"
    assert metrics["skit_uptime_seconds"]["gauge"]["dataPoints"][0]["asDouble"] == 1.5
    json.dumps(req)  # wire-serializable


def test_encode_logs_shape():
    req = encode_logs(
        [{"event": "script.error", "session_id": "abc", "data": {"x": 1}}],
        now_ns=42,
    )
    rec = req["resourceLogs"][0]["scopeLogs"][0]["logRecords"][0]
    assert rec["body"]["stringValue"] == "script.error"
    attrs = {a["key"]: a["value"]["stringValue"] for a in rec["attributes"]}
    assert attrs["session_id"] == "abc"
    assert json.loads(attrs["data"]) == {"x": 1}


def test_push_to_live_collector():
    """Boot the app with an OTLP endpoint pointed at an in-process sink;
    the pusher exports metrics and buffered events over real HTTP."""

    received = {}

    async def main():
        # --- collector sink
        sink = web.Application()

        async def metrics(req):
            received["metrics"] = await req.json()
            return web.json_response({})

        async def logs(req):
            received["logs"] = await req.json()
            return web.json_response({})

        sink.router.add_post("/v1/metrics", metrics)
        sink.router.add_post("/v1/logs", logs)
        sink_server = TestServer(sink)
        await sink_server.start_server()
        endpoint = f"http://127.0.0.1:{sink_server.port}"

        # --- app under test with fast export interval
        cfg = ServerConfig()
        cfg.otlp_endpoint = endpoint
        cfg.otlp_interval_secs = 0.1
        app = create_app(cfg)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            state = app["state"]
            assert isinstance(state.otlp, OtlpPusher)
            state.broadcast({"type": "event", "payload": {"event": "sessioncreated", "session_id": "s1"}})
            for _ in range(50):
                await asyncio.sleep(0.1)
                if "metrics" in received and "logs" in received:
                    break
            assert "metrics" in received, "no metrics export within 5s"
            names = {
                m["name"]
                for m in received["metrics"]["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]
            }
            assert "skit_sessions_active" in names
            assert "skit_process_rss_bytes" in names
            rec = received["logs"]["resourceLogs"][0]["scopeLogs"][0]["logRecords"][0]
            assert rec["body"]["stringValue"] == "sessioncreated"
            assert state.otlp.exports >= 1 and state.otlp.failures == 0
        finally:
            await client.close()
            await sink_server.close()

    asyncio.run(main())


def test_pusher_survives_unreachable_collector():
    """Export failures must not kill the loop — failures count, exports resume."""

    async def main():
        cfg = ServerConfig()
        cfg.otlp_endpoint = "http://127.0.0.1:1"  # nothing listens here
        cfg.otlp_interval_secs = 0.05
        app = create_app(cfg)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            for _ in range(40):
                await asyncio.sleep(0.05)
                if app["state"].otlp.failures >= 2:
                    break
            assert app["state"].otlp.failures >= 2
            # server still healthy
            r = await client.get("/healthz")
            assert r.status == 200
        finally:
            await client.close()

    asyncio.run(main())


# ---------------------------------------------------------------- span tracing
def test_tracer_parenting_and_encoding():
    """Spans nest via contextvars (async-safe), errors mark status, and the
    OTLP trace encoding carries the parent links."""
    from streamkit_tpu.utils.tracing import Tracer, encode_spans

    tr = Tracer()
    tr.enable()
    with tr.span("ws_request", {"request.action": "addnode"}) as root:
        with tr.span("node_run", {"node.kind": "audio::gain"}) as child:
            assert child.trace_id == root.trace_id
            assert child.parent_span_id == root.span_id
    try:
        with tr.span("failing"):
            raise ValueError("boom")
    except ValueError:
        pass
    spans = tr.drain()
    assert [s.name for s in spans] == ["node_run", "ws_request", "failing"]
    req = encode_spans(spans)
    recs = req["resourceSpans"][0]["scopeSpans"][0]["spans"]
    by_name = {r["name"]: r for r in recs}
    assert by_name["node_run"]["parentSpanId"] == by_name["ws_request"]["spanId"]
    assert by_name["node_run"]["traceId"] == by_name["ws_request"]["traceId"]
    assert "parentSpanId" not in by_name["ws_request"]
    assert by_name["failing"]["status"]["code"] == 2
    assert "boom" in by_name["failing"]["status"]["message"]
    assert int(by_name["node_run"]["endTimeUnixNano"]) >= int(
        by_name["node_run"]["startTimeUnixNano"]
    )
    json.dumps(req)  # wire-serializable


def test_tracer_disabled_is_noop():
    from streamkit_tpu.utils.tracing import Tracer

    tr = Tracer()
    with tr.span("x") as s:
        s.set_attribute("k", "v")  # must not explode on the noop span
    assert tr.drain() == []


def test_spans_exported_and_session_flow_traced():
    """A session create -> add node -> destroy over WS appears as spans in
    the OTLP /v1/traces sink, with node_run spans carrying kind/session."""

    async def main():
        from streamkit_tpu.utils.tracing import get_tracer

        received = {}

        async def traces(request):
            doc = await request.json()
            received.setdefault("spans", []).extend(
                doc["resourceSpans"][0]["scopeSpans"][0]["spans"]
            )
            return web.json_response({})

        async def ok(request):
            return web.json_response({})

        sink = web.Application()
        sink.router.add_post("/v1/traces", traces)
        sink.router.add_post("/v1/metrics", ok)
        sink.router.add_post("/v1/logs", ok)
        sink_server = TestServer(sink)
        await sink_server.start_server()

        cfg = ServerConfig()
        cfg.otlp_endpoint = f"http://127.0.0.1:{sink_server.port}"
        cfg.otlp_interval_secs = 0.1
        app = create_app(cfg)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            assert get_tracer().enabled
            ws = await client.ws_connect("/api/v1/control")
            await ws.send_json(
                {"type": "request", "correlation_id": "1",
                 "payload": {"action": "createsession", "name": "trace-me"}}
            )
            sid = None
            while sid is None:
                msg = json.loads((await ws.receive()).data)
                if msg.get("payload", {}).get("action") == "sessioncreated":
                    sid = msg["payload"]["session_id"]
            await ws.send_json(
                {"type": "request", "correlation_id": "2",
                 "payload": {"action": "addnode", "session_id": sid,
                             "node_id": "g", "kind": "audio::gain"}}
            )
            await ws.send_json(
                {"type": "request", "correlation_id": "3",
                 "payload": {"action": "destroysession", "session_id": sid}}
            )
            for _ in range(60):
                await asyncio.sleep(0.1)
                names = {s["name"] for s in received.get("spans", [])}
                if "ws_request" in names and "node_run" in names:
                    break
            await ws.close()
            spans = received["spans"]
            names = {s["name"] for s in spans}
            assert "ws_request" in names and "node_run" in names
            node_spans = [s for s in spans if s["name"] == "node_run"]
            attrs = {
                a["key"]: a["value"]["stringValue"]
                for a in node_spans[0]["attributes"]
            }
            assert attrs["node.kind"] == "audio::gain"
            assert attrs["session.id"] == sid
            ws_spans = [s for s in spans if s["name"] == "ws_request"]
            actions = {
                a["value"]["stringValue"]
                for s in ws_spans for a in s["attributes"]
                if a["key"] == "request.action"
            }
            assert {"createsession", "addnode", "destroysession"} <= actions
        finally:
            get_tracer().disable()
            await client.close()
            await sink_server.close()

    asyncio.run(main())
