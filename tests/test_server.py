# SPDX-License-Identifier: Apache-2.0
"""Server integration tests: boots the full aiohttp app in-process
(parity: apps/skit/tests/end_to_end_test.rs:22-41 start_test_server pattern,
session_lifecycle_test.rs WS flows)."""

import asyncio
import io
import json
import wave

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from streamkit_tpu.server import ServerConfig, create_app


def make_wav(samples, rate=48000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(samples * 32768, -32768, 32767).astype("<i2")).tobytes())
    return buf.getvalue()


DOUBLE_VOLUME_YAML = """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: containers::wav::demuxer
  - kind: audio::gain
    params: {gain: 2.0}
  - kind: containers::wav::muxer
  - kind: streamkit::http_output
"""


async def make_client() -> TestClient:
    app = create_app(ServerConfig())
    server = TestServer(app)
    client = TestClient(server)
    await client.start_server()
    return client


def run(coro):
    return asyncio.run(coro)


def test_healthz():
    async def main():
        client = await make_client()
        resp = await client.get("/healthz")
        assert resp.status == 200
        assert (await resp.json())["status"] == "ok"
        await client.close()

    run(main())


def test_oneshot_process_multipart():
    """The reference server's flagship double-volume round trip over HTTP."""

    async def main():
        import aiohttp

        client = await make_client()
        x = (np.ones(9600) * 0.25).astype(np.float32)
        form = aiohttp.FormData()
        form.add_field("config", DOUBLE_VOLUME_YAML)
        form.add_field("media", make_wav(x), filename="in.wav", content_type="audio/wav")
        resp = await client.post("/api/v1/process", data=form)
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "audio/wav"
        body = await resp.read()
        await client.close()
        return body

    body = run(main())
    y = np.frombuffer(body[44:], dtype="<i2").astype(np.float32) / 32768.0
    np.testing.assert_allclose(y[:9600], 0.5, atol=2e-3)


def test_oneshot_bad_yaml_422():
    async def main():
        import aiohttp

        client = await make_client()
        form = aiohttp.FormData()
        form.add_field("config", "nodes:\n  a: {kind: x, needs: a}")
        form.add_field("media", b"x")
        resp = await client.post("/api/v1/process", data=form)
        assert resp.status == 422
        err = await resp.json()
        assert "Circular" in err["error"]
        await client.close()

    run(main())


def test_schema_and_permissions_endpoints():
    async def main():
        client = await make_client()
        resp = await client.get("/api/v1/schema/nodes")
        nodes = (await resp.json())["nodes"]
        kinds = {n["kind"] for n in nodes}
        assert "audio::gain" in kinds and "core::passthrough" in kinds
        resp = await client.get("/api/v1/schema/packets")
        packets = (await resp.json())["packet_types"]
        assert any(p["id"] == "RawAudio" for p in packets)
        resp = await client.get("/api/v1/permissions")
        perms = await resp.json()
        assert perms["role"] == "admin"
        assert perms["permissions"]["create_sessions"] is True
        resp = await client.get("/api/v1/config")
        assert resp.status == 200
        await client.close()

    run(main())


def test_session_rest_lifecycle(tmp_path):
    """POST /sessions with YAML → pipeline populated → GET pipeline → DELETE."""
    wav_path = tmp_path / "in.wav"
    wav_path.write_bytes(make_wav(np.zeros(4800, np.float32)))
    yaml_text = f"""
mode: dynamic
nodes:
  reader:
    kind: core::file_reader
    params: {{path: "{wav_path}"}}
  sink: {{kind: core::sink, needs: reader}}
"""

    async def main():
        client = await make_client()
        resp = await client.post("/api/v1/sessions", json={"name": "it-sess", "yaml": yaml_text})
        assert resp.status == 201, await resp.text()
        sid = (await resp.json())["session_id"]

        resp = await client.get("/api/v1/sessions")
        sessions = (await resp.json())["sessions"]
        assert any(s["id"] == sid and s["name"] == "it-sess" for s in sessions)

        resp = await client.get(f"/api/v1/sessions/{sid}/pipeline")
        pipe = (await resp.json())["pipeline"]
        assert set(pipe["nodes"]) == {"reader", "sink"}
        assert len(pipe["connections"]) == 1

        resp = await client.delete(f"/api/v1/sessions/{sid}")
        assert resp.status == 200
        resp = await client.get("/api/v1/sessions")
        assert (await resp.json())["sessions"] == []
        await client.close()

    run(main())


def test_ws_control_plane_full_flow(tmp_path):
    """WS session lifecycle mirroring the reference session_lifecycle_test."""
    wav_path = tmp_path / "in.wav"
    wav_path.write_bytes(make_wav(np.ones(48000, np.float32) * 0.25))
    out_path = tmp_path / "out.wav"

    async def main():
        client = await make_client()
        ws = await client.ws_connect("/api/v1/control")

        async def req(action, **fields):
            corr = f"c-{action}"
            await ws.send_json(
                {"type": "request", "correlation_id": corr, "payload": {"action": action, **fields}}
            )
            # skip events until our correlated response arrives
            while True:
                msg = json.loads((await ws.receive()).data)
                if msg["type"] == "response" and msg.get("correlation_id") == corr:
                    return msg["payload"]

        p = await req("createsession", name="ws-sess")
        assert p["action"] == "sessioncreated"
        sid = p["session_id"]

        p = await req("listnodes")
        assert p["action"] == "nodeslisted" and len(p["nodes"]) > 10

        for node_id, kind, params in [
            ("reader", "core::file_reader", {"path": str(wav_path)}),
            ("demux", "containers::wav::demuxer", None),
            ("gain", "audio::gain", {"gain": 2.0}),
            ("mux", "containers::wav::muxer", None),
            ("writer", "core::file_writer", {"path": str(out_path)}),
        ]:
            p = await req("addnode", session_id=sid, node_id=node_id, kind=kind, params=params)
            assert p["action"] == "success", p

        for a, b in [("reader", "demux"), ("demux", "gain"), ("gain", "mux"), ("mux", "writer")]:
            p = await req(
                "connect", session_id=sid, from_node=a, from_pin="out", to_node=b, to_pin="in"
            )
            assert p["action"] == "success", p

        p = await req(
            "tunenode",
            session_id=sid,
            node_id="gain",
            message={"type": "update_params", "params": {"gain": 1.0}},
        )
        assert p["action"] == "success"

        # wait for completion via pipeline state polling
        for _ in range(200):
            await asyncio.sleep(0.05)
            p = await req("getpipeline", session_id=sid)
            states = [n.get("state") for n in p["pipeline"]["nodes"].values()]
            if all(isinstance(s, dict) and "stopped" in s for s in states):
                break

        p = await req("destroysession", session_id=sid)
        assert p["action"] == "sessiondestroyed"
        await ws.close()
        await client.close()

    run(main())
    data = out_path.read_bytes()
    assert data[:4] == b"RIFF"


def test_ws_error_paths():
    async def main():
        client = await make_client()
        ws = await client.ws_connect("/api/v1/control")
        await ws.send_str("not json")
        msg = json.loads((await ws.receive()).data)
        assert msg["payload"]["action"] == "error"

        await ws.send_json(
            {"type": "request", "correlation_id": "x", "payload": {"action": "nonexistent"}}
        )
        msg = json.loads((await ws.receive()).data)
        assert "unknown action" in msg["payload"]["message"]

        await ws.send_json(
            {
                "type": "request",
                "correlation_id": "y",
                "payload": {"action": "getpipeline", "session_id": "ghost"},
            }
        )
        msg = json.loads((await ws.receive()).data)
        assert "unknown session" in msg["payload"]["message"]
        await ws.close()
        await client.close()

    run(main())


def test_rbac_viewer_role_denied():
    cfg = ServerConfig()
    cfg.default_role = "viewer"
    cfg.roles = {"viewer": {"list_sessions": True, "list_nodes": True}}

    async def main():
        app = create_app(cfg)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        resp = await client.post("/api/v1/sessions", json={"name": "x"})
        assert resp.status == 403
        ws = await client.ws_connect("/api/v1/control")
        await ws.send_json(
            {"type": "request", "correlation_id": "c", "payload": {"action": "createsession"}}
        )
        msg = json.loads((await ws.receive()).data)
        assert "permission denied" in msg["payload"]["message"]
        await ws.close()
        await client.close()

    run(main())


def test_samples_crud(tmp_path):
    cfg = ServerConfig()
    cfg.samples_dir = str(tmp_path)

    async def main():
        app = create_app(cfg)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        resp = await client.post(
            "/api/v1/samples",
            json={"name": "mytest", "yaml": "mode: dynamic\nnodes:\n  a: {kind: core::sink}\n"},
        )
        assert resp.status == 201, await resp.text()
        resp = await client.get("/api/v1/samples")
        samples = (await resp.json())["samples"]
        assert any(s["id"] == "mytest.yml" for s in samples)
        resp = await client.get("/api/v1/samples/mytest.yml")
        assert (await resp.json())["mode"] == "dynamic"
        # invalid yaml rejected
        resp = await client.post(
            "/api/v1/samples", json={"name": "bad", "yaml": "nodes:\n  a: {kind: x, needs: a}"}
        )
        assert resp.status == 422
        # traversal guard
        resp = await client.get("/api/v1/samples/..%2Fsecret")
        assert resp.status in (403, 404, 422)
        resp = await client.delete("/api/v1/samples/mytest.yml")
        assert resp.status == 200
        await client.close()

    run(main())


def test_plugin_endpoints(tmp_path):
    """List/upload/delete native plugins over HTTP (reference plugins.rs)."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    subprocess.run(["make", "-C", "/root/repo/native"], check=True, capture_output=True)

    cfg = ServerConfig()
    cfg.plugins_dir = str(tmp_path / "plugins")

    async def main():
        import aiohttp

        app = create_app(cfg)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()

        resp = await client.get("/api/v1/plugins")
        assert (await resp.json())["plugins"] == []

        form = aiohttp.FormData()
        form.add_field(
            "file",
            open("/root/repo/native/build/gain_cpp.so", "rb").read(),
            filename="gain_cpp.so",
        )
        resp = await client.post("/api/v1/plugins", data=form)
        body = await resp.json()
        assert resp.status == 201, body
        assert body["kind"] == "plugin::native::gain_cpp"

        resp = await client.get("/api/v1/plugins")
        plugins = (await resp.json())["plugins"]
        assert len(plugins) == 1 and plugins[0]["abi_version"] == 2

        # uploaded plugin is immediately usable in a pipeline
        resp = await client.get("/api/v1/schema/nodes")
        kinds = {n["kind"] for n in (await resp.json())["nodes"]}
        assert "plugin::native::gain_cpp" in kinds

        resp = await client.delete("/api/v1/plugins/plugin::native::gain_cpp")
        assert resp.status == 200
        resp = await client.get("/api/v1/plugins")
        assert (await resp.json())["plugins"] == []
        await client.close()

    run(main())


def test_monitor_ui_served():
    async def main():
        client = await make_client()
        resp = await client.get("/monitor")
        text = await resp.text()
        assert resp.status == 200
        assert "streamkit-tpu monitor" in text
        await client.close()

    run(main())


def test_origin_guard():
    cfg = ServerConfig()
    cfg.allowed_origins = ["https://good.example"]

    async def main():
        app = create_app(cfg)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        resp = await client.get("/healthz", headers={"Origin": "https://evil.example"})
        assert resp.status == 403
        resp = await client.get("/healthz", headers={"Origin": "https://good.example"})
        assert resp.status == 200
        resp = await client.get("/healthz")  # no Origin (curl) passes
        assert resp.status == 200
        assert resp.headers["X-Content-Type-Options"] == "nosniff"
        await client.close()

    run(main())


def test_nonloopback_admin_refusal():
    from streamkit_tpu.server.app import run_server

    cfg = ServerConfig()
    cfg.address = "0.0.0.0"
    with pytest.raises(SystemExit, match="refusing"):
        run_server(cfg)


def test_duplicate_session_name_409_no_leak():
    async def main():
        client = await make_client()
        state = client.app["state"]
        r1 = await client.post("/api/v1/sessions", json={"name": "dup"})
        assert r1.status == 201
        r2 = await client.post("/api/v1/sessions", json={"name": "dup"})
        assert r2.status == 409
        assert len(state.sessions.list()) == 1  # no orphan engine
        await client.close()

    run(main())


def test_session_ownership_on_http_routes():
    """Pipeline/destroy HTTP routes enforce per-creator visibility like WS."""
    cfg = ServerConfig()
    cfg.role_header = "X-Role"
    cfg.roles = {
        "alice": {"create_sessions": True, "list_sessions": True, "destroy_sessions": True},
        "bob": {"create_sessions": True, "list_sessions": True, "destroy_sessions": True},
    }
    cfg.default_role = "alice"

    async def main():
        app = create_app(cfg)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        r = await client.post("/api/v1/sessions", json={"name": "a1"}, headers={"X-Role": "alice"})
        sid = (await r.json())["session_id"]
        # bob cannot read or destroy alice's session
        r = await client.get(f"/api/v1/sessions/{sid}/pipeline", headers={"X-Role": "bob"})
        assert r.status == 403
        r = await client.delete(f"/api/v1/sessions/{sid}", headers={"X-Role": "bob"})
        assert r.status == 403
        # alice can
        r = await client.get(f"/api/v1/sessions/{sid}/pipeline", headers={"X-Role": "alice"})
        assert r.status == 200
        r = await client.delete(f"/api/v1/sessions/{sid}", headers={"X-Role": "alice"})
        assert r.status == 200
        await client.close()

    run(main())


def test_validate_endpoint():
    """POST /api/v1/validate: compile check + unknown-kind rejection
    (Design view contract)."""

    async def main():
        client = await make_client()
        try:
            r = await client.post("/api/v1/validate", json={"yaml": DOUBLE_VOLUME_YAML})
            body = await r.json()
            assert body["valid"] is True
            assert len(body["pipeline"]["nodes"]) == 5
            assert body["pipeline"]["mode"] == "oneshot"

            r = await client.post(
                "/api/v1/validate",
                json={"yaml": "mode: oneshot\nsteps:\n  - kind: no::such::node\n"},
            )
            body = await r.json()
            assert body["valid"] is False and "no::such::node" in body["error"]

            r = await client.post(
                "/api/v1/validate", json={"yaml": "steps: [}"}
            )
            body = await r.json()
            assert body["valid"] is False

            r = await client.post(
                "/api/v1/validate", data=b"not json",
                headers={"Content-Type": "application/json"},
            )
            assert r.status == 422
        finally:
            await client.close()

    run(main())


def test_web_ui_served():
    """/ and /ui serve the full web app; /monitor keeps the legacy page."""

    async def main():
        client = await make_client()
        try:
            for path in ("/", "/ui"):
                r = await client.get(path)
                assert r.status == 200
                text = await r.text()
                assert "Design" in text and "Convert" in text and "Stream" in text
            r = await client.get("/monitor")
            assert r.status == 200
            assert "monitor" in (await r.text())
        finally:
            await client.close()

    run(main())


def test_max_concurrent_sessions_limit():
    """Global session admission limit (reference permissions.rs:316-321 +
    websocket_handlers.rs:106-121): the limit rejects — HTTP 503, WS Error
    payload with the reference's message — and frees capacity on destroy."""
    cfg = ServerConfig()
    cfg.max_concurrent_sessions = 2

    async def main():
        app = create_app(cfg)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        ids = []
        for i in range(2):
            resp = await client.post("/api/v1/sessions", json={"name": f"s{i}"})
            assert resp.status == 201, await resp.text()
            ids.append((await resp.json())["session_id"])
        resp = await client.post("/api/v1/sessions", json={"name": "s2"})
        assert resp.status == 503
        assert "Maximum concurrent sessions limit reached" in (await resp.json())["error"]
        # the WS control plane rejects with the same message
        ws = await client.ws_connect("/api/v1/control")
        await ws.send_json(
            {"type": "request", "correlation_id": "c1", "payload": {"action": "createsession"}}
        )
        msg = json.loads((await ws.receive()).data)
        assert "Maximum concurrent sessions limit reached" in msg["payload"]["message"]
        # destroying one frees a slot
        resp = await client.delete(f"/api/v1/sessions/{ids[0]}")
        assert resp.status == 200
        resp = await client.post("/api/v1/sessions", json={"name": "s3"})
        assert resp.status == 201, await resp.text()
        await ws.close()
        await client.close()

    run(main())


def test_max_concurrent_oneshots_queues():
    """permissions.max_concurrent_oneshots queues excess oneshots (the
    reference's tower ConcurrencyLimitLayer waits — server.rs:1854-1856):
    all requests eventually succeed, never a capacity error."""
    cfg = ServerConfig()
    cfg.max_concurrent_oneshots = 1

    async def main():
        app = create_app(cfg)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        wav = make_wav(np.full(4800, 0.25, np.float32))

        async def one():
            import aiohttp

            form = aiohttp.FormData()
            form.add_field("config", DOUBLE_VOLUME_YAML)
            form.add_field("media", wav, filename="in.wav", content_type="audio/wav")
            resp = await client.post("/api/v1/process", data=form)
            assert resp.status == 200, await resp.text()
            await resp.read()

        await asyncio.gather(*(one() for _ in range(3)))
        await client.close()

    run(main())
