# SPDX-License-Identifier: Apache-2.0
"""Script-node fetch(): allowlist matching, secret injection, sandbox
interaction (parity: script.rs AllowlistRule/HeaderMapping/register_fetch)."""

import asyncio
import http.server
import json
import threading

import pytest

from streamkit_tpu.core import (
    Channel,
    ConfigurationError,
    NodeContext,
    OutputSender,
    Packet,
)
from streamkit_tpu.nodes.core_nodes.script import (
    ScriptNode,
    ScriptSecret,
    is_url_allowed,
    parse_allowlist_pattern,
    set_global_script_config,
)


@pytest.fixture(autouse=True)
def _reset_policy():
    yield
    set_global_script_config([], {})


# ------------------------------------------------------------- pattern unit
def test_parse_allowlist_pattern():
    assert parse_allowlist_pattern("https://api.example.com/*") == (
        "https", "api.example.com", "/*"
    )
    assert parse_allowlist_pattern("https://example.com") == (
        "https", "example.com", "/*"
    )
    assert parse_allowlist_pattern("http://*:8080/v1/*") == ("http", "*:8080", "/v1/*")
    assert parse_allowlist_pattern("no-scheme") is None
    assert parse_allowlist_pattern("https://") is None


def test_is_url_allowed_matrix():
    rules = [{"url": "https://api.example.com/v1/*", "methods": ["GET", "POST"]}]
    assert is_url_allowed("https://api.example.com/v1/data", "GET", rules)
    assert is_url_allowed("https://api.example.com/v1/data", "post", rules)
    assert not is_url_allowed("https://api.example.com/v1/data", "DELETE", rules)
    assert not is_url_allowed("https://api.example.com/v2/data", "GET", rules)
    assert not is_url_allowed("http://api.example.com/v1/data", "GET", rules)  # scheme
    assert not is_url_allowed("https://evil.com/v1/data", "GET", rules)
    assert not is_url_allowed("https://api.example.com/v1/x", "GET", [])  # empty=block
    # wildcard host + explicit port pattern
    port_rules = [{"url": "http://127.0.0.1:*/hook", "methods": ["GET"]}]
    assert is_url_allowed("http://127.0.0.1:9131/hook", "GET", port_rules)
    assert not is_url_allowed("http://127.0.0.1:9131/other", "GET", port_rules)


# ----------------------------------------------------------- live HTTP drive
class _Handler(http.server.BaseHTTPRequestHandler):
    last = {}

    def _reply(self, obj, status=200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        _Handler.last = {"method": "GET", "path": self.path, "headers": dict(self.headers)}
        if self.path.startswith("/redirect"):
            body = json.dumps({"redirected": True}).encode()
            self.send_response(302)
            self.send_header("Location", "/stolen")
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        self._reply({"ok": True, "path": self.path})

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        _Handler.last = {
            "method": "POST",
            "path": self.path,
            "headers": dict(self.headers),
            "body": self.rfile.read(n).decode(),
        }
        self._reply({"ok": True, "echo": _Handler.last["body"]})

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture
def http_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


async def _run_script(node: ScriptNode, packets):
    in_ch = Channel(64)
    out_ch = Channel(256)
    tel_ch = Channel(256)
    ctx = NodeContext(
        node_name="script",
        inputs={"in": in_ch},
        output=OutputSender("script", direct={"out": out_ch}),
        telemetry_tx=tel_ch,
    )
    for p in packets:
        in_ch.try_send(p)
    in_ch.close()
    await node.run(ctx)
    ctx.output.close()
    out = []
    while True:
        item = await out_ch.recv_optional()
        if item is None:
            return out
        out.append(item)


def test_fetch_blocked_by_default(http_server):
    set_global_script_config([], {})
    node = ScriptNode(
        {
            "script": (
                "def process(p):\n"
                "    try:\n"
                f"        return fetch('{http_server}/x')\n"
                "    except Exception as e:\n"
                "        return 'blocked:' + str(e)\n"
            )
        }
    )
    outs = asyncio.run(_run_script(node, [Packet.new_text("go")]))
    assert len(outs) == 1
    assert outs[0].text.startswith("blocked:")
    assert "allowlist is empty" in outs[0].text


def test_fetch_get_allowed(http_server):
    set_global_script_config([{"url": f"{http_server}/api/*", "methods": ["GET"]}], {})
    node = ScriptNode(
        {"script": f"def process(p):\n    return fetch('{http_server}/api/data')\n",
         "timeout_ms": 5000}
    )
    outs = asyncio.run(_run_script(node, [Packet.new_text("go")]))
    assert json.loads(outs[0].text) == {"ok": True, "path": "/api/data"}


def test_fetch_post_body_and_secret_header(http_server):
    set_global_script_config(
        [{"url": f"{http_server}/*", "methods": ["POST"]}],
        {"api_key": ScriptSecret("s3cret", [f"{http_server}/*"])},
    )
    node = ScriptNode(
        {
            "script": (
                "def process(p):\n"
                f"    return fetch('{http_server}/hook', "
                "{'method': 'POST', 'body': '{\"k\": 1}', "
                "'headers': {'X-Extra': 'yes'}})\n"
            ),
            "timeout_ms": 5000,
            "headers": [
                {"secret": "api_key", "header": "Authorization", "template": "Bearer {}"}
            ],
        }
    )
    outs = asyncio.run(_run_script(node, [Packet.new_text("go")]))
    assert json.loads(outs[0].text)["ok"] is True
    seen = _Handler.last
    assert seen["method"] == "POST"
    assert seen["body"] == '{"k": 1}'
    assert seen["headers"]["Authorization"] == "Bearer s3cret"
    assert seen["headers"]["X-Extra"] == "yes"
    assert seen["headers"]["Content-Type"] == "application/json"


def test_secret_not_injected_outside_scope(http_server):
    # secret scoped to a different host: header must NOT be attached
    set_global_script_config(
        [{"url": f"{http_server}/*", "methods": ["GET"]}],
        {"api_key": ScriptSecret("s3cret", ["https://other.example.com/*"])},
    )
    node = ScriptNode(
        {
            "script": f"def process(p):\n    return fetch('{http_server}/leak')\n",
            "timeout_ms": 5000,
            "headers": [{"secret": "api_key", "header": "Authorization"}],
        }
    )
    outs = asyncio.run(_run_script(node, [Packet.new_text("go")]))
    assert json.loads(outs[0].text)["ok"] is True
    assert "Authorization" not in _Handler.last["headers"]


def test_fetch_method_not_in_allowlist(http_server):
    set_global_script_config([{"url": f"{http_server}/*", "methods": ["GET"]}], {})
    node = ScriptNode(
        {
            "script": (
                "def process(p):\n"
                "    try:\n"
                f"        return fetch('{http_server}/x', {{'method': 'POST'}})\n"
                "    except Exception as e:\n"
                "        return 'blocked'\n"
            ),
            "timeout_ms": 5000,
        }
    )
    outs = asyncio.run(_run_script(node, [Packet.new_text("go")]))
    assert outs[0].text == "blocked"


# ------------------------------------------------------- sandbox interaction
def test_bare_except_rejected():
    with pytest.raises(ConfigurationError, match="bare"):
        ScriptNode({"script": "def process(p):\n    try:\n        pass\n    except:\n        pass\n"})


def test_base_exception_handler_rejected():
    with pytest.raises(ConfigurationError, match="BaseException"):
        ScriptNode(
            {"script": "def process(p):\n    try:\n        pass\n    except BaseException:\n        pass\n"}
        )


def test_timeout_cannot_be_caught_by_script():
    """A runaway script wrapped in `except Exception` still hits the deadline
    (the deadline signal is a BaseException), and the packet passes through
    unmodified (reference timeout semantics)."""
    node = ScriptNode(
        {
            "script": (
                "def process(p):\n"
                "    while True:\n"
                "        try:\n"
                "            x = 1\n"
                "        except Exception:\n"
                "            pass\n"
            ),
            "timeout_ms": 100,
        }
    )
    outs = asyncio.run(_run_script(node, [Packet.new_text("survive")]))
    assert len(outs) == 1 and outs[0].text == "survive"


def test_fetch_redirect_not_followed(http_server):
    # an allowlisted endpoint that 302s must NOT be followed (secret-header
    # leak + allowlist bypass; reference sets redirect Policy::none)
    set_global_script_config(
        [{"url": f"{http_server}/*", "methods": ["GET"]}],
        {"api_key": ScriptSecret("s3cret", [f"{http_server}/*"])},
    )
    node = ScriptNode(
        {
            "script": f"def process(p):\n    return fetch('{http_server}/redirect')\n",
            "timeout_ms": 5000,
            "headers": [{"secret": "api_key", "header": "Authorization"}],
        }
    )
    outs = asyncio.run(_run_script(node, [Packet.new_text("go")]))
    # the 3xx response body is returned as-is
    assert json.loads(outs[0].text) == {"redirected": True}
    # the redirect target was never requested
    assert _Handler.last["path"] == "/redirect"
