# SPDX-License-Identifier: Apache-2.0
"""Headless browser: executes the web UI's JavaScript under mjs against the
DOM shim, with REAL fetch/WebSocket traffic to a live server.

The reference drives its UI with Playwright against the real binary
(``e2e/src/harness/run.ts``); no browser ships in this image, so this
harness is the executable replacement: same server, same UI source, same
wire traffic — the rendering engine is the only thing mocked.
"""

from __future__ import annotations

import asyncio
import heapq
import itertools
import json
import threading
import time
import urllib.request
from typing import Callable, List, Optional

from streamkit_tpu.utils.mjs import (
    UNDEFINED,
    JSArray,
    JSInterpreter,
    JSObject,
    from_python,
    js_to_string,
    to_python,
)

from .dom import Document, parse_html


class ServerThread:
    """Runs the real aiohttp app on 127.0.0.1:<free port> in a background
    thread (reference harness boots the real binary and health-gates)."""

    def __init__(self, config=None):
        from streamkit_tpu.server import ServerConfig, create_app

        self.config = config or ServerConfig()
        self._app_factory = create_app
        self.loop = asyncio.new_event_loop()
        self.port: Optional[int] = None
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        asyncio.set_event_loop(self.loop)

        async def boot():
            from aiohttp import web

            app = self._app_factory(self.config)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            self.port = site._server.sockets[0].getsockname()[1]
            self._runner = runner
            self._started.set()

        self.loop.run_until_complete(boot())
        self.loop.run_forever()

    def start(self) -> str:
        self._thread.start()
        if not self._started.wait(timeout=30):
            raise RuntimeError("server thread failed to start")
        # health gate (run.ts waits on /healthz)
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(self.base_url + "/healthz", timeout=2) as r:
                    if r.status == 200:
                        return self.base_url
            except Exception:
                time.sleep(0.1)
        raise RuntimeError("server did not become healthy")

    @property
    def base_url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def submit(self, coro):
        return asyncio.run_coroutine_threadsafe(coro, self.loop)

    def stop(self):
        async def shutdown():
            await self._runner.cleanup()

        try:
            asyncio.run_coroutine_threadsafe(shutdown(), self.loop).result(timeout=10)
        except Exception:
            pass
        self.loop.call_soon_threadsafe(self.loop.stop)
        self._thread.join(timeout=10)


class _WsShim:
    """A real WebSocket client presented through the browser API. IO runs on
    the server thread's loop; events queue into the browser's pump."""

    def __init__(self, browser: "HeadlessBrowser", url: str):
        self.browser = browser
        self.url = url
        self.obj = JSObject()
        self.obj["readyState"] = 0.0  # CONNECTING
        self.obj["send"] = self._send
        self.obj["close"] = self._close
        self._ws = None
        browser._queue_io(self._connect())

    async def _connect(self):
        import aiohttp

        try:
            session = aiohttp.ClientSession()
            self._ws = await session.ws_connect(self.url, max_msg_size=8 * 1024 * 1024)
            self._session = session
        except Exception as e:
            self.browser.enqueue_event(lambda: self._fire("onerror", str(e)))
            self.browser.enqueue_event(lambda: self._fire("onclose", ""))
            return
        self.browser.enqueue_event(self._mark_open)

        async def reader():
            import aiohttp as _a

            async for msg in self._ws:
                if msg.type == _a.WSMsgType.TEXT:
                    data = msg.data
                    self.browser.enqueue_event(lambda d=data: self._fire_message(d))
                elif msg.type in (_a.WSMsgType.CLOSED, _a.WSMsgType.ERROR):
                    break
            self.browser.enqueue_event(lambda: self._fire("onclose", ""))

        asyncio.ensure_future(reader())

    def _mark_open(self):
        self.obj["readyState"] = 1.0
        self._fire("onopen", "")

    def _fire(self, name: str, detail: str):
        if name == "onclose":
            self.obj["readyState"] = 3.0
        fn = self.obj.get(name)
        if fn not in (None, UNDEFINED):
            ev = JSObject()
            ev["type"] = name[2:]
            ev["message"] = detail
            self.browser.interp.ops = 0
            self.browser.interp.call_function(fn, [ev], UNDEFINED)

    def _fire_message(self, data: str):
        fn = self.obj.get("onmessage")
        if fn not in (None, UNDEFINED):
            ev = JSObject()
            ev["type"] = "message"
            ev["data"] = data
            self.browser.interp.ops = 0
            self.browser.interp.call_function(fn, [ev], UNDEFINED)

    def _send(self, data=""):
        data = js_to_string(data)
        if self._ws is None:
            raise RuntimeError("WebSocket not open")
        self.browser._queue_io(self._ws.send_str(data))

    def _close(self, *_a):
        if self._ws is not None:
            self.browser._queue_io(self._ws.close())


class HeadlessBrowser:
    """Loads a page from the live server and executes its scripts.

    Usage::

        srv = ServerThread(); srv.start()
        b = HeadlessBrowser(srv); b.open("/")
        b.pump(1.0)                       # run timers + deliver WS events
        b.doc["getElementById"]("btn-x").dispatch("click")
    """

    def __init__(self, server: ServerThread):
        self.server = server
        self.interp = JSInterpreter(op_budget=100_000_000)
        self.doc: Optional[Document] = None
        self._timers: List = []  # heap of (due, seq, id, fn, interval_ms)
        self._timer_ids = itertools.count(1)
        self._cancelled: set = set()
        self._events: List[Callable] = []  # thread-safe inbox (WS, io)
        self._events_lock = threading.Lock()
        self.console: List[str] = []
        self.local_storage: dict = {}  # seedable before open()
        self.interp.pending_pump = self._pump_once

    # -- io plumbing ---------------------------------------------------------
    def _queue_io(self, coro):
        return asyncio.run_coroutine_threadsafe(coro, self.server.loop)

    def enqueue_event(self, fn: Callable):
        with self._events_lock:
            self._events.append(fn)

    # -- page load -----------------------------------------------------------
    def open(self, path: str = "/", execute: bool = True) -> Document:
        with urllib.request.urlopen(self.server.base_url + path, timeout=10) as r:
            html = r.read().decode()
        self.doc = parse_html(html)
        self.doc.interp = self.interp
        self._install_globals(path)
        if execute:
            for script in self.doc.scripts:
                self.interp.ops = 0
                self.interp.run(script)
        return self.doc

    # -- browser globals ------------------------------------------------------
    def _install_globals(self, path: str):
        interp, doc = self.interp, self.doc
        g = interp.set_global
        g("document", doc)

        location = JSObject()
        location["protocol"] = "http:"
        location["host"] = f"127.0.0.1:{self.server.port}"
        location["hostname"] = "127.0.0.1"
        location["pathname"] = path
        location["href"] = self.server.base_url + path
        g("location", location)

        window = JSObject()
        window["location"] = location
        window["document"] = doc
        g("window", window)
        g("navigator", JSObject())

        storage_data = self.local_storage
        storage = JSObject()
        storage["getItem"] = lambda k="": storage_data.get(js_to_string(k))
        storage["setItem"] = lambda k="", v="": storage_data.__setitem__(
            js_to_string(k), js_to_string(v)
        )
        storage["removeItem"] = lambda k="": storage_data.pop(js_to_string(k), None) and None
        g("localStorage", storage)

        def _console_line(*args):
            self.console.append(" ".join(js_to_string(a) for a in args))

        console = JSObject()
        for level in ("log", "warn", "error", "info", "debug"):
            console[level] = _console_line
        g("console", console)

        # timers -----------------------------------------------------------------
        def set_timer(fn=None, delay=0.0, interval=False):
            tid = next(self._timer_ids)
            due = time.monotonic() + max(0.0, float(delay or 0.0)) / 1000.0
            heapq.heappush(
                self._timers,
                (due, tid, fn, float(delay or 0.0) if interval else None),
            )
            return float(tid)

        def clear_timer(tid=0.0):
            try:
                self._cancelled.add(int(float(tid)))
            except (TypeError, ValueError):
                pass

        g("setTimeout", lambda fn=None, delay=0.0, *a: set_timer(fn, delay, False))
        g("setInterval", lambda fn=None, delay=0.0, *a: set_timer(fn, delay, True))
        g("clearTimeout", clear_timer)
        g("clearInterval", clear_timer)
        g("requestAnimationFrame", lambda fn=None: set_timer(fn, 16.0, False))

        # fetch --------------------------------------------------------------------
        g("fetch", self._fetch)
        g("WebSocket", lambda url="": _WsShim(self, js_to_string(url)).obj)

        def _form_data():
            fd = JSObject()
            entries: List = []
            fd["append"] = lambda name="", value="", filename=UNDEFINED: entries.append(
                (js_to_string(name), value, None if filename is UNDEFINED else js_to_string(filename))
            )
            fd["_entries"] = lambda: entries
            return fd

        g("FormData", _form_data)

        def _blob(parts=None, opts=None):
            b = JSObject()
            data = b""
            if isinstance(parts, JSArray):
                for p in parts:
                    if isinstance(p, str):
                        data += p.encode()
                    elif isinstance(p, (bytes, bytearray)):
                        data += bytes(p)
            b["_bytes"] = data
            b["size"] = float(len(data))
            b["type"] = js_to_string(opts.get("type", "")) if isinstance(opts, JSObject) else ""
            return b

        g("Blob", _blob)

        def _dom_point(x=0.0, y=0.0, *_a):
            pt = JSObject()
            pt["x"] = float(x or 0.0)
            pt["y"] = float(y or 0.0)
            pt["matrixTransform"] = lambda _m=None: pt  # identity CTM shim
            return pt

        g("DOMPoint", _dom_point)

        def _text_decoder(*_a):
            dec = JSObject()

            def _decode(value=b"", _opts=None):
                if isinstance(value, (bytes, bytearray)):
                    return bytes(value).decode(errors="replace")
                return js_to_string(value)

            dec["decode"] = _decode
            return dec

        def _text_encoder(*_a):
            enc = JSObject()
            enc["encode"] = lambda s="": js_to_string(s).encode()
            return enc

        g("TextDecoder", _text_decoder)
        g("TextEncoder", _text_encoder)

        import urllib.parse as _up

        g("encodeURIComponent", lambda s="": _up.quote(js_to_string(s), safe=""))
        g("decodeURIComponent", lambda s="": _up.unquote(js_to_string(s)))
        g("encodeURI", lambda s="": _up.quote(js_to_string(s), safe=":/?&=#"))
        g("atob", lambda s="": __import__("base64").b64decode(js_to_string(s)).decode("latin1"))
        g("btoa", lambda s="": __import__("base64").b64encode(js_to_string(s).encode("latin1")).decode())
        url_ns = JSObject()
        url_ns["createObjectURL"] = lambda b=None: "blob:headless"
        url_ns["revokeObjectURL"] = lambda u="": None
        g("URL", url_ns)
        # WebCodecs / WebTransport / AudioContext intentionally absent: the
        # UI must degrade gracefully (Stream view shows "unavailable").

    # -- fetch ------------------------------------------------------------------
    def _fetch(self, url="", opts=None):
        url = js_to_string(url)
        if url.startswith("/") or not url.startswith("http"):
            url = self.server.base_url + ("" if url.startswith("/") else "/") + url
        method = "GET"
        headers = {}
        body = None
        if isinstance(opts, JSObject):
            method = js_to_string(opts.get("method", "GET")).upper() or "GET"
            h = opts.get("headers")
            if isinstance(h, JSObject):
                headers = {k: js_to_string(v) for k, v in h.items()}
            raw = opts.get("body")
            if isinstance(raw, str):
                body = raw.encode()
            elif isinstance(raw, JSObject) and "_entries" in raw:
                body, ctype = _encode_multipart(raw["_entries"]())
                headers["Content-Type"] = ctype
            elif isinstance(raw, JSObject) and "_bytes" in raw:
                body = raw["_bytes"]
        req = urllib.request.Request(url, data=body, headers=headers, method=method)
        try:
            resp = urllib.request.urlopen(req, timeout=30)
            status, payload = resp.status, resp.read()
            resp_headers = dict(resp.headers)
        except urllib.error.HTTPError as e:
            status, payload = e.code, e.read()
            resp_headers = dict(e.headers)
        except Exception as e:
            # network failure → rejected promise (fetch semantics)
            rej = self.interp.globals.get("Promise")["reject"]
            return rej(f"fetch failed: {e}")

        r = JSObject()
        r["ok"] = 200 <= status < 300
        r["status"] = float(status)
        text = payload.decode(errors="replace")
        p_resolve = self.interp.globals.get("Promise")["resolve"]
        r["text"] = lambda: p_resolve(text)

        def _json():
            try:
                return p_resolve(from_python(json.loads(text)))
            except ValueError as e:
                rej = self.interp.globals.get("Promise")["reject"]
                return rej(f"invalid json: {e}")

        r["json"] = _json

        def _blob():
            blob = JSObject()
            blob["_bytes"] = payload
            blob["size"] = float(len(payload))
            blob["type"] = resp_headers.get("Content-Type", "")
            return p_resolve(blob)

        r["blob"] = _blob
        # streaming body: one-chunk reader (r.body.getReader().read())
        body_obj = JSObject()

        def _get_reader():
            state = {"done": False}
            reader = JSObject()

            def _read():
                out = JSObject()
                if state["done"]:
                    out["done"] = True
                    out["value"] = UNDEFINED
                else:
                    state["done"] = True
                    out["done"] = False
                    out["value"] = payload
                return p_resolve(out)

            reader["read"] = _read
            reader["cancel"] = lambda *_a: p_resolve(UNDEFINED)
            return reader

        body_obj["getReader"] = _get_reader
        r["body"] = body_obj
        hdrs = JSObject()
        hdrs["get"] = lambda k="": resp_headers.get(js_to_string(k)) or resp_headers.get(
            js_to_string(k).title()
        )
        r["headers"] = hdrs
        return p_resolve(r)

    # -- event loop ----------------------------------------------------------------
    def _pump_once(self) -> bool:
        """Deliver one queued IO event or one due timer. Returns True if
        something ran (the await-pump progress signal)."""
        fn = None
        with self._events_lock:
            if self._events:
                fn = self._events.pop(0)
        if fn is not None:
            fn()
            return True
        now = time.monotonic()
        while self._timers and self._timers[0][0] <= now:
            due, tid, tfn, interval = heapq.heappop(self._timers)
            if tid in self._cancelled:
                self._cancelled.discard(tid)
                continue
            if interval is not None:
                heapq.heappush(
                    self._timers, (now + max(1.0, interval) / 1000.0, tid, tfn, interval)
                )
            if tfn not in (None, UNDEFINED):
                self.interp.ops = 0
                self.interp.call_function(tfn, [], UNDEFINED)
            return True
        time.sleep(0.002)  # idle: let IO threads deliver
        return False

    def pump(self, seconds: float = 0.5):
        """Run the event loop for a wall-clock window."""
        deadline = time.monotonic() + seconds
        while time.monotonic() < deadline:
            self._pump_once()

    def pump_until(self, cond: Callable[[], bool], timeout: float = 10.0) -> bool:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if cond():
                return True
            self._pump_once()
        return cond()

    # -- conveniences ------------------------------------------------------------
    def by_id(self, el_id: str):
        el = self.doc._by_id(el_id)
        if el is None:
            raise KeyError(f"no element #{el_id}")
        return el

    def eval(self, src: str):
        self.interp.ops = 0
        return to_python(self.interp.run(src))


def _encode_multipart(entries) -> tuple:
    boundary = "----skitheadless"
    out = []
    for name, value, filename in entries:
        out.append(f"--{boundary}\r\n".encode())
        if isinstance(value, JSObject) and "_bytes" in value:
            fn = filename or "blob"
            ctype = js_to_string(value.get("type", "")) or "application/octet-stream"
            out.append(
                f'Content-Disposition: form-data; name="{name}"; filename="{fn}"\r\n'
                f"Content-Type: {ctype}\r\n\r\n".encode()
            )
            out.append(value["_bytes"])
        else:
            out.append(f'Content-Disposition: form-data; name="{name}"\r\n\r\n'.encode())
            out.append(js_to_string(value).encode())
        out.append(b"\r\n")
    out.append(f"--{boundary}--\r\n".encode())
    return b"".join(out), f"multipart/form-data; boundary={boundary}"
