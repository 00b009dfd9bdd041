# SPDX-License-Identifier: Apache-2.0
"""Web UI contract tests (browser-free: no JS runtime in this image; the
browser path lives in e2e/run.py, Playwright-gated).

Checks the invariants that break the UI in practice: every element id the
script dereferences exists in the markup, script brackets balance, and every
API endpoint the UI calls is actually served."""

import asyncio
import os
import re

import pytest
from aiohttp.test_utils import TestClient, TestServer

from streamkit_tpu.server import ServerConfig, create_app

UI = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "streamkit_tpu",
    "server",
    "webui",
    "index.html",
)


@pytest.fixture(scope="module")
def page() -> str:
    return open(UI).read()


def _script(page: str) -> str:
    return page.split("<script>", 1)[1].split("</script>", 1)[0]


def test_all_referenced_ids_exist(page):
    ids = set(re.findall(r'id="([^"]+)"', page))
    referenced = set(re.findall(r'\$\("([^"]+)"\)', _script(page)))
    # ids built dynamically at runtime (inserted into innerHTML first)
    dynamic = {"btn-del-node", "btn-apply-params", "node-params", "param-status"}
    missing = referenced - ids - dynamic
    assert not missing, f"script references missing element ids: {sorted(missing)}"
    # dynamic ids must at least appear in template strings
    for d in dynamic & referenced:
        assert f'id="{d}"' in _script(page), f"dynamic id {d} never created"


def test_script_brackets_balance(page):
    js = _script(page)
    # strip strings/template literals/comments crudely but adequately
    js = re.sub(r"`(?:[^`\\]|\\.)*`", "``", js, flags=re.S)
    js = re.sub(r'"(?:[^"\\]|\\.)*"', '""', js)
    js = re.sub(r"'(?:[^'\\]|\\.)*'", "''", js)
    js = re.sub(r"//[^\n]*", "", js)
    js = re.sub(r"/\*.*?\*/", "", js, flags=re.S)
    counts = {c: js.count(c) for c in "(){}[]"}
    assert counts["("] == counts[")"], counts
    assert counts["{"] == counts["}"], counts
    assert counts["["] == counts["]"], counts


def test_views_present(page):
    for view in ("design-view", "convert-view", "stream-view", "monitor-view"):
        assert f'id="{view}"' in page
    # the editor surface + playback + charts shipped
    for el in ("editor", "btn-to-yaml", "btn-from-yaml", "btn-play", "mon-charts"):
        assert f'id="{el}"' in page, f"missing {el}"


def test_ui_api_endpoints_served(page):
    """Every GET the UI script fetches must exist on the app."""
    gets = set(re.findall(r'api\("(/api/v1/[a-z/]+)"\)', _script(page)))
    assert gets, "no API calls found in UI script"

    async def main():
        app = create_app(ServerConfig())
        client = TestClient(TestServer(app))
        await client.start_server()
        results = {}
        for path in sorted(gets):
            r = await client.get(path)
            results[path] = r.status
        # the page itself
        r = await client.get("/ui")
        results["/ui"] = r.status
        await client.close()
        return results

    results = asyncio.run(main())
    bad = {p: s for p, s in results.items() if s >= 400}
    assert not bad, f"UI-referenced endpoints failing: {bad}"


def test_ui_page_serves_current_file():
    async def main():
        app = create_app(ServerConfig())
        client = TestClient(TestServer(app))
        await client.start_server()
        r = await client.get("/ui")
        text = await r.text()
        await client.close()
        return r.status, text

    status, text = asyncio.run(main())
    assert status == 200
    assert 'id="editor"' in text  # the served page is the editor build
