# SPDX-License-Identifier: Apache-2.0
"""Browser e2e harness (reference ``e2e/src/harness/run.ts``): boots the real
server, health-gates, then drives the web UI.

Two modes:

* With ``playwright`` + a browser installed (CI, ``.github/workflows/e2e.yml``):
  drives real Chromium against the real server.
* Without (this image ships no browser): runs the HEADLESS e2e
  (``tests/test_webui_e2e.py``) — the UI's actual JavaScript executed under
  the package's own JS interpreter + DOM shim (``e2e/harness/``), with real
  HTTP/WS/multipart traffic to the real server. Same flows, executable
  anywhere.

    python e2e/run.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
import urllib.request

PORT = int(os.environ.get("SK_E2E_PORT", "18981"))
BASE = f"http://127.0.0.1:{PORT}"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_health(timeout: float = 60.0) -> None:
    """Health gate (reference run.ts:1-50 waits on /healthz before tests)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(f"{BASE}/healthz", timeout=2) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(0.5)
    raise RuntimeError("server did not become healthy")


def main() -> int:
    try:
        from playwright.sync_api import sync_playwright
    except ImportError:
        # No browser in this image: run the HEADLESS e2e instead — the web
        # UI's actual JS executed under the package's own JS interpreter
        # (utils/mjs.py) against the DOM shim (e2e/harness/), with real
        # HTTP + WS traffic to the real server. Same flows, no Chromium.
        print("playwright not installed — running the headless-browser e2e")
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.setdefault("JAX_PLATFORM_NAME", "cpu")
        env.setdefault("JAX_PLATFORMS", "cpu")
        return subprocess.call(
            [sys.executable, "-m", "pytest", "tests/test_webui_e2e.py", "-q"],
            cwd=REPO, env=env,
        )

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_PLATFORM_NAME", "cpu")
    env.setdefault("JAX_PLATFORMS", "cpu")
    server = subprocess.Popen(
        [sys.executable, "-m", "streamkit_tpu.server", "serve",
         "--address", "127.0.0.1", "--port", str(PORT)],
        cwd=REPO, env=env,
    )
    try:
        wait_health()
        with sync_playwright() as pw:
            browser = pw.chromium.launch()
            page = browser.new_page()
            page.goto(f"{BASE}/ui")
            page.wait_for_selector("#palette .pill", timeout=15_000)

            # Design: drag-free path — dblclick palette entries to add nodes,
            # export YAML, validate, create a session
            page.click('nav a[data-view="design"]')
            page.dblclick('#palette .pill:has-text("core::passthrough")')
            page.dblclick('#palette .pill:has-text("core::sink")')
            assert page.locator("#editor [data-node]").count() == 2
            page.click("#btn-to-yaml")
            page.wait_for_selector("#ed-status .ok, #ed-status .err")

            # import a known pipeline, create a session, see it in Monitor
            page.fill("#design-yaml", open(
                os.path.join(REPO, "samples", "pipelines", "system", "live_gain.yml")).read())
            page.click("#btn-validate")
            page.wait_for_selector("#design-result .ok", timeout=10_000)
            assert page.locator("#editor [data-node]").count() >= 4
            page.fill("#sample-name", "e2e-session")
            page.click("#btn-design-session")
            page.wait_for_selector("#design-result .ok", timeout=10_000)

            page.click('nav a[data-view="monitor"]')
            page.wait_for_selector('#mon-sessions .card:has-text("e2e-session")', timeout=10_000)
            page.click('#mon-sessions .card:has-text("e2e-session")')
            page.wait_for_selector('#mon-pipeline .pill', timeout=10_000)
            browser.close()
        print("e2e OK")
        return 0
    finally:
        server.terminate()
        server.wait(timeout=10)


if __name__ == "__main__":
    raise SystemExit(main())
