# SPDX-License-Identifier: Apache-2.0
"""Headless-browser e2e harness.

No browser ships in this image, so instead of Playwright (reference
``e2e/src/harness/run.ts``) the harness executes the web UI's actual
JavaScript under the package's own JS interpreter (``utils/mjs.py``) against
a Python DOM shim (:mod:`e2e.harness.dom`), with real ``fetch`` / WebSocket
traffic to an in-process server (:mod:`e2e.harness.browser`).
"""

from .browser import HeadlessBrowser, ServerThread
from .dom import Document, Element, parse_html

__all__ = ["HeadlessBrowser", "ServerThread", "Document", "Element", "parse_html"]
