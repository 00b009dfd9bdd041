#!/usr/bin/env python3
# SPDX-License-Identifier: Apache-2.0
"""Build the sample *component-model* gain plugin.

The reference ships component plugins built by cargo-component against
``wit/plugin.wit``; this image has no wasm toolchain, so the in-repo
component SDK assembles the same artifact from scratch
(``streamkit_tpu.plugins.component_asm``): a core-wasm guest implementing
the ``streamkit:plugin/node`` world (canonical ABI, resource state, host
``send-output``) wrapped in a layer-1 component binary.

Usage: build_gain_component.py [out.wasm]
Upload the result to a running server:
    skit plugins install gain-component.wasm
or POST it to /api/v1/plugins — it registers as ``plugin::wasm::gain``
(the kind comes from the plugin's own metadata() export).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from streamkit_tpu.plugins.component_asm import build_gain_component  # noqa: E402

out = sys.argv[1] if len(sys.argv) > 1 else "gain-component.wasm"
data = build_gain_component()
with open(out, "wb") as f:
    f.write(data)
print(f"wrote {out} ({len(data)} bytes)")
