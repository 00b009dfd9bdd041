# SPDX-License-Identifier: Apache-2.0
"""Third-party license inventory + policy check.

The reference audits its dependency licenses with ``cargo deny``
(``/root/reference/deny.toml``) and renders a third-party attribution
document (``tools/licenses/third-party-licenses.hbs``). The Python/C++
analog here:

* inventories every installed Python distribution the package imports
  (via ``importlib.metadata``) plus the system C libraries the native
  shims link (libopus, mpg123, libav — known licenses, hardcoded);
* checks each license against an allowlist (permissive licenses only —
  the repo itself is Apache-2.0) and a denylist (strong copyleft);
* emits either a human-readable attribution document (``--format text``)
  or machine-readable JSON (``--format json``);
* exits non-zero when a denied or unknown license is found, so CI can
  gate on it (``make licenses``).

Run: ``python tools/licenses.py [--format text|json] [--all]``
(``--all`` inventories every installed distribution, not just the
package's import closure).
"""

from __future__ import annotations

import argparse
import json
import sys
from importlib import metadata

ALLOWED = {
    "apache-2.0", "apache 2.0", "apache software license", "apache license 2.0",
    "mit", "mit license", "bsd", "bsd-3-clause", "bsd-2-clause",
    "bsd license", "new bsd license", "isc", "isc license (iscl)",
    "python software foundation license", "psf-2.0", "psf",
    "mpl-2.0", "mozilla public license 2.0 (mpl 2.0)",
    "apache-2.0 or bsd-3-clause", "unlicense", "zlib", "zpl 2.1",
    "historical permission notice and disclaimer (hpnd)", "hpnd",
    "cmu license (mit-cmu)", "mit-cmu",
}
DENIED_MARKERS = ("gpl-3", "agpl", "sspl", "commons clause", "gpl v3")
# LGPL / GPL-2 system libs we link dynamically (allowed: dynamic linking,
# library unmodified — same posture the reference takes on ffmpeg)
SYSTEM_LIBS = [
    {"name": "libopus", "license": "BSD-3-Clause", "kind": "system"},
    {"name": "mpg123", "license": "LGPL-2.1 (dynamic)", "kind": "system"},
    {"name": "libavformat/libavcodec", "license": "LGPL-2.1 (dynamic)", "kind": "system"},
]
# direct runtime imports of streamkit_tpu (keep in sync with setup deps)
RUNTIME_DISTS = ["jax", "jaxlib", "numpy", "aiohttp", "pyyaml", "cryptography"]


def dist_license(dist: metadata.Distribution) -> str:
    md = dist.metadata
    lic = (md.get("License-Expression") or md.get("License") or "").strip()
    if not lic or lic.upper() == "UNKNOWN" or len(lic) > 120:
        for clf in md.get_all("Classifier") or []:
            if clf.startswith("License ::"):
                lic = clf.split("::")[-1].strip()
    return lic or "UNKNOWN"


def classify(lic: str) -> str:
    low = lic.lower()
    if any(m in low for m in DENIED_MARKERS):
        return "denied"
    if low in ALLOWED or any(a in low for a in ("mit", "bsd", "apache", "isc", "psf", "mpl")):
        return "allowed"
    if "lgpl" in low or "dynamic" in low:
        return "allowed-dynamic"
    return "unknown"


def inventory(all_dists: bool):
    rows = []
    if all_dists:
        dists = list(metadata.distributions())
    else:
        dists = []
        for name in RUNTIME_DISTS:
            try:
                dists.append(metadata.distribution(name))
            except metadata.PackageNotFoundError:
                pass
    seen = set()
    for d in dists:
        name = d.metadata["Name"]
        if not name or name.lower() in seen:
            continue
        seen.add(name.lower())
        lic = dist_license(d)
        rows.append(
            {
                "name": name,
                "version": d.version,
                "license": lic,
                "status": classify(lic),
                "kind": "python",
            }
        )
    for lib in SYSTEM_LIBS:
        rows.append({**lib, "version": "system", "status": classify(lib["license"])})
    return sorted(rows, key=lambda r: r["name"].lower())


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--format", choices=("text", "json"), default="text")
    ap.add_argument("--all", action="store_true", help="audit every installed dist")
    args = ap.parse_args()
    rows = inventory(args.all)
    bad = [r for r in rows if r["status"] in ("denied", "unknown")]
    if args.format == "json":
        print(json.dumps({"dependencies": rows, "violations": bad}, indent=2))
    else:
        print("Third-party licenses (streamkit_tpu)\n")
        for r in rows:
            flag = {"denied": " !! DENIED", "unknown": " ?? UNKNOWN"}.get(r["status"], "")
            print(f"  {r['name']:<28} {r['version']:<14} {r['license']}{flag}")
        if bad:
            print(f"\n{len(bad)} license violation(s)", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
