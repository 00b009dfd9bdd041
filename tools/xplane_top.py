# SPDX-License-Identifier: Apache-2.0
"""Parse a jax.profiler trace dir and print top device ops by total time.

Usage: ``python tools/xplane_top.py /tmp/trace_dir [top_n]``

Complements ``server/observability.py`` (which captures traces on a live
server): this is the offline reader used for the PERF_NOTES fused-step
breakdowns — it aggregates XLA op durations from the xplane protobuf so a
bench run + this script replaces a TensorBoard round trip (no browser in
the bench environment).
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys


def _xplane_pb2():
    # proto module moved across TF versions; try the known homes
    import importlib

    for mod in (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
        "tensorflow.core.profiler.protobuf.xplane_pb2",
        "tensorboard_plugin_profile.protobuf.xplane_pb2",
    ):
        try:
            return importlib.import_module(mod)
        except ModuleNotFoundError:
            continue
    raise ModuleNotFoundError("no xplane_pb2 proto module found")


def iter_xplanes(trace_dir: str):
    xplane_pb2 = _xplane_pb2()

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    for p in paths:
        space = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            space.ParseFromString(f.read())
        yield p, space


def top_ops(trace_dir: str, top_n: int = 40):
    """Aggregate per-op total device time across all TPU planes.

    Returns (rows, line_totals): rows = [(name, total_ms, count)] sorted by
    total time; line_totals = {line_name: ms} for the device planes.
    """
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    line_totals = collections.Counter()
    for _path, space in iter_xplanes(trace_dir):
        for plane in space.planes:
            pname = plane.name
            if "TPU" not in pname and "/device:" not in pname:
                continue
            md = plane.event_metadata
            for line in plane.lines:
                lname = line.name or f"line{line.id}"
                for ev in line.events:
                    dur_ms = ev.duration_ps / 1e9
                    line_totals[f"{pname}:{lname}"] += dur_ms
                    name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                    # compact: "%fusion.12 = bf16[...]{...} fusion(...)" is
                    # thousands of chars of types; keep the lhs symbol only
                    name = name.split(" = ", 1)[0].strip()
                    per_op[(lname, name)] += dur_ms
                    per_op_n[(lname, name)] += 1
    rows = [
        (f"{l}:{n}", t, per_op_n[(l, n)])
        for (l, n), t in per_op.most_common(top_n)
    ]
    return rows, dict(line_totals)


def grouped(rows, pat=r"(fusion|copy|while|scan|custom-call|dynamic-update-slice|dynamic-slice|convolution|dot|all-reduce|scatter|gather|select|transpose|broadcast|reduce|bitcast|concatenate)"):
    g = collections.Counter()
    for name, t, _n in rows:
        m = re.search(pat, name)
        g[m.group(1) if m else "other"] += t
    return g.most_common()


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    rows, lines = top_ops(trace_dir, top_n)
    print("== line totals (ms) ==")
    for k, v in sorted(lines.items(), key=lambda kv: -kv[1]):
        print(f"{v:10.2f}  {k}")
    print(f"== top {top_n} ops by total device time (ms) ==")
    for name, t, n in rows:
        print(f"{t:10.2f}  x{n:<5d} {name}")
    print("== grouped by op class (ms) ==")
    for k, v in grouped(rows):
        print(f"{v:10.2f}  {k}")


if __name__ == "__main__":
    main()
