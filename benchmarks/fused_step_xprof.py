# SPDX-License-Identifier: Apache-2.0
"""Trace the fused streaming step under jax.profiler and print the top
device ops (tools/xplane_top.py) — the measurement loop behind the
PERF_NOTES fused-step breakdowns.

Run: ``python benchmarks/fused_step_xprof.py [trace_dir]``
Knobs: PROBE_SLOTS / PROBE_MODEL / PROBE_STEPS as in fused_step_probe.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SLOTS = int(os.environ.get("PROBE_SLOTS", "64"))
MODEL = os.environ.get("PROBE_MODEL", "large-v3")
STEPS = int(os.environ.get("PROBE_STEPS", "2"))
ITERS = int(os.environ.get("PROBE_ITERS", "6"))
os.environ["SK_STREAM_SLOTS"] = str(SLOTS)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/skit-jax-cache")

from streamkit_tpu.engine.audio_ring import SessionAudioRing, pcm_to_wire
from streamkit_tpu.models.whisper import WHISPER_CONFIGS, init_params
from streamkit_tpu.models.whisper.streaming import StreamTable
from streamkit_tpu.ops.vad import VAD_FRAME


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skit_fused_trace"
    cfg = WHISPER_CONFIGS[MODEL]
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    ring = SessionAudioRing(max_slots=SLOTS + 8)
    tbl = StreamTable(cfg, jnp.bfloat16)
    for _ in range(SLOTS + 1):
        ring.alloc()
    prefix = np.asarray(
        [cfg.token_sot, cfg.token_language(0), cfg.token_transcribe, cfg.token_no_timestamps],
        np.int32,
    )
    nf = int(os.environ.get("PROBE_NF", "8"))
    n_chunks = int(os.environ.get("PROBE_CHUNKS", "2"))
    meta = np.stack(
        [
            np.concatenate(
                [np.asarray([r, r, 0, 0, n_chunks, 1, 0], np.int32), prefix]
            )
            for r in range(tbl.max_slots)
        ]
    )
    fb = pcm_to_wire(
        np.random.RandomState(0).randn(tbl.max_slots, nf, VAD_FRAME).astype(np.float32) * 0.2
    )

    def call():
        out = tbl.step(
            params, ring, meta, None, None, None, None, None, fb, STEPS,
            n_chunks=n_chunks,
        )[0]
        np.asarray(out).ravel()[:1]

    t0 = time.time()
    call()
    print(f"# compile+1st {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        call()
        ts.append(time.time() - t0)
    print(f"# warm: {min(ts) * 1000:.0f} ms min / {np.mean(ts) * 1000:.0f} mean", flush=True)

    jax.profiler.start_trace(trace_dir)
    for _ in range(ITERS):
        call()
    jax.profiler.stop_trace()
    print(f"# traced {ITERS} iters -> {trace_dir}", flush=True)

    from tools.xplane_top import grouped, top_ops

    rows, lines = top_ops(trace_dir, 48)
    print("== line totals (ms) ==")
    for k, v in sorted(lines.items(), key=lambda kv: -kv[1]):
        print(f"{v:10.2f}  {k}")
    print("== top ops (total ms across iters) ==")
    for name, t, n in rows:
        print(f"{t:10.2f}  x{n:<5d} {name}")
    print("== grouped ==")
    for k, v in grouped(rows):
        print(f"{v:10.2f}  {k}")


if __name__ == "__main__":
    main()
