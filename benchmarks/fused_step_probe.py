# SPDX-License-Identifier: Apache-2.0
"""Fused-stream-step cost probe (real chip): the device-side budget behind
the ≥64-paced-sessions north star.

Measures the identity-packed fused step (VAD + ring append + 2-chunk encode
+ N decode steps, ONE device call) at full batch width, plus component
micro-benches. Serving math: 64 co-paced sessions emit one 256 ms VAD
block each per period and coalesce into ONE fused call, so the call must
complete well under 256 ms for queueing not to build (partial-latency
budget: block assembly + call + host fan-out < 300 ms p50).

Run: ``python benchmarks/fused_step_probe.py`` (knobs: PROBE_SLOTS,
PROBE_MODEL, PROBE_STEPS, PROBE_ITERS).

Timing rule (PERF_NOTES calibration note): ``block_until_ready`` does NOT
synchronize under the axon tunnel — every timed call fetches one element;
subtract the printed empty-jit floor (~40 ms RTT) for device time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SLOTS = int(os.environ.get("PROBE_SLOTS", "64"))
MODEL = os.environ.get("PROBE_MODEL", "large-v3")
STEPS = int(os.environ.get("PROBE_STEPS", "3"))
ITERS = int(os.environ.get("PROBE_ITERS", "8"))
os.environ["SK_STREAM_SLOTS"] = str(SLOTS)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/skit-jax-cache")

from streamkit_tpu.engine.audio_ring import SessionAudioRing, pcm_to_wire
from streamkit_tpu.models.whisper import WHISPER_CONFIGS, init_params
from streamkit_tpu.models.whisper.streaming import StreamTable
from streamkit_tpu.ops.vad import VAD_FRAME


def timeit(name, fn, iters=ITERS):
    t0 = time.time()
    r = fn()
    _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(f"# {name} compile+1st {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _i in range(iters):
        t0 = time.time()
        r = fn()
        _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    print(
        f"{name}: mean {np.mean(ts) * 1000:.0f} ms  min {np.min(ts) * 1000:.0f} ms",
        flush=True,
    )


def main():
    cfg = WHISPER_CONFIGS[MODEL]
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    ring = SessionAudioRing(max_slots=SLOTS + 8)
    tbl = StreamTable(cfg, jnp.bfloat16)
    for _ in range(SLOTS + 1):
        ring.alloc()
    print(
        f"# model={MODEL} slots={tbl.max_slots} int8={tbl.kv_int8} "
        f"enc_t={tbl.enc_t} dec_t={tbl.dec_t}",
        flush=True,
    )
    prefix = np.asarray(
        [cfg.token_sot, cfg.token_language(0), cfg.token_transcribe, cfg.token_no_timestamps],
        np.int32,
    )

    f0 = jax.jit(lambda x: x + 1)
    timeit("empty jit (RTT floor)", lambda: f0(jnp.float32(1)))

    def fused(active, steps, nf=8, n_chunks=2):
        rows = list(range(tbl.max_slots))
        meta = np.stack(
            [
                np.concatenate(
                    [
                        np.asarray(
                            [
                                r if r < active else SLOTS,  # trash slot for gaps
                                r,
                                0,
                                0,
                                n_chunks if r < active else 0,
                                1 if r < active else 0,
                                0,
                            ],
                            np.int32,
                        ),
                        prefix,
                    ]
                )
                for r in rows
            ]
        )
        fb = pcm_to_wire(
            np.random.RandomState(0).randn(tbl.max_slots, nf, VAD_FRAME).astype(np.float32) * 0.2
        )
        return lambda: tbl.step(
            params, ring, meta, None, None, None, None, None, fb, steps,
            n_chunks=n_chunks,
        )[0]

    if os.environ.get("PROBE_SWEEP", "0") == "1":
        # throughput sweep: per-call cost across (block frames, chunk budget,
        # decode steps). Effective sessions/chip = 64 * block_audio / call.
        for nf, nc, steps in [
            (8, 2, 2), (16, 4, 2), (16, 4, 3), (32, 8, 3), (32, 8, 2),
        ]:
            name = f"fused B={tbl.max_slots} nf={nf} chunks={nc} steps={steps}"
            timeit(name, fused(SLOTS, steps, nf=nf, n_chunks=nc))
        return
    timeit(f"fused identity B={tbl.max_slots} steps={STEPS}", fused(SLOTS, STEPS))
    timeit(f"fused identity B={tbl.max_slots} steps=1", fused(SLOTS, 1))
    budget = 256.0
    print(f"# serving budget: one call per {budget:.0f} ms block period", flush=True)


if __name__ == "__main__":
    main()
