# SPDX-License-Identifier: Apache-2.0
"""TTS serving bench: concurrent realtime VITS synthesis sessions per chip.

The reference synthesizes per-stream, serially, inside each kokoro/piper
node (``plugins/native/kokoro/src/kokoro_node.rs:444-532``) — one sentence
at a time per session. Our TTS node cross-session-batches sentences through
the process-wide DeviceBatcher (``nodes/ml/tts_node.py``): all sessions'
sentences sharing a token bucket coalesce into ONE padded+masked
``vits.synthesize`` call, so the MXU sees batch width instead of B=1.

A realtime TTS session must synthesize audio at least as fast as it plays:
sustainable sessions = N x generated_audio_seconds / wall_seconds.

Env: SK_TTS_SESSIONS (8), SK_TTS_SENTENCES (6, per session),
     SK_TTS_BATCHED (1; 0 = per-node direct calls for the A/B),
     SK_TTS_PLATFORM (unset = real chip; "cpu" smoke).
"""

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SENTS = [
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "Streaming speech synthesis batches sentences across live sessions.",
    "A second speaker asks a longer question about the weather tomorrow.",
    "Short reply.",
    "Numbers like forty two and dates like june first are spoken plainly.",
    "The final sentence closes the session with a slightly longer clause to pad things out.",
]


def main() -> dict:
    if os.environ.get("SK_TTS_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["SK_TTS_PLATFORM"])
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/skit-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from streamkit_tpu.core import (
        Channel,
        NodeContext,
        OutputSender,
        Packet,
        ResourceManager,
    )
    from streamkit_tpu.engine.batcher import DeviceBatcher
    from streamkit_tpu.nodes.ml.tts_node import TtsNode

    n_sessions = int(os.environ.get("SK_TTS_SESSIONS", "8"))
    n_sent = int(os.environ.get("SK_TTS_SENTENCES", "6"))
    batched = os.environ.get("SK_TTS_BATCHED", "1") == "1"

    async def run() -> dict:
        batcher = DeviceBatcher(tick_ms=5.0) if batched else None
        if batcher:
            batcher.start()
        resources = ResourceManager()  # shared weights, like the engine

        audio_samples = [0] * n_sessions
        sample_rate = [24000]

        async def one_session(i: int):
            node = TtsNode({"backend": "vits", "sample_rate": 24000})
            in_ch = Channel(64)
            out_ch = Channel(4096)
            ctx = NodeContext(
                node_name=f"tts{i}",
                inputs={"in": in_ch},
                output=OutputSender(f"tts{i}", direct={"out": out_ch}),
                batcher=batcher,
                resources=resources,
            )

            async def feed():
                for k in range(n_sent):
                    await in_ch.send(Packet.new_text(SENTS[(i + k) % len(SENTS)] + " "))
                in_ch.close()

            async def drain():
                while True:
                    pkt = await out_ch.recv_optional()
                    if pkt is None:
                        return
                    if pkt.audio is not None:
                        audio_samples[i] += pkt.audio.num_samples
                        sample_rate[0] = pkt.audio.format.sample_rate

            run_task = asyncio.ensure_future(node.run(ctx))
            drain_task = asyncio.ensure_future(drain())  # concurrent: the
            # node blocks on a full output channel otherwise
            await feed()
            await run_task
            out_ch.close()
            await drain_task

        # warmup: compile the bucket shapes once (one session, not timed)
        await one_session(0)
        audio_samples[0] = 0

        t0 = time.perf_counter()
        await asyncio.gather(*(one_session(i) for i in range(n_sessions)))
        wall = time.perf_counter() - t0
        if batcher:
            stats = batcher.stats()
            batcher.stop()
        else:
            stats = {}
        audio_s = sum(audio_samples) / sample_rate[0]
        # each realtime session needs 1 s of audio per wall second, so the
        # chip sustains (total audio generated / wall) concurrent sessions
        return {
            "metric": "concurrent realtime VITS TTS sessions/chip "
            f"({'cross-session batched' if batched else 'per-node serial'})",
            "value": round(audio_s / wall, 1),
            "unit": "sessions",
            "detail": {
                "fed_sessions": n_sessions,
                "sentences_per_session": n_sent,
                "audio_s_total": round(audio_s, 2),
                "wall_s": round(wall, 2),
                "realtime_factor_per_session": round(audio_s / n_sessions / wall, 3),
                "batcher": stats,
            },
        }

    return asyncio.run(run())


if __name__ == "__main__":
    print(json.dumps(main()))
