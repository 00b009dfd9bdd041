# SPDX-License-Identifier: Apache-2.0
"""Headline benchmark: concurrent real-time Whisper STT sessions per chip.

North star (BASELINE.md): ≥64 concurrent real-time Whisper-large sessions
per v5e chip. A real-time session consumes one 30 s audio window every 30 s
of wall clock, so sustainable sessions = B × 30 / t_window(B), where
t_window is the full STT cost for a batch of B windows: log-mel frontend +
encoder + greedy decode (VAD/segmentation cost is host-side and negligible).

Weights are random (timing is weight-independent); decode runs a fixed
token budget (real speech averages ~2.5 tok/s → 48 tokens ≈ 19 s of speech
per 30 s window, a conservative-to-typical budget).

Env knobs: SK_BENCH_MODEL (default large-v3), SK_BENCH_BATCHES,
SK_BENCH_TOKENS, SK_BENCH_DTYPE.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from streamkit_tpu.models.whisper.config import WHISPER_CONFIGS
    from streamkit_tpu.models.whisper.decode import _greedy_loop
    from streamkit_tpu.models.whisper.model import encode, init_params
    from streamkit_tpu.ops.mel import log_mel_spectrogram

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/skit-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    model_name = os.environ.get("SK_BENCH_MODEL", "large-v3")
    dtype = jnp.bfloat16 if os.environ.get("SK_BENCH_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
    max_tokens = int(os.environ.get("SK_BENCH_TOKENS", "48"))
    default_batches = "24,48" if "large" in model_name else "32,64,128"
    batches = [int(b) for b in os.environ.get("SK_BENCH_BATCHES", default_batches).split(",")]

    cfg = WHISPER_CONFIGS[model_name]
    params = init_params(cfg, jax.random.PRNGKey(0), dtype)
    # pin params on device once
    params = jax.device_put(params)

    n_samples = 30 * 16000

    # two programs, not one: encode and decode peaks then don't stack, which
    # admits larger batches (fused large-v3 OOMs at batch 22; split fits) —
    # and the serving node issues them as separate batcher calls anyway
    @jax.jit
    def enc_window(params, audio):
        mel = log_mel_spectrogram(audio, cfg.n_mels).astype(dtype)
        return encode(params, cfg, mel)

    @jax.jit
    def dec_window(params, audio_states):
        prefix = jnp.broadcast_to(
            jnp.asarray(
                [cfg.token_sot, cfg.token_language(0), cfg.token_transcribe, cfg.token_no_timestamps],
                jnp.int32,
            ),
            (audio_states.shape[0], 4),
        )
        tokens, lengths = _greedy_loop(
            params, cfg, audio_states, prefix, max_tokens,
            cross_kv_int8=os.environ.get("SK_KV_INT8", "1") == "1",
        )
        return tokens

    def stt_window(params, audio):
        return dec_window(params, enc_window(params, audio))

    rng = np.random.RandomState(0)
    best_sessions = 0.0
    best_batch = 0
    results = {}
    for b in batches:
        audio = jnp.asarray(rng.randn(b, n_samples).astype(np.float32) * 0.1)
        try:
            # NOTE: block_until_ready does NOT synchronize under the axon
            # tunnel (PERF_NOTES calibration note) — force a 1-element fetch
            out = stt_window(params, audio)  # compile
            np.asarray(out[:1, :1])
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = stt_window(params, audio)
                np.asarray(out[:1, :1])
                times.append(time.perf_counter() - t0)
            t_window = min(times)
        except Exception as e:  # OOM at large batch: stop scaling
            print(f"# batch {b} failed: {type(e).__name__}: {e}", file=sys.stderr)
            break
        sessions = b * 30.0 / t_window
        results[b] = (t_window, sessions)
        print(f"# batch={b}: t_window={t_window:.3f}s -> {sessions:.1f} sessions/chip", file=sys.stderr)
        if sessions > best_sessions:
            best_sessions = sessions
            best_batch = b

    return {
        "metric": f"concurrent realtime whisper-{model_name} STT sessions/chip "
        f"(30s windows, {max_tokens} decode tokens, batch={best_batch})",
        "value": round(best_sessions, 1),
        "unit": "sessions",
        "vs_baseline": round(best_sessions / 64.0, 2),
    }


if __name__ == "__main__":
    # SK_BENCH_PLATFORM=cpu forces the CPU backend for smoke runs: env-var
    # overrides (JAX_PLATFORMS/JAX_PLATFORM_NAME) are pinned to axon by the
    # environment's sitecustomize, and a dead tunnel then hangs forever —
    # only a post-import config update wins (tests/conftest.py note).
    if os.environ.get("SK_BENCH_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["SK_BENCH_PLATFORM"])
    # Two numbers (VERDICT r1 "make the headline bench end-to-end"):
    #   * engine  — sessions sustained through the dynamic data path
    #               (packets → VAD rings → continuous batcher → decode);
    #               the honest headline, printed as THE json line
    #   * model   — device-capacity ceiling (kernels only), carried in the
    #               "ceiling_model_only" field
    mode = os.environ.get("SK_BENCH_MODE", "both")
    ceiling = main() if mode in ("model", "both") else None
    if mode == "model":
        print(json.dumps(ceiling))
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        from engine_bench import main as engine_main

        result = engine_main()
        if ceiling is not None:
            result["ceiling_model_only"] = ceiling
        print(json.dumps(result))
