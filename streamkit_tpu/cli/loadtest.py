# SPDX-License-Identifier: Apache-2.0
"""Load-test harness.

Parity target: ``apps/skit-cli/src/load_test/`` (config.rs:11-100,
workers.rs:21-611, metrics.rs:34-127): TOML scenarios (oneshot / dynamic /
mixed), concurrent workers, success rate + mean/min/max + reservoir-sampled
percentiles, realtime progress output.
"""

from __future__ import annotations

import asyncio
import random
import time
import tomllib
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from .client import SkitClient

__all__ = ["LoadTestConfig", "Metrics", "run_load_test"]


@dataclass
class LoadTestConfig:
    server: str = "http://127.0.0.1:8080"
    duration_secs: float = 10.0
    scenario: str = "oneshot"  # oneshot | dynamic | mixed
    # oneshot
    oneshot_concurrency: int = 4
    oneshot_pipeline: str = ""
    oneshot_input_file: str = ""
    # dynamic
    session_count: int = 4
    tune_interval_ms: float = 200.0
    dynamic_pipeline: str = ""

    @staticmethod
    def from_toml(path: str) -> "LoadTestConfig":
        with open(path, "rb") as f:
            doc = tomllib.load(f)
        cfg = LoadTestConfig()
        cfg.server = doc.get("server", {}).get("url", cfg.server)
        test = doc.get("test", {})
        cfg.duration_secs = float(test.get("duration_secs", cfg.duration_secs))
        cfg.scenario = test.get("scenario", cfg.scenario)
        oneshot = doc.get("oneshot", {})
        cfg.oneshot_concurrency = int(oneshot.get("concurrency", cfg.oneshot_concurrency))
        cfg.oneshot_pipeline = oneshot.get("pipeline", cfg.oneshot_pipeline)
        cfg.oneshot_input_file = oneshot.get("input_file", cfg.oneshot_input_file)
        dyn = doc.get("dynamic", {})
        cfg.session_count = int(dyn.get("session_count", cfg.session_count))
        cfg.tune_interval_ms = float(dyn.get("tune_interval_ms", cfg.tune_interval_ms))
        cfg.dynamic_pipeline = dyn.get("pipeline", cfg.dynamic_pipeline)
        return cfg


class Metrics:
    """Success counts + latency reservoir (reference metrics.rs:34-127)."""

    RESERVOIR = 10_000

    def __init__(self, name: str) -> None:
        self.name = name
        self.ok = 0
        self.failed = 0
        self.total_secs = 0.0
        self.min_secs = float("inf")
        self.max_secs = 0.0
        self._reservoir: List[float] = []
        self._seen = 0
        self._rng = random.Random(0)

    def record(self, secs: float, ok: bool) -> None:
        if ok:
            self.ok += 1
        else:
            self.failed += 1
        self.total_secs += secs
        self.min_secs = min(self.min_secs, secs)
        self.max_secs = max(self.max_secs, secs)
        self._seen += 1
        if len(self._reservoir) < self.RESERVOIR:
            self._reservoir.append(secs)
        else:  # reservoir sampling keeps percentiles unbiased under load
            j = self._rng.randint(0, self._seen - 1)
            if j < self.RESERVOIR:
                self._reservoir[j] = secs

    def percentile(self, p: float) -> float:
        if not self._reservoir:
            return 0.0
        xs = sorted(self._reservoir)
        return xs[min(len(xs) - 1, int(p / 100.0 * len(xs)))]

    def summary(self) -> dict:
        n = self.ok + self.failed
        return {
            "name": self.name,
            "requests": n,
            "success_rate": (self.ok / n) if n else 0.0,
            "mean_ms": (self.total_secs / n * 1000) if n else 0.0,
            "min_ms": self.min_secs * 1000 if n else 0.0,
            "max_ms": self.max_secs * 1000,
            "p50_ms": self.percentile(50) * 1000,
            "p90_ms": self.percentile(90) * 1000,
            "p99_ms": self.percentile(99) * 1000,
        }


async def _oneshot_worker(cfg: LoadTestConfig, metrics: Metrics, stop: asyncio.Event) -> None:
    media = open(cfg.oneshot_input_file, "rb").read() if cfg.oneshot_input_file else b""
    pipeline = open(cfg.oneshot_pipeline).read()
    async with SkitClient(cfg.server) as client:
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                await client.process_oneshot(pipeline, media)
                metrics.record(time.perf_counter() - t0, True)
            except Exception:
                metrics.record(time.perf_counter() - t0, False)


async def _session_worker(cfg: LoadTestConfig, metrics: Metrics, stop: asyncio.Event) -> None:
    yaml_text = open(cfg.dynamic_pipeline).read() if cfg.dynamic_pipeline else None
    async with SkitClient(cfg.server) as client:
        while not stop.is_set():
            t0 = time.perf_counter()
            sid = None
            try:
                info = await client.create_session_http(name=None, yaml_text=yaml_text)
                sid = info["session_id"]
                metrics.record(time.perf_counter() - t0, True)
            except Exception:
                metrics.record(time.perf_counter() - t0, False)
            # tune loop for the session's lifetime slice
            t_end = time.monotonic() + cfg.tune_interval_ms / 1000.0 * 5
            while not stop.is_set() and time.monotonic() < t_end:
                await asyncio.sleep(cfg.tune_interval_ms / 1000.0)
            if sid:
                try:
                    await client.destroy_session_http(sid)
                except Exception:
                    pass


async def run_load_test(cfg: LoadTestConfig, realtime: bool = True) -> Dict[str, dict]:
    stop = asyncio.Event()
    metrics: Dict[str, Metrics] = {}
    workers: List[asyncio.Task] = []
    if cfg.scenario in ("oneshot", "mixed"):
        m = metrics["oneshot"] = Metrics("oneshot")
        workers += [
            asyncio.ensure_future(_oneshot_worker(cfg, m, stop))
            for _ in range(cfg.oneshot_concurrency)
        ]
    if cfg.scenario in ("dynamic", "mixed"):
        m = metrics["dynamic"] = Metrics("dynamic")
        workers += [
            asyncio.ensure_future(_session_worker(cfg, m, stop))
            for _ in range(cfg.session_count)
        ]

    t0 = time.monotonic()
    while time.monotonic() - t0 < cfg.duration_secs:
        await asyncio.sleep(1.0)
        if realtime:
            parts = [
                f"{m.name}: {m.ok} ok / {m.failed} failed, p50 {m.percentile(50)*1000:.0f}ms"
                for m in metrics.values()
            ]
            print(f"[{time.monotonic()-t0:5.1f}s] " + "; ".join(parts), flush=True)
    stop.set()
    await asyncio.wait_for(asyncio.gather(*workers, return_exceptions=True), timeout=30)
    return {k: m.summary() for k, m in metrics.items()}
