# SPDX-License-Identifier: Apache-2.0
"""ctypes binding for the native session-ingestion shim.

:class:`IngestPool` owns per-session PCM accumulators and VAD-block
assembly in C++ (``native/shims/ingest.cpp``), so the Python serving loop
does ONE coalesced :meth:`drain` per engine tick instead of per-packet
asyncio work per session. Rationale and reference parity notes live in the
C++ file header; the measured motivation is round-2 PERF_NOTES: 16 paced
realtime sessions saturate a 1-core Python host on 20 ms-packet handling
alone, while the fused device path only needs one call per 256 ms block.

Transports (:mod:`..nodes.transport.moq`, WS media) push decoded PCM via
:meth:`push` from their receive callbacks; load tests and benchmarks use
:meth:`start_replay`, which paces a preloaded buffer from a C++ thread at
exact frame cadence (no Python wakeups at all).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["IngestPool", "ingest_available"]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "build",
    "libskit_ingest.so",
)

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.skingest_create.restype = ctypes.c_void_p
        lib.skingest_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.skingest_destroy.argtypes = [ctypes.c_void_p]
        lib.skingest_open.restype = ctypes.c_int
        lib.skingest_open.argtypes = [ctypes.c_void_p]
        lib.skingest_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.skingest_push.restype = ctypes.c_int
        lib.skingest_push.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ]
        lib.skingest_start_replay.restype = ctypes.c_int
        lib.skingest_start_replay.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int,
        ]
        lib.skingest_start_replay_opus.restype = ctypes.c_int
        lib.skingest_start_replay_opus.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int,
        ]
        lib.skingest_replay_start_ns.restype = ctypes.c_longlong
        lib.skingest_replay_start_ns.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.skingest_drain.restype = ctypes.c_int
        lib.skingest_drain.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.skingest_pending.restype = ctypes.c_int
        lib.skingest_pending.argtypes = [ctypes.c_void_p]
        lib.skingest_active.restype = ctypes.c_int
        lib.skingest_active.argtypes = [ctypes.c_void_p]
        lib.skingest_dropped.restype = ctypes.c_longlong
        lib.skingest_dropped.argtypes = [ctypes.c_void_p]
        lib.skingest_now_ns.restype = ctypes.c_longlong
        lib.skingest_now_ns.argtypes = []
        _lib = lib
    return _lib


def ingest_available() -> bool:
    return os.path.exists(_LIB_PATH)


class IngestPool:
    """Native multi-session PCM block assembler (see module docstring)."""

    def __init__(self, max_sessions: int, block_samples: int, queue_cap: int = 4096):
        self._lib = _load()
        self.block_samples = int(block_samples)
        self.max_sessions = int(max_sessions)
        self._pool = self._lib.skingest_create(max_sessions, block_samples, queue_cap)
        if not self._pool:
            raise RuntimeError("skingest_create failed")
        # reusable drain buffers (one drain in flight at a time)
        self._cap = max_sessions * 4
        self._ids = np.empty(self._cap, np.int32)
        self._arr = np.empty(self._cap, np.int64)
        self._blocks = np.empty((self._cap, block_samples), np.float32)

    def close(self) -> None:
        if self._pool:
            self._lib.skingest_destroy(self._pool)
            self._pool = None

    def __del__(self):  # best-effort
        try:
            self.close()
        except Exception:
            pass

    # -- sessions -----------------------------------------------------------
    def open(self) -> int:
        sid = self._lib.skingest_open(self._pool)
        if sid < 0:
            raise RuntimeError("ingest pool full")
        return sid

    def close_session(self, sid: int) -> None:
        self._lib.skingest_close(self._pool, sid)

    def push(self, sid: int, pcm: np.ndarray) -> None:
        pcm = np.ascontiguousarray(pcm, np.float32)
        rc = self._lib.skingest_push(
            self._pool, sid,
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pcm.size,
        )
        if rc != 0:
            raise RuntimeError(f"push to closed session {sid}")

    def start_replay(
        self,
        sid: int,
        audio: np.ndarray,
        frame_samples: int = 320,
        frame_us: int = 20_000,
        start_delay_us: int = 0,
        close_at_end: bool = True,
    ) -> None:
        """Pace ``audio`` into the session from a C++ thread: one
        ``frame_samples`` push every ``frame_us`` (20 ms @16 kHz default)."""
        audio = np.ascontiguousarray(audio, np.float32)
        rc = self._lib.skingest_start_replay(
            self._pool, sid,
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), audio.size,
            frame_samples, frame_us, start_delay_us, 1 if close_at_end else 0,
        )
        if rc != 0:
            raise RuntimeError(f"replay already running on session {sid}")

    def start_replay_opus(
        self,
        sid: int,
        packets: list,
        sample_rate: int = 16_000,
        channels: int = 1,
        frame_us: int = 20_000,
        start_delay_us: int = 0,
        close_at_end: bool = True,
    ) -> None:
        """Replay pre-encoded Opus ``packets`` (list of bytes): a C++ thread
        decodes each natively straight to ``sample_rate`` (libopus resamples
        internally — the compiler's fused native-rate decode) and pushes the
        PCM every ``frame_us`` (0 = full speed, for throughput benches). The
        entire ingress chain — pacing, entropy decode, block assembly — runs
        off the Python thread."""
        data = np.frombuffer(b"".join(packets), np.uint8)
        offs = np.zeros(len(packets) + 1, np.int32)
        np.cumsum([len(p) for p in packets], out=offs[1:])
        data = np.ascontiguousarray(data)
        rc = self._lib.skingest_start_replay_opus(
            self._pool, sid,
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(packets), sample_rate, channels,
            frame_us, start_delay_us, 1 if close_at_end else 0,
        )
        if rc == -2:
            raise RuntimeError("libopus unavailable for opus replay")
        if rc != 0:
            raise RuntimeError(f"replay already running on session {sid}")

    def replay_start_ns(self, sid: int) -> int:
        return int(self._lib.skingest_replay_start_ns(self._pool, sid))

    # -- draining -----------------------------------------------------------
    def drain(
        self, max_blocks: Optional[int] = None, timeout_us: int = 0
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Return (session_ids [n], arrival_ns [n], blocks [n, block_samples])
        for every completed block, oldest first. ``timeout_us`` > 0 blocks in
        C (releasing the GIL) until a block arrives or the timeout passes —
        call from a thread executor inside async code."""
        cap = min(max_blocks or self._cap, self._cap)
        n = self._lib.skingest_drain(
            self._pool, cap, timeout_us,
            self._ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            self._arr.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            self._blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return (
            self._ids[:n].copy(),
            self._arr[:n].copy(),
            self._blocks[:n].copy(),
        )

    # -- stats --------------------------------------------------------------
    def pending(self) -> int:
        return self._lib.skingest_pending(self._pool)

    def active(self) -> int:
        return self._lib.skingest_active(self._pool)

    def dropped(self) -> int:
        return int(self._lib.skingest_dropped(self._pool))

    def now_ns(self) -> int:
        return int(self._lib.skingest_now_ns())
