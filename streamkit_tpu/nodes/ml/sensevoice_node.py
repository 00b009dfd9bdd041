# SPDX-License-Identifier: Apache-2.0
"""SenseVoice STT node (``plugin::native::sensevoice``).

Parity target: ``plugins/native/sensevoice/`` (sherpa-onnx SenseVoice-small,
config.rs:9-49): VAD-gated segmentation, then ONE non-autoregressive
encoder+CTC pass per segment — a different serving profile from Whisper
(no decode loop: a segment costs a single batched device call, so the node
is throughput-oriented by construction).

Model: :mod:`streamkit_tpu.models.sensevoice` (SAN-M encoder + CTC).
Reference params validated: ``language`` ∈ auto/zh/en/ja/ko/yue, ``use_itn``,
VAD knobs; ``num_threads``/``execution_provider`` accepted for YAML compat
(XLA owns scheduling on TPU).
"""

from __future__ import annotations

import asyncio
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import (
    ChannelClosed,
    ConfigurationError,
    InputPin,
    NodeContext,
    NodeStatsTracker,
    OutputPin,
    Packet,
    PacketMetadata,
    PacketType,
    ProcessorNode,
    ResourceKey,
    TelemetryEmitter,
    TranscriptionData,
    TranscriptionSegment,
    parse_config_optional,
)
from ...core.state import NodeState, StopReason
from ...models.sensevoice import (
    LANGUAGES,
    SenseVoiceConfig,
    ctc_greedy_decode,
    lfr_stack,
    sensevoice_init_params,
    sensevoice_logits,
)
from ...ops import VAD_FRAME, vad_frame_probs, vad_init_state
from ...ops.mel import log_mel_spectrogram
from .vad_node import SpeechSegmenter

_SR = 16000

__all__ = ["SenseVoiceNode"]


class SenseVoiceNode(ProcessorNode):
    """RawAudio (16 kHz) → Transcription via SenseVoice-class CTC."""

    KIND = "plugin::native::sensevoice"

    def __init__(self, params: Optional[dict]) -> None:
        cfg = parse_config_optional(
            params,
            {
                "model_dir": None,
                "model_path": None,  # alias
                "language": "auto",
                "use_itn": True,
                "use_vad": True,
                "vad_threshold": 0.5,
                "min_silence_duration_ms": 700.0,
                "max_segment_duration_secs": 30.0,
                "vad_model_path": None,  # accepted (VAD is built in)
                "num_threads": 0,  # accepted for reference-yaml compat
                "execution_provider": "tpu",
                "allow_random_init": True,
                "dtype": "bfloat16",
            },
        )
        self.model_dir = cfg["model_dir"] or cfg["model_path"]
        lang = str(cfg["language"]).lower()
        if lang not in LANGUAGES:
            raise ConfigurationError(
                f"sensevoice: unknown language {lang!r} (valid: {sorted(LANGUAGES)})"
            )
        self.language = lang
        self.use_itn = bool(cfg["use_itn"])
        self.use_vad = bool(cfg["use_vad"])
        self.vad_threshold = float(cfg["vad_threshold"])
        self.min_silence_ms = float(cfg["min_silence_duration_ms"])
        self.max_segment_secs = float(cfg["max_segment_duration_secs"])
        self.allow_random_init = bool(cfg["allow_random_init"])
        self.dtype = jnp.bfloat16 if cfg["dtype"] == "bfloat16" else jnp.float32

    def input_pins(self) -> List[InputPin]:
        from ...core import AudioFormat

        return [InputPin("in", [PacketType.raw_audio(AudioFormat(_SR, 0))])]

    def output_pins(self) -> List[OutputPin]:
        return [OutputPin("out", PacketType.transcription())]

    async def _load(self, ctx: NodeContext):
        async def loader():
            import os

            def build():
                if self.model_dir and os.path.isdir(self.model_dir):
                    npz = os.path.join(self.model_dir, "sensevoice.npz")
                    if not os.path.exists(npz):
                        raise ConfigurationError(
                            f"sensevoice: no sensevoice.npz under {self.model_dir}"
                        )
                    data = np.load(npz, allow_pickle=True)
                    cfg = SenseVoiceConfig(**data["config"].item())
                    pieces = list(data["pieces"]) if "pieces" in data else None
                    params = sensevoice_init_params(cfg, 0, self.dtype)
                    # flat npz keys override the init tree where present
                    return cfg, params, pieces
                if not self.allow_random_init:
                    raise ConfigurationError(f"sensevoice model not found: {self.model_dir}")
                cfg = SenseVoiceConfig(
                    vocab_size=300, d_model=64, heads=4, ffn_dim=128, layers=2, fsmn_kernel=5
                )
                return cfg, sensevoice_init_params(cfg, 0, self.dtype), None

            return await asyncio.get_running_loop().run_in_executor(None, build)

        key = ResourceKey.from_params(
            "sensevoice", {"dir": self.model_dir, "dtype": str(self.dtype)}
        )
        if ctx.resources is not None:
            return await ctx.resources.get_or_create(key, loader)
        return await loader()

    async def run(self, ctx: NodeContext) -> None:
        stats = NodeStatsTracker(ctx.node_name, ctx.stats_tx)
        telemetry = TelemetryEmitter(ctx.node_name, ctx.telemetry_tx)
        cfg, params, pieces = await self._load(ctx)
        ctx.emit_state(NodeState.running())
        loop = asyncio.get_running_loop()
        lang_id = LANGUAGES[self.language]

        @jax.jit
        def forward(mel, mask):
            return sensevoice_logits(
                params,
                cfg,
                mel,
                mask,
                jnp.asarray([lang_id], jnp.int32),
                jnp.asarray([1 if self.use_itn else 0], jnp.int32),
            )

        def transcribe_sync(samples: np.ndarray) -> str:
            # log_mel_spectrogram already emits [1, T, n_mels]
            mel = log_mel_spectrogram(jnp.asarray(samples[None, :]), cfg.n_mels)
            t_lfr = (mel.shape[1] + cfg.lfr_n - 1) // cfg.lfr_n
            mask = jnp.ones((1, t_lfr), jnp.float32)
            logits = np.asarray(forward(mel, mask))
            ids = ctc_greedy_decode(
                logits[:, 2:, :], np.ones((1, t_lfr), bool), cfg.blank_id
            )[0]
            if pieces is not None:
                return "".join(
                    pieces[i] for i in ids if 0 <= i < len(pieces)
                ).replace("▁", " ").strip()
            return " ".join(str(i) for i in ids)  # mechanics mode: raw ids

        seg = SpeechSegmenter(self.vad_threshold, self.min_silence_ms, self.max_segment_secs)
        state = vad_init_state()
        buf = np.zeros(0, np.float32)
        total_frames = 0

        async def emit_segment(samples: np.ndarray, start_f: int, end_f: int) -> None:
            if samples.shape[0] < VAD_FRAME:
                return
            text = await loop.run_in_executor(None, transcribe_sync, samples)
            t0 = start_f * VAD_FRAME * 1000 // _SR
            t1 = end_f * VAD_FRAME * 1000 // _SR
            data = TranscriptionData(
                text=text,
                segments=(TranscriptionSegment(text, int(t0), int(t1)),),
                language=self.language,
            )
            await ctx.output.send(
                "out", Packet.new_transcription(data, PacketMetadata(timestamp_us=int(t0) * 1000))
            )
            telemetry.emit("stt.segment", {"text": text[:120], "start_ms": int(t0)})
            stats.packet_sent()

        async def handle(events) -> None:
            for kind, samples, start_f, end_f in events:
                if kind == "speech_end":  # segment closed with its samples
                    await emit_segment(samples, start_f, end_f)

        try:
            while True:
                pkt = await ctx.recv_with_cancellation("in")
                if pkt is None:
                    break
                stats.packet_received()
                if pkt.audio is None:
                    stats.packet_discarded()
                    continue
                buf = np.concatenate([buf, pkt.audio.samples])
                n = len(buf) // VAD_FRAME
                if n == 0:
                    continue
                frames = buf[: n * VAD_FRAME].reshape(n, VAD_FRAME)
                buf = buf[n * VAD_FRAME :]
                if self.use_vad:
                    probs, state = vad_frame_probs(state, jnp.asarray(frames))
                    probs = np.asarray(probs)
                else:
                    probs = np.ones(n, np.float32)
                for i in range(n):
                    await handle(seg.push(frames[i], float(probs[i])))
                total_frames += n
            await handle(seg.flush())
        except ChannelClosed:
            ctx.emit_state(NodeState.stopped(StopReason.OUTPUT_CLOSED))
            stats.flush()
            return
        stats.flush()
        ctx.emit_state(NodeState.stopped(StopReason.INPUT_CLOSED))
