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

        def _ids_to_text(ids) -> str:
            if pieces is not None:
                return "".join(
                    pieces[i] for i in ids if 0 <= i < len(pieces)
                ).replace("▁", " ").strip()
            return " ".join(str(i) for i in ids)  # mechanics mode: raw ids

        def transcribe_sync(samples: np.ndarray) -> str:
            # log_mel_spectrogram already emits [1, T, n_mels]
            mel = log_mel_spectrogram(jnp.asarray(samples[None, :]), cfg.n_mels)
            t_lfr = (mel.shape[1] + cfg.lfr_n - 1) // cfg.lfr_n
            mask = jnp.ones((1, t_lfr), jnp.float32)
            logits = np.asarray(forward(mel, mask))
            ids = ctc_greedy_decode(
                logits[:, 2:, :], np.ones((1, t_lfr), bool), cfg.blank_id
            )[0]
            return _ids_to_text(ids)

        # cross-session batching: segments from every sensevoice session
        # sharing the model coalesce per pow-2 sample bucket into ONE CTC
        # forward (valid-length masks per row) — the reference runs each
        # segment serially per node. Same pattern as whisper/tts/translate.
        jforward = jax.jit(
            lambda mel, mask, langs, itns: sensevoice_logits(
                params, cfg, mel, mask, langs, itns
            )
        )

        def _batch_fn(samples_b: np.ndarray, n_valid_b: np.ndarray):
            n_rows = samples_b.shape[0]
            width = 1 << max(0, (n_rows - 1).bit_length())  # pow-2 compile widths
            if width > n_rows:  # duplicate-last padding; rows are independent
                samples_b = np.concatenate(
                    [samples_b, np.repeat(samples_b[-1:], width - n_rows, 0)], 0
                )
                n_valid_b = np.concatenate(
                    [n_valid_b, np.repeat(n_valid_b[-1:], width - n_rows, 0)], 0
                )
            mel = log_mel_spectrogram(jnp.asarray(samples_b), cfg.n_mels)
            t_lfr = (mel.shape[1] + cfg.lfr_n - 1) // cfg.lfr_n
            # valid lfr frames per row from valid samples (mel hop = 160)
            valid_lfr = np.minimum(
                t_lfr, (n_valid_b // 160 + cfg.lfr_n - 1) // cfg.lfr_n
            ).astype(np.int32)
            mask = (np.arange(t_lfr)[None, :] < valid_lfr[:, None]).astype(np.float32)
            logits = np.asarray(
                jforward(
                    mel, jnp.asarray(mask),
                    jnp.full((width,), lang_id, jnp.int32),
                    jnp.full((width,), 1 if self.use_itn else 0, jnp.int32),
                )
            )[:n_rows]
            # mask covers LFR frames only; logits[:, 2:] drops the lang/itn
            # prefix and is already 1:1 with it
            id_rows = ctc_greedy_decode(
                logits[:, 2:, :], mask[:n_rows].astype(bool), cfg.blank_id
            )
            width = max(1, max(len(r) for r in id_rows))
            out = np.full((len(id_rows), width), -1, np.int32)
            lens = np.zeros(len(id_rows), np.int32)
            for b, r in enumerate(id_rows):
                out[b, : len(r)] = r
                lens[b] = len(r)
            return out, lens

        async def transcribe_batched(samples: np.ndarray) -> str:
            n = samples.shape[0]
            bucket = 1 << max(14, (n - 1).bit_length())  # >=1s @16k
            padded = np.zeros(bucket, np.float32)
            padded[:n] = samples
            # the fn closes over lang/itn — they MUST be in the kind, or a
            # session with different settings would get the first
            # registrant's transcription config
            kind = f"sensevoice:{id(params)}:{self.language}:{int(self.use_itn)}:{bucket}"
            ctx.batcher.register(kind, _batch_fn, max_batch=16, host_inputs=True, transient=True)
            ids, ln = await ctx.batcher.submit(kind, padded, np.asarray(n, np.int32))
            return _ids_to_text([int(i) for i in ids[: int(ln)]])

        seg = SpeechSegmenter(self.vad_threshold, self.min_silence_ms, self.max_segment_secs)
        state = vad_init_state()
        buf = np.zeros(0, np.float32)
        total_frames = 0

        async def emit_segment(samples: np.ndarray, start_f: int, end_f: int) -> None:
            if samples.shape[0] < VAD_FRAME:
                return
            if ctx.batcher is not None:
                text = await transcribe_batched(samples)
            else:
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
