# SPDX-License-Identifier: Apache-2.0
"""Streaming TTS node: Text → RawAudio.

Parity target: ``plugin::native::kokoro`` (``plugins/native/kokoro/src/
kokoro_node.rs:25-123,444-532``; piper/matcha share the shape): buffers
incoming Text, a sentence splitter extracts complete sentences, each
sentence is synthesized as one unit, remainder flushed on EOF. Synthesis
runs on-device: acoustic model (text→mel) + HiFi-GAN vocoder
(:mod:`streamkit_tpu.models.tts`), one batched device call per sentence.
"""

from __future__ import annotations

import asyncio
import re
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from ...core import (
    AudioFormat,
    AudioFrame,
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
    parse_config_optional,
)
from ...core.state import NodeState, StopReason
from ...models.tts import (
    AcousticConfig,
    HifiGanConfig,
    acoustic_generate,
    acoustic_init_params,
    hifigan_generate,
    hifigan_init_params,
)

_SENTENCE_RE = re.compile(r"(.*?[.!?…]+(?:\s+|$))", re.S)


class SentenceSplitter:
    """Extracts complete sentences from streamed text (reference kokoro
    ``SentenceSplitter``)."""

    def __init__(self, max_len: int = 400) -> None:
        self._buf = ""
        self.max_len = max_len

    def push(self, text: str) -> List[str]:
        self._buf += text
        out: List[str] = []
        while True:
            m = _SENTENCE_RE.match(self._buf)
            if m and m.group(1).strip():
                out.append(m.group(1).strip())
                self._buf = self._buf[m.end(1) :]
                continue
            if len(self._buf) > self.max_len:
                out.append(self._buf[: self.max_len].strip())
                self._buf = self._buf[self.max_len :]
                continue
            return out

    def flush(self) -> List[str]:
        rest = self._buf.strip()
        self._buf = ""
        return [rest] if rest else []


class TtsNode(ProcessorNode):
    """Text → synthesized RawAudio (``plugin::native::kokoro`` class)."""

    KIND = "plugin::native::kokoro"

    def __init__(self, params: Optional[dict]) -> None:
        cfg = parse_config_optional(
            params,
            {
                "model_path": None,  # npz (fastspeech) or HF VitsModel dir
                "model_dir": None,  # reference param name (kokoro/piper config)
                "backend": "auto",  # auto | vits | fastspeech
                "sample_rate": 24000,
                "frames_per_char": 6,  # mel frames per input char (≈70ms/char)
                "speed": 1.0,
                "noise_scale": 0.667,  # piper/VITS sampling temperature
                "noise_scale_w": 0.8,  # duration-noise (stochastic duration)
                "length_scale": 1.0,
                "speaker_id": 0,
                "voice": None,  # accepted for reference-yaml compat
                "num_threads": None,  # reference compat (XLA owns scheduling)
                "min_sentence_length": None,
                "execution_provider": None,
                "emit_telemetry": True,
                "telemetry_preview_chars": 120,
                "allow_random_init": True,
            },
        )
        self.model_path = cfg["model_path"] or cfg["model_dir"]
        self.backend = str(cfg["backend"])
        if self.backend not in ("auto", "vits", "fastspeech", "kokoro"):
            raise ConfigurationError(f"unknown tts backend: {self.backend!r}")
        self.speaker_id = int(cfg["speaker_id"])
        if not 0 <= self.speaker_id <= 102:  # v1.1 voices (config.rs:14)
            raise ConfigurationError("speaker_id must be 0-102")
        if not 0.5 <= float(cfg["speed"]) <= 2.0:  # config.rs:18
            raise ConfigurationError("speed must be 0.5-2.0")
        self.sample_rate = int(cfg["sample_rate"])
        self.frames_per_char = float(cfg["frames_per_char"])
        self.speed = float(cfg["speed"])
        self.allow_random_init = bool(cfg["allow_random_init"])

    def input_pins(self) -> List[InputPin]:
        return [InputPin("in", [PacketType.text(), PacketType.transcription()])]

    def output_pins(self) -> List[OutputPin]:
        return [OutputPin("out", PacketType.raw_audio(AudioFormat(self.sample_rate, 1)))]

    def _pick_backend(self) -> str:
        import os

        if self.backend != "auto":
            return self.backend
        if self.model_path and os.path.isdir(self.model_path):
            # voices.bin is the kokoro model-dir signature (kokoro_node.rs:706)
            if os.path.exists(os.path.join(self.model_path, "voices.bin")):
                return "kokoro"
            if os.path.exists(os.path.join(self.model_path, "config.json")):
                return "vits"
        return "fastspeech"

    def _use_vits(self) -> bool:
        return self._pick_backend() == "vits"

    async def _load(self, ctx: NodeContext):
        backend = self._pick_backend()
        use_vits = backend == "vits"

        async def loader():
            loop = asyncio.get_running_loop()

            def build():
                import os

                if backend == "kokoro":
                    from ...models.kokoro import load_kokoro_dir

                    if not (self.model_path and os.path.isdir(self.model_path)):
                        raise ConfigurationError(
                            f"kokoro backend requires a model dir: {self.model_path}"
                        )
                    return ("kokoro",) + load_kokoro_dir(self.model_path)
                if use_vits:
                    from ...models.vits import (
                        VitsCharTokenizer,
                        VitsConfig,
                        load_vits,
                        vits_init_params,
                    )

                    if self.model_path and os.path.isdir(self.model_path):
                        return ("vits",) + load_vits(self.model_path)
                    if not self.allow_random_init:
                        raise ConfigurationError(f"model not found: {self.model_path}")
                    vcfg = VitsConfig(sampling_rate=self.sample_rate)
                    tok = VitsCharTokenizer(
                        {c: i + 1 for i, c in enumerate(
                            "abcdefghijklmnopqrstuvwxyz0123456789 .,!?'-"
                        )}
                    )
                    return "vits", vcfg, vits_init_params(vcfg), tok
                acfg = AcousticConfig()
                vcfg = HifiGanConfig(upsample_rates=(5, 5, 4, 2), upsample_kernel_sizes=(10, 10, 8, 4))
                if self.model_path:
                    if not os.path.exists(self.model_path):
                        if not self.allow_random_init:
                            raise ConfigurationError(f"model not found: {self.model_path}")
                        return "fastspeech", acfg, acoustic_init_params(acfg), vcfg, hifigan_init_params(vcfg)
                    blob = np.load(self.model_path, allow_pickle=True)
                    return "fastspeech", acfg, blob["acoustic"].item(), vcfg, blob["vocoder"].item()
                return "fastspeech", acfg, acoustic_init_params(acfg), vcfg, hifigan_init_params(vcfg)

            return await loop.run_in_executor(None, build)

        key = ResourceKey.from_params(
            "tts", {"path": self.model_path, "backend": backend}
        )
        if ctx.resources is not None:
            return await ctx.resources.get_or_create(key, loader)
        return await loader()

    async def run(self, ctx: NodeContext) -> None:
        stats = NodeStatsTracker(ctx.node_name, ctx.stats_tx)
        telemetry = TelemetryEmitter(ctx.node_name, ctx.telemetry_tx)
        loaded = await self._load(ctx)
        ctx.emit_state(NodeState.running())
        splitter = SentenceSplitter()
        loop = asyncio.get_running_loop()
        seq = 0
        synth_batched = None  # set by backends that support cross-session batching

        if loaded[0] == "kokoro":
            from ...models.kokoro import SAMPLE_RATE as KOKORO_SR, kokoro_synthesize

            _, kcfg, kparams, ktokens, kvoices = loaded
            if self.speaker_id >= kvoices.shape[0]:
                raise ConfigurationError(
                    f"speaker_id {self.speaker_id} out of range: voices.bin has "
                    f"{kvoices.shape[0]} voices"
                )
            pack = kvoices[self.speaker_id]
            fmt = AudioFormat(KOKORO_SR, 1)

            def synth_sync(sentence: str) -> np.ndarray:
                ids = ktokens.encode(sentence)
                return kokoro_synthesize(kparams, kcfg, ids, pack, speed=self.speed)

            # cross-session batching: duration prediction and the
            # encode+expand+decode core are both vmapped over sessions
            # (row-exact — models/kokoro.py kokoro_*_batch); two batcher
            # kinds because the frame bucket is only known after durations
            if ctx.batcher is not None:
                import functools

                import jax

                from ...models.kokoro import (
                    HOP,
                    kokoro_bucket,
                    kokoro_core_batch,
                    kokoro_durations_batch,
                )

                tag = f"{self.model_path or 'randinit'}:{self.speaker_id}:{self.speed}"
                dur_jit = jax.jit(
                    lambda tb, mb, sb: kokoro_durations_batch(kparams, kcfg, tb, mb, sb)
                )

                def dur_fn(tok_b, tm_b, st_b):
                    return (np.asarray(dur_jit(jnp.asarray(tok_b), jnp.asarray(tm_b), jnp.asarray(st_b))),)

                @functools.lru_cache(maxsize=8)
                def core_fn_for(f_pad: int):
                    core_jit = jax.jit(
                        lambda tb, mb, sb, fb, fmb: kokoro_core_batch(
                            kparams, kcfg, tb, mb, sb, fb, fmb, f_pad
                        )
                    )

                    def fn(tok_b, tm_b, st_b, fi_b, fm_b):
                        audio, _ = core_jit(
                            jnp.asarray(tok_b), jnp.asarray(tm_b), jnp.asarray(st_b),
                            jnp.asarray(fi_b), jnp.asarray(fm_b),
                        )
                        return (np.asarray(audio),)

                    return fn

                async def _kokoro_batched(sentence: str) -> np.ndarray:
                    ids = ktokens.encode(sentence)
                    if not ids:
                        return np.zeros(0, np.float32)
                    t = len(ids)
                    t_pad = kokoro_bucket(t, (64, 128, 256, 512))
                    tok = np.zeros(t_pad, np.int32)
                    tok[:t] = np.asarray(ids, np.int32) % kcfg.n_tokens
                    t_mask = np.zeros(t_pad, np.float32)
                    t_mask[:t] = 1.0
                    style = np.asarray(pack[min(t, pack.shape[0] - 1)], np.float32)
                    kind = f"kokoro_dur:{tag}:{t_pad}"
                    ctx.batcher.register(kind, dur_fn, max_batch=16, transient=True)
                    dur_row = await ctx.batcher.submit(kind, tok, t_mask, style)
                    dur = np.maximum(
                        1, np.round(np.asarray(dur_row)[:t] / max(self.speed, 1e-3))
                    ).astype(np.int64)
                    frame_idx = np.repeat(np.arange(t, dtype=np.int32), dur)
                    n = len(frame_idx)
                    f_pad = kokoro_bucket(n)
                    fi = np.zeros(f_pad, np.int32)
                    fi[:n] = frame_idx[:f_pad]
                    f_mask = np.zeros(f_pad, np.float32)
                    f_mask[: min(n, f_pad)] = 1.0
                    kind2 = f"kokoro_core:{tag}:{t_pad}:{f_pad}"
                    ctx.batcher.register(kind2, core_fn_for(f_pad), max_batch=16, transient=True)
                    audio = await ctx.batcher.submit(kind2, tok, t_mask, style, fi, f_mask)
                    out = np.asarray(audio)[: min(n, f_pad) * HOP]
                    peak = np.abs(out).max() or 1.0
                    return (out / max(peak, 1.0) * 0.7).astype(np.float32)

                synth_batched = _kokoro_batched
        elif loaded[0] == "vits":
            from ...models.vits import synthesize as vits_synthesize

            _, mcfg, mparams, tok = loaded
            fmt = AudioFormat(mcfg.sampling_rate, 1)

            def _encode(sentence: str) -> np.ndarray:
                return tok.encode(sentence) if tok else np.frombuffer(
                    sentence.encode(), np.uint8
                ).astype(np.int32) % mcfg.vocab_size

            def synth_sync(sentence: str) -> np.ndarray:
                ids = _encode(sentence)
                # pow-2 frame buckets bound the number of jit shapes; if the
                # predicted length saturates a bucket, grow and resynthesize
                n_frames = 1 << max(6, int(len(ids) * 4 - 1).bit_length())
                for _ in range(4):
                    wave, n_valid = vits_synthesize(
                        mparams, mcfg, ids[None],
                        max_frames=n_frames,
                        speaking_rate=self.speed,
                    )
                    n = int(n_valid[0])
                    if n < n_frames * mcfg.hop:
                        return np.asarray(wave[0][:n], np.float32)
                    n_frames *= 2
                return np.asarray(wave[0], np.float32)

            # cross-session batching: sentences from ALL tts nodes sharing
            # this model coalesce into one padded+masked synthesize call per
            # token bucket (4 frames/token budget, same saturation-growth
            # contract as the direct path). TPU-native win the per-stream
            # reference cannot express (kokoro_node.rs synthesizes serially).
            if ctx.batcher is not None:
                tag = f"{self.model_path or 'randinit'}:{self.speed}"

                def make_fn(tb: int):
                    frames = 4 * tb

                    def fn(ids_b: np.ndarray, mask_b: np.ndarray):
                        wave, n_valid = vits_synthesize(
                            mparams, mcfg, jnp.asarray(ids_b),
                            mask=jnp.asarray(mask_b, jnp.float32),
                            max_frames=frames,
                            speaking_rate=self.speed,
                        )
                        return np.asarray(wave), np.asarray(n_valid)

                    return fn

                async def _synth_batched(sentence: str) -> np.ndarray:
                    ids = _encode(sentence)
                    # coarse buckets (min 64 tokens): typical sentences share
                    # one shape, so concurrent sessions actually coalesce
                    tb = 1 << max(6, (max(1, len(ids)) - 1).bit_length())
                    wave = np.zeros(0, np.float32)
                    for _ in range(4):
                        kind = f"tts_vits:{tag}:{tb}"
                        ctx.batcher.register(kind, make_fn(tb), max_batch=16, transient=True)
                        padded = np.zeros(tb, np.int32)
                        padded[: len(ids)] = ids[:tb]
                        mask = np.zeros(tb, np.float32)
                        mask[: len(ids)] = 1.0
                        wave, n_valid = await ctx.batcher.submit(kind, padded, mask)
                        n = int(n_valid)
                        if n < 4 * tb * mcfg.hop:
                            return np.asarray(wave[:n], np.float32)
                        tb *= 2
                    return np.asarray(wave, np.float32)

                synth_batched = _synth_batched
        else:
            _, acfg, aparams, vcfg, vparams = loaded
            fmt = AudioFormat(self.sample_rate, 1)

            def synth_sync(sentence: str) -> np.ndarray:
                ids = np.frombuffer(sentence.encode()[: acfg.max_text], np.uint8).astype(np.int32)
                if len(ids) == 0:
                    return np.zeros(0, np.float32)
                # frame budget: chars × frames_per_char / speed, frame-bucketed to
                # limit recompiles (powers-of-two buckets)
                want = int(len(ids) * self.frames_per_char / self.speed)
                n_frames = 1 << max(5, (want - 1).bit_length())
                n_frames = min(n_frames, acfg.max_frames)
                mel = acoustic_generate(aparams, acfg, jnp.asarray(ids[None]), n_frames)
                wav = hifigan_generate(vparams, vcfg, mel)
                keep = int(want * np.prod(vcfg.upsample_rates))
                return np.asarray(wav[0][:keep], np.float32)

        async def emit_sentence(sentence: str) -> None:
            nonlocal seq
            if synth_batched is not None:
                wav = await synth_batched(sentence)
            else:
                wav = await loop.run_in_executor(None, synth_sync, sentence)
            if wav.shape[0] == 0:
                return
            telemetry.emit("tts.sentence", {"text": sentence[:120], "samples": int(wav.shape[0])})
            # emit in 20ms frames for downstream pacing/encoding
            frame = (fmt.sample_rate * 20) // 1000
            for i in range(0, len(wav), frame):
                chunk = wav[i : i + frame]
                f = AudioFrame(chunk, fmt)
                await ctx.output.send(
                    "out",
                    Packet.new_audio(f, PacketMetadata(duration_us=f.duration_us(), sequence=seq)),
                )
                seq += 1
                stats.packet_sent()

        try:
            while True:
                pkt = await ctx.recv_with_cancellation("in")
                if pkt is None:
                    break
                stats.packet_received()
                text = pkt.text if pkt.text is not None else (
                    pkt.transcription.text if pkt.transcription else None
                )
                if not text:
                    stats.packet_discarded()
                    continue
                for sentence in splitter.push(text + " "):
                    await emit_sentence(sentence)
            for sentence in splitter.flush():
                await emit_sentence(sentence)
        except ChannelClosed:
            ctx.emit_state(NodeState.stopped(StopReason.OUTPUT_CLOSED))
            stats.flush()
            return
        stats.flush()
        ctx.emit_state(NodeState.stopped(StopReason.INPUT_CLOSED))
