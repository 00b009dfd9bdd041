# SPDX-License-Identifier: Apache-2.0
"""Built-in node inventory + registration (reference ``nodes/src/lib.rs:25-42``).

Node kinds mirror the reference's 25-kind inventory (SURVEY.md §2.2); device
DSP/ML nodes run their math through :mod:`streamkit_tpu.ops` /
:mod:`streamkit_tpu.models` jitted kernels.
"""

from __future__ import annotations

from ..core import NodeRegistry


def register_nodes(registry: NodeRegistry) -> None:
    """Register all built-in node kinds."""
    from .audio.filters import GainNode, MixerNode, ResamplerNode
    from .containers.ogg import OggDemuxerNode, OggMuxerNode
    from .containers.wav import WavDemuxerNode, WavMuxerNode
    from .containers.webm import WebmMuxerNode
    from .core_nodes.basic import BytesInputNode, BytesOutputNode, PassthroughNode, SinkNode
    from .core_nodes.file_io import FileReaderNode, FileWriterNode
    from .core_nodes.pacer import AudioPacerNode, PacerNode
    from .core_nodes.script import ScriptNode
    from .core_nodes.telemetry_nodes import TelemetryOutNode, TelemetryTapNode
    from .core_nodes.text import JsonSerializeNode, TextChunkerNode
    from .transport.http import HttpFetcherNode
    from .transport.moq import MoqPeerNode, MoqPublisherNode, MoqSubscriberNode

    for cls, desc in [
        (PassthroughNode, "Forwards packets unchanged"),
        (SinkNode, "Discards all packets (terminal)"),
        (FileReaderNode, "Reads a file in chunks (waits for Start)"),
        (FileWriterNode, "Writes binary packets to a file"),
        (PacerNode, "Releases packets according to timing metadata"),
        (AudioPacerNode, "Audio pacer that synthesizes silence on underrun"),
        (JsonSerializeNode, "Serializes packets to JSON binary"),
        (TextChunkerNode, "Chunks streaming text at sentence boundaries"),
        (GainNode, "Multiplies audio samples by a gain factor"),
        (ResamplerNode, "Converts audio sample rate (device kernel)"),
        (MixerNode, "Mixes multiple audio inputs into one stream"),
        (WavDemuxerNode, "Parses WAV (RIFF) into raw audio frames"),
        (WavMuxerNode, "Encodes raw audio frames as a WAV stream"),
        (OggDemuxerNode, "Parses Ogg/Opus into Opus packets"),
        (OggMuxerNode, "Packetizes Opus into an Ogg stream"),
        (WebmMuxerNode, "Muxes Opus into a WebM (Matroska) stream"),
        (TelemetryTapNode, "Observes packets and emits telemetry events"),
        (TelemetryOutNode, "Forwards packets to the session telemetry bus"),
        (ScriptNode, "Per-packet sandboxed transform script"),
        (HttpFetcherNode, "Fetches a URL as a binary stream"),
        (MoqPeerNode, "Bidirectional in-server MoQ media endpoint"),
        (MoqSubscriberNode, "Subscribes to a MoQ broadcast"),
        (MoqPublisherNode, "Publishes to MoQ subscribers"),
    ]:
        registry.register(cls.KIND, _factory(cls), description=desc)

    # oneshot marker kinds (instantiated by the oneshot runner; registered so
    # pipelines validate — reference keeps them out of the registry but we
    # expose them for schema discovery)
    registry.register(BytesInputNode.KIND, _factory(BytesInputNode), "HTTP request body source (oneshot)")
    registry.register(BytesOutputNode.KIND, _factory(BytesOutputNode), "HTTP response body sink (oneshot)")

    # codec / container / transport / ML nodes register lazily where their
    # host libraries are present (see each submodule)
    from .codecs import register_codec_nodes
    from .ml import register_ml_nodes

    register_codec_nodes(registry)
    register_ml_nodes(registry)


def _factory(cls):
    return lambda params: cls(params)
