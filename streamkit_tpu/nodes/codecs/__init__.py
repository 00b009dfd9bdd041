# SPDX-License-Identifier: Apache-2.0
"""Codec nodes (Opus/MP3/FLAC) — host-side entropy coding via system libraries."""


def register_codec_nodes(registry) -> None:
    try:
        from .opus import register as register_opus
        register_opus(registry)
    except (OSError, ImportError):
        pass  # libopus not present: opus nodes unavailable
    try:
        from .mpeg import register as register_mpeg
        register_mpeg(registry)
    except (OSError, ImportError):
        pass
    try:
        from .av import register as register_av
        register_av(registry)
    except (OSError, ImportError):
        pass  # libav shim not built: flac node unavailable
