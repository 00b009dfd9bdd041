# SPDX-License-Identifier: Apache-2.0
"""Interactive shell against the real server (reference ``shell.rs``):
command dispatch for sessions/nodes/pipeline/tune, create-from-YAML,
oneshot processing, session-id prefix matching, per-command help, and the
readline completer's candidate sets."""

from __future__ import annotations

import os
import socket
import sys
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e.harness import ServerThread  # noqa: E402
from streamkit_tpu.server import ServerConfig  # noqa: E402


def _free_udp_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shellmedia")
    sr = 16000
    t = np.arange(sr) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * 0.4 * 32767).astype(np.int16)
    with wave.open(str(d / "tone.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    (d / "gain.yaml").write_text(
        "mode: oneshot\n"
        "steps:\n"
        "  - kind: streamkit::http_input\n"
        "  - kind: containers::wav::demuxer\n"
        "  - kind: audio::gain\n    params: {gain: 0.5}\n"
        "  - kind: containers::wav::muxer\n"
        "  - kind: streamkit::http_output\n    params: {content_type: audio/wav}\n"
    )
    return d


@pytest.fixture(scope="module")
def server(media_dir):
    cfg = ServerConfig()
    cfg.moq_port = _free_udp_port()
    cfg.allowed_file_paths = [str(media_dir)]
    srv = ServerThread(cfg)
    srv.start()
    yield srv
    srv.stop()


def _with_shell(server, coro):
    """Run ``coro(shell)`` inside a fresh event loop with a connected client."""
    import asyncio

    from streamkit_tpu.cli.client import SkitClient
    from streamkit_tpu.cli.shell import Shell

    async def main():
        async with SkitClient(server.base_url) as client:
            await client.connect_ws()
            return await coro(Shell(client))

    return asyncio.run(main())


def test_session_lifecycle_and_pipeline(server, capsys):
    async def flow(shell):
        await _flow_lifecycle(shell, capsys)

    _with_shell(server, flow)


async def _flow_lifecycle(shell, capsys):
    assert await shell.dispatch("create lifecycle-test")
    sid = shell.session
    assert sid
    await shell.dispatch("add reader core::passthrough")
    await shell.dispatch("add sink core::sink")
    await shell.dispatch("connect reader sink")
    await shell.dispatch("pipeline")
    out = capsys.readouterr().out
    assert "reader" in out and "core::passthrough" in out
    assert "reader:out -> sink:in" in out
    assert set(shell.known_nodes) >= {"reader", "sink"}
    # tune sugar: param/value pair instead of JSON (reference tune form)
    await shell.dispatch("add gain audio::gain")
    await shell.dispatch("tune gain gain 2.5")
    assert "error" not in capsys.readouterr().out
    # destroy by unique id prefix
    await shell.dispatch("sessions")
    capsys.readouterr()
    await shell.dispatch(f"destroy {sid[:8]}")
    assert f"destroyed {sid}" in capsys.readouterr().out
    assert shell.session is None


def test_create_from_yaml_and_oneshot(server, media_dir, capsys, tmp_path):
    async def flow(shell):
        await _flow_yaml_oneshot(shell, media_dir, capsys, tmp_path)

    _with_shell(server, flow)


async def _flow_yaml_oneshot(shell, media_dir, capsys, tmp_path):
    # reference-style create <pipeline.yaml> --name
    dyn = tmp_path / "dyn.yaml"
    dyn.write_text(
        "mode: dynamic\nnodes:\n  p:\n    kind: core::passthrough\n"
        "  s:\n    kind: core::sink\n    needs: p\n"
    )
    await shell.dispatch(f"create {dyn} --name from-yaml")
    out = capsys.readouterr().out
    assert "created + selected" in out
    assert shell.session
    await shell.dispatch("destroy")

    out_path = tmp_path / "out.wav"
    await shell.dispatch(f"oneshot {media_dir}/gain.yaml {media_dir}/tone.wav {out_path}")
    assert "wrote" in capsys.readouterr().out
    with wave.open(str(out_path)) as w:
        scaled = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    with wave.open(str(media_dir / "tone.wav")) as w:
        orig = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert len(scaled) == len(orig)
    assert np.abs(scaled.astype(np.int32)).mean() < np.abs(orig.astype(np.int32)).mean()


def test_help_and_completion_sets(server, capsys):
    async def flow(shell):
        await _flow_help_completion(shell, capsys)

    _with_shell(server, flow)


async def _flow_help_completion(shell, capsys):
    await shell.dispatch("help")
    out = capsys.readouterr().out
    assert "oneshot" in out and "loadtest" in out and "tab completes" in out
    await shell.dispatch("help tune")
    assert "param value" in capsys.readouterr().out
    # aliases route to the same handlers
    await shell.dispatch("ls")
    capsys.readouterr()

    from streamkit_tpu.cli.shell import ShellCompleter

    await shell.dispatch("create completer-test")
    await shell._prime_completion()
    comp = ShellCompleter(shell)
    # word 0: all commands + aliases
    cands = comp._candidates("", "")
    assert {"create", "oneshot", "lt", "ls", "help"} <= set(cands)
    # `use <TAB>`: live session ids
    assert shell.session in comp._candidates("use ", "")
    # `add x <TAB>`: node kinds from the live schema
    kinds = comp._candidates("add x ", "")
    assert "core::passthrough" in kinds and "audio::gain" in kinds
    await shell.dispatch("destroy")
    capsys.readouterr()
