# SPDX-License-Identifier: Apache-2.0
"""Kokoro TTS stack tests (models/kokoro.py): the reference model-dir
contract (tokens.txt / voices.bin — kokoro_node.rs:705-709), voice-pack
conversion, speaker/style selection, synthesis, and the node end-to-end on
the golden pack in samples/kokoro-golden."""

import asyncio
import os

import numpy as np
import pytest

from streamkit_tpu.models.kokoro import (
    STYLE_DIM,
    STYLE_ROWS,
    KokoroConfig,
    KokoroTokens,
    kokoro_init_params,
    kokoro_synthesize,
    load_kokoro_dir,
    load_voices_bin,
)

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "samples", "kokoro-golden"
)
needs_golden = pytest.mark.skipif(
    not os.path.isdir(GOLDEN), reason="samples/kokoro-golden missing"
)


def test_voices_bin_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    packs = rng.randn(3, STYLE_ROWS, STYLE_DIM).astype("<f4")
    path = tmp_path / "voices.bin"
    packs.tofile(path)
    got = load_voices_bin(str(path))
    assert got.shape == (3, STYLE_ROWS, STYLE_DIM)
    np.testing.assert_array_equal(got, packs)


def test_voices_bin_rejects_bad_size(tmp_path):
    path = tmp_path / "voices.bin"
    np.zeros(1000, "<f4").tofile(path)
    with pytest.raises(ValueError, match="multiple"):
        load_voices_bin(str(path))


def test_tokens_longest_match(tmp_path):
    path = tmp_path / "tokens.txt"
    path.write_text("a 0\nb 1\nab 2\n  3\n")  # token ' ' id 3
    tok = KokoroTokens.load(str(path))
    assert tok.encode("ab a b") == [2, 3, 0, 3, 1]
    assert tok.encode("zzz") == []  # OOV skipped


@needs_golden
def test_golden_pack_loads():
    cfg, params, tokens, voices = load_kokoro_dir(GOLDEN)
    assert voices.shape[1:] == (STYLE_ROWS, STYLE_DIM)
    assert voices.shape[0] >= 2
    assert tokens.encode("hello world")


@needs_golden
def test_synthesis_produces_audio_and_speakers_differ():
    cfg, params, tokens, voices = load_kokoro_dir(GOLDEN)
    ids = tokens.encode("hello there, this is a test.")
    a0 = kokoro_synthesize(params, cfg, ids, voices[0])
    a1 = kokoro_synthesize(params, cfg, ids, voices[1])
    assert a0.size > 1000 and np.isfinite(a0).all()
    assert np.abs(a0).max() <= 1.0
    # distinct style vectors → distinct audio
    n = min(a0.size, a1.size)
    assert not np.allclose(a0[:n], a1[:n])


@needs_golden
def test_speed_scales_duration():
    cfg, params, tokens, voices = load_kokoro_dir(GOLDEN)
    ids = tokens.encode("the quick brown fox jumps over the lazy dog")
    slow = kokoro_synthesize(params, cfg, ids, voices[0], speed=0.5)
    fast = kokoro_synthesize(params, cfg, ids, voices[0], speed=2.0)
    assert slow.size > fast.size


@needs_golden
def test_style_row_selected_by_length():
    """The voicepack contract: style row index = phoneme count."""
    cfg, params, tokens, voices = load_kokoro_dir(GOLDEN)
    short = tokens.encode("hi")
    # same tokens, different style rows → different output even at equal len
    pack = voices[0].copy()
    pack2 = pack.copy()
    pack2[len(short)] += 1.0  # perturb exactly the row 'hi' selects
    a = kokoro_synthesize(params, cfg, short, pack)
    b = kokoro_synthesize(params, cfg, short, pack2)
    n = min(a.size, b.size)
    assert not np.allclose(a[:n], b[:n])


@needs_golden
def test_weights_npz_override(tmp_path):
    """A converted weights.npz (flat '/'-keyed) loads over random init."""
    import shutil

    import jax

    dst = tmp_path / "pack"
    shutil.copytree(GOLDEN, dst)
    cfg, params, tokens, voices = load_kokoro_dir(str(dst))
    np.savez(dst / "weights.npz", **{"embed": np.ones_like(np.asarray(params["embed"]))})
    cfg2, params2, _, _ = load_kokoro_dir(str(dst))
    assert float(np.asarray(params2["embed"]).min()) == 1.0


@needs_golden
def test_kokoro_node_end_to_end():
    """YAML-equivalent node run on the golden pack: Text in → 24 kHz audio
    out, backend auto-selected by the voices.bin signature."""
    from streamkit_tpu.core import Channel, NodeContext, OutputSender, Packet
    from streamkit_tpu.nodes.ml.tts_node import TtsNode

    async def main():
        node = TtsNode({"model_dir": GOLDEN, "speaker_id": 1, "speed": 1.0})
        assert node._pick_backend() == "kokoro"
        in_ch = Channel(16)
        out_ch = Channel(4096)
        ctx = NodeContext(
            node_name="tts",
            inputs={"in": in_ch},
            output=OutputSender("tts", direct={"out": out_ch}),
        )
        task = asyncio.ensure_future(node.run(ctx))
        await in_ch.send(Packet.new_text("hello world. testing kokoro."))
        in_ch.close()
        await task
        ctx.output.close()
        total = 0
        sr = None
        while True:
            pkt = await out_ch.recv_optional()
            if pkt is None:
                break
            if pkt.audio is not None:
                total += pkt.audio.samples.shape[0]
                sr = pkt.audio.format.sample_rate
        return total, sr

    total, sr = asyncio.run(main())
    assert total > 1000
    assert sr == 24_000


def test_speaker_id_validated():
    from streamkit_tpu.core import ConfigurationError
    from streamkit_tpu.nodes.ml.tts_node import TtsNode

    with pytest.raises(ConfigurationError, match="speaker_id"):
        TtsNode({"speaker_id": 200})
    with pytest.raises(ConfigurationError, match="speed"):
        TtsNode({"speed": 3.0})


def test_converter_voicepacks_and_checkpoint(tmp_path):
    """tools/convert_kokoro.py: .pt voicepacks concatenate into voices.bin
    (speaker order = argument order) and a torch state dict maps into
    weights.npz that the loader consumes."""
    torch = pytest.importorskip("torch")
    import subprocess
    import sys as _sys

    v0 = torch.zeros(STYLE_ROWS, 1, STYLE_DIM) + 0.25
    v1 = torch.zeros(STYLE_ROWS, 1, STYLE_DIM) - 0.5
    torch.save(v0, tmp_path / "voice0.pt")
    torch.save(v1, tmp_path / "voice1.pt")
    sd = {"text_encoder.embedding.weight": torch.ones(178, 512)}
    torch.save(sd, tmp_path / "ckpt.pth")
    (tmp_path / "tokens.txt").write_text("a 0\nb 1\n")
    out = tmp_path / "model"
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "convert_kokoro.py",
    )
    res = subprocess.run(
        [
            _sys.executable, tool, "--out", str(out),
            "--checkpoint", str(tmp_path / "ckpt.pth"),
            "--voices", str(tmp_path / "voice0.pt"), str(tmp_path / "voice1.pt"),
            "--tokens", str(tmp_path / "tokens.txt"),
        ],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"},
    )
    assert res.returncode == 0, res.stderr
    voices = load_voices_bin(str(out / "voices.bin"))
    assert voices.shape[0] == 2
    assert np.allclose(voices[0], 0.25) and np.allclose(voices[1], -0.5)
    cfg, params, tokens, _ = load_kokoro_dir(str(out))
    assert float(np.asarray(params["embed"]).min()) == 1.0  # mapped weight
