# SPDX-License-Identifier: Apache-2.0
"""YAML compiler tests, incl. compiling the reference's shipped sample
pipelines verbatim (parity target: crates/api/src/yaml.rs:350-723 tests)."""

import glob
import os

import pytest

from streamkit_tpu.api import compile_yaml
from streamkit_tpu.core import ConfigurationError
from streamkit_tpu.core.control import ConnectionMode

REF_SAMPLES = "/root/reference/samples/pipelines"


def test_steps_format_chains_linearly():
    p = compile_yaml(
        """
mode: oneshot
steps:
  - kind: streamkit::http_input
  - kind: audio::gain
    params: {gain: 2}
  - kind: streamkit::http_output
"""
    )
    assert list(p.nodes) == ["step_0", "step_1", "step_2"]
    assert p.nodes["step_1"].params == {"gain": 2}
    assert len(p.connections) == 2
    c = p.connections[0]
    assert (c.from_node, c.from_pin, c.to_node, c.to_pin) == ("step_0", "out", "step_1", "in")


def test_dag_format_multi_input_numbered_pins():
    p = compile_yaml(
        """
mode: oneshot
nodes:
  a: {kind: core::file_reader}
  b: {kind: core::file_reader}
  mix:
    kind: audio::mixer
    needs: [a, b]
  out:
    kind: core::sink
    needs: mix
"""
    )
    pins = sorted(c.to_pin for c in p.connections if c.to_node == "mix")
    assert pins == ["in_0", "in_1"]
    assert [c.to_pin for c in p.connections if c.to_node == "out"] == ["in"]
    # mixer num_inputs auto-injection (non-dynamic mode)
    assert p.nodes["mix"].params == {"num_inputs": 2}


def test_mixer_injection_skipped_in_dynamic_mode():
    p = compile_yaml(
        """
mode: dynamic
nodes:
  a: {kind: core::passthrough}
  b: {kind: core::passthrough}
  mix: {kind: audio::mixer, needs: [a, b]}
"""
    )
    assert p.nodes["mix"].params is None


def test_best_effort_edge_mode():
    p = compile_yaml(
        """
nodes:
  a: {kind: core::passthrough}
  b:
    kind: core::passthrough
    needs:
      - {node: a, mode: best_effort}
"""
    )
    assert p.connections[0].mode is ConnectionMode.BEST_EFFORT


def test_cycle_rejected():
    with pytest.raises(ConfigurationError, match="Circular dependency"):
        compile_yaml(
            """
nodes:
  a: {kind: core::passthrough, needs: b}
  b: {kind: core::passthrough, needs: a}
"""
        )


def test_self_reference_rejected():
    with pytest.raises(ConfigurationError, match="Circular"):
        compile_yaml("nodes:\n  a: {kind: core::passthrough, needs: a}\n")


def test_moq_peer_cycle_allowed():
    p = compile_yaml(
        """
mode: dynamic
nodes:
  moq_peer:
    kind: transport::moq::peer
    needs: enc
  dec: {kind: audio::opus::decoder, needs: moq_peer}
  enc: {kind: audio::opus::encoder, needs: dec}
"""
    )
    assert len(p.connections) == 3


def test_invalid_needs_reference():
    with pytest.raises(ConfigurationError, match="non-existent"):
        compile_yaml("nodes:\n  a: {kind: x, needs: ghost}\n")


def test_mode_default_is_dynamic():
    p = compile_yaml("nodes:\n  a: {kind: core::passthrough}\n")
    assert p.mode == "dynamic"


def test_steps_and_nodes_mutually_exclusive():
    with pytest.raises(ConfigurationError):
        compile_yaml("steps: []\nnodes: {}\n")
    with pytest.raises(ConfigurationError):
        compile_yaml("name: x\n")


@pytest.mark.skipif(not os.path.isdir(REF_SAMPLES), reason="reference not mounted")
@pytest.mark.parametrize(
    "path",
    sorted(
        glob.glob(f"{REF_SAMPLES}/oneshot/*.yml")
        + glob.glob(f"{REF_SAMPLES}/dynamic/*.yml")
        + glob.glob(f"{REF_SAMPLES}/dynamic/*.yaml")
    ),
    ids=os.path.basename,
)
def test_reference_sample_pipelines_compile(path):
    """Every shipped reference sample pipeline must compile."""
    with open(path) as f:
        p = compile_yaml(f.read())
    assert p.nodes
    for c in p.connections:
        assert c.from_node in p.nodes and c.to_node in p.nodes


FUSABLE_YAML = """
mode: dynamic
nodes:
  src: {kind: "transport::http::fetcher", params: {url: "http://x/a.opus"}}
  dec: {kind: "audio::opus::decoder", params: {channels: 1}, needs: src}
  rs:
    kind: "audio::resampler"
    params: {target_sample_rate: 16000, output_frame_size: 0}
    needs: dec
  stt: {kind: "core::sink", needs: rs}
"""


def test_fuse_decode_resample():
    """decoder -> resampler(16k, no frame regularization) fuses into one
    decoder running natively at 16 kHz (Opus decodes at any RFC 6716
    rate), rewiring downstream consumers."""
    p = compile_yaml(FUSABLE_YAML)
    assert "rs" not in p.nodes
    assert p.nodes["dec"].params["sample_rate"] == 16000
    edges = {(c.from_node, c.to_node) for c in p.connections}
    assert ("dec", "stt") in edges and not any(x == "rs" for e in edges for x in e)


def test_fuse_skipped_when_disabled_or_invalid():
    # optimize: false keeps the literal graph
    p = compile_yaml("optimize: false\n" + FUSABLE_YAML.strip())
    assert "rs" in p.nodes
    # frame-size regularization (default 960) blocks fusion
    p = compile_yaml(FUSABLE_YAML.replace(", output_frame_size: 0", ""))
    assert "rs" in p.nodes
    # non-native target rate blocks fusion
    p = compile_yaml(FUSABLE_YAML.replace("16000", "22050"))
    assert "rs" in p.nodes
    # fan-out from the decoder blocks fusion (exclusive pair only)
    p = compile_yaml(
        FUSABLE_YAML + '  tap: {kind: "core::sink", needs: dec}\n'
    )
    assert "rs" in p.nodes
