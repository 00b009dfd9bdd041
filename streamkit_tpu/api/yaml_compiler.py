# SPDX-License-Identifier: Apache-2.0
"""YAML pipeline compiler: user-facing formats → explicit Pipeline.

Behavioral parity with reference ``crates/api/src/yaml.rs:103-340``:

* **Steps format** — ``steps: [{kind, params}, ...]`` → nodes named
  ``step_N`` chained ``out``→``in``.
* **DAG format** — ``nodes: {name: {kind, params, needs}}`` where ``needs``
  is a node name, ``{node, mode}`` object, or list thereof. Multi-input nodes
  get numbered pins ``in_0``, ``in_1``, …; per-edge ``mode: best_effort``.
* DFS cycle detection; cycles through bidirectional kinds
  (``transport::moq::peer``) are allowed (``yaml.rs:146-160``).
* ``audio::mixer`` ``num_inputs`` auto-injection for non-dynamic pipelines
  (``yaml.rs:310-340``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import yaml

from ..core.control import ConnectionMode
from ..core.errors import ConfigurationError
from .messages import Connection, Pipeline, PipelineNode

__all__ = ["compile_yaml", "compile_pipeline_dict", "BIDIRECTIONAL_NODE_KINDS"]

BIDIRECTIONAL_NODE_KINDS = ("transport::moq::peer",)


def compile_yaml(text: str) -> Pipeline:
    """Parse + compile a user YAML pipeline."""
    try:
        doc = yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise ConfigurationError(f"invalid YAML: {e}") from e
    if not isinstance(doc, dict):
        raise ConfigurationError("pipeline YAML must be a mapping")
    return compile_pipeline_dict(doc)


def compile_pipeline_dict(doc: dict) -> Pipeline:
    name = doc.get("name")
    description = doc.get("description")
    mode = str(doc.get("mode", "dynamic")).lower()
    if mode not in ("oneshot", "dynamic"):
        raise ConfigurationError(f"invalid mode {mode!r} (expected oneshot|dynamic)")

    has_steps = "steps" in doc
    has_nodes = "nodes" in doc
    if has_steps == has_nodes:
        raise ConfigurationError("pipeline must have exactly one of 'steps' or 'nodes'")

    if has_steps:
        return _compile_steps(name, description, mode, doc["steps"])
    return _compile_dag(name, description, mode, doc["nodes"])


# ---------------------------------------------------------------------------
def _compile_steps(name, description, mode, steps) -> Pipeline:
    if not isinstance(steps, list):
        raise ConfigurationError("'steps' must be a list")
    nodes: Dict[str, PipelineNode] = {}
    connections: List[Connection] = []
    for i, step in enumerate(steps):
        if not isinstance(step, dict) or "kind" not in step:
            raise ConfigurationError(f"step {i} must be a mapping with a 'kind'")
        node_name = f"step_{i}"
        if i > 0:
            connections.append(Connection(f"step_{i-1}", "out", node_name, "in"))
        nodes[node_name] = PipelineNode(kind=step["kind"], params=step.get("params"))
    return Pipeline(name, description, mode, nodes, connections)


# ---------------------------------------------------------------------------
def _parse_needs(needs) -> List[Tuple[str, ConnectionMode]]:
    """Normalize needs: None | str | {node, mode} | list of those."""
    if needs is None:
        return []
    if isinstance(needs, str):
        return [(needs, ConnectionMode.RELIABLE)]
    if isinstance(needs, dict):
        return [(needs["node"], ConnectionMode(needs.get("mode", "reliable")))]
    if isinstance(needs, list):
        out: List[Tuple[str, ConnectionMode]] = []
        for n in needs:
            out.extend(_parse_needs(n))
        return out
    raise ConfigurationError(f"invalid 'needs' value: {needs!r}")


def _detect_cycles(user_nodes: Dict[str, dict]) -> None:
    """DFS cycle detection with bidirectional exemption (``yaml.rs:146-255``)."""
    adjacency: Dict[str, List[str]] = {n: [] for n in user_nodes}
    for node_name, node_def in user_nodes.items():
        for dep_name, _ in _parse_needs(node_def.get("needs")):
            if dep_name in user_nodes:
                adjacency[dep_name].append(node_name)  # data flows dep → node

    visited: set = set()
    rec_stack: set = set()
    path: List[str] = []

    def dfs(node: str) -> Optional[Tuple[List[str], str]]:
        visited.add(node)
        rec_stack.add(node)
        path.append(node)
        for nb in adjacency.get(node, ()):
            if nb not in visited:
                found = dfs(nb)
                if found:
                    rec_stack.discard(node)
                    path.pop()
                    return found
            elif nb in rec_stack:
                start = path.index(nb) if nb in path else 0
                cycle_nodes = path[start:]
                desc = f"Circular dependency detected: {' -> '.join(cycle_nodes)} -> {nb}"
                rec_stack.discard(node)
                path.pop()
                return (cycle_nodes, desc)
        rec_stack.discard(node)
        path.pop()
        return None

    for node_name in user_nodes:
        if node_name not in visited:
            found = dfs(node_name)
            if found:
                cycle_nodes, desc = found
                has_bidir = any(
                    user_nodes.get(n, {}).get("kind") in BIDIRECTIONAL_NODE_KINDS
                    for n in cycle_nodes
                )
                if not has_bidir:
                    raise ConfigurationError(desc)


def _compile_dag(name, description, mode, user_nodes) -> Pipeline:
    if not isinstance(user_nodes, dict):
        raise ConfigurationError("'nodes' must be a mapping")
    for node_name, node_def in user_nodes.items():
        if not isinstance(node_def, dict) or "kind" not in node_def:
            raise ConfigurationError(f"node {node_name!r} must be a mapping with a 'kind'")

    _detect_cycles(user_nodes)

    connections: List[Connection] = []
    for node_name, node_def in user_nodes.items():
        deps = _parse_needs(node_def.get("needs"))
        for idx, (dep_name, dep_mode) in enumerate(deps):
            if dep_name not in user_nodes:
                raise ConfigurationError(
                    f"Node '{node_name}' references non-existent node '{dep_name}' in 'needs' field"
                )
            to_pin = f"in_{idx}" if len(deps) > 1 else "in"
            connections.append(Connection(dep_name, "out", node_name, to_pin, dep_mode))

    incoming: Dict[str, int] = {}
    for c in connections:
        incoming[c.to_node] = incoming.get(c.to_node, 0) + 1

    nodes: Dict[str, PipelineNode] = {}
    for node_name, node_def in user_nodes.items():
        params = node_def.get("params")
        # mixer num_inputs auto-injection for static pipelines (yaml.rs:310-340)
        if node_def["kind"] == "audio::mixer" and mode != "dynamic":
            count = incoming.get(node_name, 0)
            if count > 1:
                if params is None:
                    params = {"num_inputs": count}
                elif isinstance(params, dict) and params.get("num_inputs") is None:
                    params = dict(params)
                    params["num_inputs"] = count
        nodes[node_name] = PipelineNode(kind=node_def["kind"], params=params)

    return Pipeline(name, description, mode, nodes, connections)
