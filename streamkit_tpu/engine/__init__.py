# SPDX-License-Identifier: Apache-2.0
"""Execution engines: oneshot (request→response) and dynamic (live sessions)."""

from .graph_builder import WiredGraph, wire_and_spawn_graph
from .oneshot import OneshotResult, run_oneshot_pipeline
