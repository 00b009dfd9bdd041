# SPDX-License-Identifier: Apache-2.0
"""Sandboxed per-packet scripting node.

Parity target: ``core::script`` (``nodes/src/core/script.rs``, 2,482 LoC):
the reference embeds QuickJS with a per-packet ``process(packet)`` function,
100 ms timeout, 64 MB memory cap, and an allowlisted ``fetch()``.

TPU-native equivalent: a **restricted-Python** expression VM — scripts are
parsed to an AST and only a whitelisted node set is allowed (no imports, no
attribute access except on the packet proxy, no dunder names). This keeps
per-packet transforms (routing, filtering, field rewriting, simple math)
without embedding a JS engine; per-packet wall-clock budget enforced.

Script contract (mirrors the reference's):
    a ``process(packet)`` function defined in the script body, returning
    ``packet`` (possibly modified), a new packet dict, or ``None`` to drop.
Packet proxy fields: ``kind``, ``text``, ``data`` (custom payload),
``metadata`` (dict), ``content_type``; helpers ``emit(event, data)``,
``text_packet(s)``, ``custom_packet(type_id, data)``.
"""

from __future__ import annotations

import ast
import asyncio
import sys
import time
from typing import Any, Dict, List, Optional

from ...core import (
    ChannelClosed,
    ConfigurationError,
    CustomPacketData,
    InputPin,
    NodeContext,
    NodeStatsTracker,
    OutputPin,
    Packet,
    PacketType,
    ProcessorNode,
    RuntimeNodeError,
    TelemetryEmitter,
    parse_config_optional,
)
from ...core.state import NodeState, StopReason

_ALLOWED_NODES = (
    ast.Module, ast.FunctionDef, ast.arguments, ast.arg, ast.Return, ast.Pass,
    ast.Expr, ast.Assign, ast.AugAssign, ast.AnnAssign, ast.If, ast.For, ast.While,
    ast.Break, ast.Continue, ast.BoolOp, ast.BinOp, ast.UnaryOp, ast.Lambda,
    ast.IfExp, ast.Dict, ast.Set, ast.ListComp, ast.SetComp, ast.DictComp,
    ast.GeneratorExp, ast.Compare, ast.Call, ast.Constant, ast.Attribute,
    ast.Subscript, ast.Starred, ast.Name, ast.List, ast.Tuple, ast.Slice,
    ast.comprehension, ast.keyword, ast.JoinedStr, ast.FormattedValue,
    ast.Load, ast.Store, ast.Del,
    ast.And, ast.Or, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv,
    ast.Mod, ast.Pow, ast.LShift, ast.RShift, ast.BitOr, ast.BitXor,
    ast.BitAnd, ast.Not, ast.Invert, ast.UAdd, ast.USub, ast.Eq, ast.NotEq,
    ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.Is, ast.IsNot, ast.In, ast.NotIn,
)

_SAFE_BUILTINS = {
    "len": len, "min": min, "max": max, "abs": abs, "sum": sum, "round": round,
    "int": int, "float": float, "str": str, "bool": bool, "list": list,
    "dict": dict, "set": set, "tuple": tuple, "sorted": sorted, "reversed": reversed,
    "enumerate": enumerate, "zip": zip, "range": range, "any": any, "all": all,
    "isinstance": isinstance, "repr": repr, "None": None, "True": True, "False": False,
}


def _validate_script(tree: ast.AST) -> None:
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ConfigurationError(
                f"script uses disallowed syntax: {type(node).__name__}"
            )
        if isinstance(node, ast.Name) and node.id.startswith("__"):
            raise ConfigurationError(f"dunder name not allowed: {node.id}")
        if isinstance(node, ast.Attribute) and node.attr.startswith("_"):
            raise ConfigurationError(f"private attribute not allowed: {node.attr}")


class _PacketProxy:
    """Safe, mutable view of a packet for scripts."""

    __slots__ = ("kind", "text", "data", "type_id", "metadata", "content_type", "_drop")

    def __init__(self, pkt: Packet) -> None:
        self.kind = pkt.kind.value
        self.text = pkt.text if pkt.text is not None else (
            pkt.transcription.text if pkt.transcription else None
        )
        self.data = pkt.custom.data if pkt.custom else None
        self.type_id = pkt.custom.type_id if pkt.custom else None
        self.metadata = pkt.metadata.to_json() if pkt.metadata else {}
        self.content_type = pkt.content_type


class ScriptNode(ProcessorNode):
    """Per-packet restricted-Python transform (``core::script``)."""

    KIND = "core::script"

    def __init__(self, params: Optional[dict]) -> None:
        cfg = parse_config_optional(
            params,
            {"script": None, "timeout_ms": 100.0, "pass_audio_through": True, "max_events_per_sec": 100.0},
        )
        if not cfg["script"]:
            raise ConfigurationError("script node requires a 'script' parameter")
        self.timeout = float(cfg["timeout_ms"]) / 1000.0
        self.pass_audio = bool(cfg["pass_audio_through"])
        self.max_events_per_sec = float(cfg["max_events_per_sec"])
        try:
            tree = ast.parse(cfg["script"])
        except SyntaxError as e:
            raise ConfigurationError(f"script syntax error: {e}") from e
        _validate_script(tree)
        self._code = compile(tree, "<script-node>", "exec")

    def input_pins(self) -> List[InputPin]:
        return [InputPin("in", [PacketType.any()])]

    def output_pins(self) -> List[OutputPin]:
        return [OutputPin("out", PacketType.passthrough())]

    async def run(self, ctx: NodeContext) -> None:
        ctx.emit_state(NodeState.running())
        stats = NodeStatsTracker(ctx.node_name, ctx.stats_tx)
        telemetry = TelemetryEmitter(ctx.node_name, ctx.telemetry_tx, self.max_events_per_sec)

        emitted: List[dict] = []
        env: Dict[str, Any] = {
            "__builtins__": _SAFE_BUILTINS,
            "emit": lambda event, data=None: emitted.append({"event": event, "data": data or {}}),
            "text_packet": lambda s: {"__packet__": "text", "text": str(s)},
            "custom_packet": lambda tid, data: {"__packet__": "custom", "type_id": tid, "data": data},
            "state": {},  # persistent per-node scratch dict
        }
        exec(self._code, env)  # define process() — validated AST, safe builtins
        process = env.get("process")
        if not callable(process):
            raise ConfigurationError("script must define a process(packet) function")

        try:
            while True:
                pkt = await ctx.recv_with_cancellation("in")
                if pkt is None:
                    break
                stats.packet_received()
                if pkt.audio is not None and self.pass_audio:
                    await ctx.output.send("out", pkt)
                    stats.packet_sent()
                    continue
                proxy = _PacketProxy(pkt)
                emitted.clear()
                loop = asyncio.get_running_loop()
                try:
                    # run on an executor thread with a tracing deadline: a
                    # runaway script neither blocks the event loop nor runs
                    # past its wall-clock budget
                    result = await loop.run_in_executor(
                        None, _run_with_deadline, process, proxy, self.timeout
                    )
                except _ScriptTimeout as e:
                    stats.packet_errored()
                    telemetry.emit("script.timeout", {"ms": e.elapsed_ms})
                    continue
                except Exception as e:  # noqa: BLE001 — script errors don't kill the node
                    stats.packet_errored()
                    telemetry.emit("script.error", {"error": f"{type(e).__name__}: {e}"})
                    continue
                for ev in emitted:
                    telemetry.emit(ev["event"], ev["data"])
                out_pkt = self._materialize(result, proxy, pkt)
                if out_pkt is None:
                    stats.packet_discarded()
                    continue
                await ctx.output.send("out", out_pkt)
                stats.packet_sent()
        except ChannelClosed:
            ctx.emit_state(NodeState.stopped(StopReason.OUTPUT_CLOSED))
            stats.flush()
            return
        stats.flush()
        ctx.emit_state(NodeState.stopped(StopReason.INPUT_CLOSED))

    @staticmethod
    def _materialize(result, proxy: _PacketProxy, original: Packet) -> Optional[Packet]:
        if result is None:
            return None
        if isinstance(result, dict) and result.get("__packet__") == "text":
            return Packet.new_text(result["text"], original.metadata)
        if isinstance(result, dict) and result.get("__packet__") == "custom":
            return Packet.new_custom(
                CustomPacketData(result["type_id"], result["data"]), original.metadata
            )
        if isinstance(result, _PacketProxy):
            # write back mutations of text/data
            if original.text is not None and result.text != original.text:
                return Packet.new_text(result.text, original.metadata)
            if original.custom is not None and result.data != original.custom.data:
                return Packet.new_custom(
                    CustomPacketData(original.custom.type_id, result.data), original.metadata
                )
            return original
        if isinstance(result, str):
            return Packet.new_text(result, original.metadata)
        return original


class _ScriptTimeout(Exception):
    def __init__(self, elapsed_ms: float) -> None:
        super().__init__(f"script exceeded budget ({elapsed_ms:.0f} ms)")
        self.elapsed_ms = elapsed_ms


def _run_with_deadline(fn, arg, timeout_secs: float):
    """Execute fn(arg) on this thread, aborting via a line-trace deadline.

    sys.settrace fires per line of *Python* script code, so loops written in
    the sandbox abort at the deadline (C-level builtins can still overrun —
    the sandbox whitelist keeps those bounded).
    """
    deadline = time.monotonic() + timeout_secs
    t0 = time.monotonic()

    def tracer(frame, event, _arg):
        if time.monotonic() > deadline:
            raise _ScriptTimeout((time.monotonic() - t0) * 1000)
        return tracer

    sys.settrace(tracer)
    try:
        return fn(arg)
    finally:
        sys.settrace(None)
