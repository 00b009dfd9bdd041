# SPDX-License-Identifier: Apache-2.0
"""Interactive shell for live session control.

Parity target: ``apps/skit-cli/src/shell.rs`` (741 LoC): a REPL over the WS
control plane — create/use sessions, add/connect/tune nodes, watch events.
"""

from __future__ import annotations

import asyncio
import json
import shlex
import sys
from typing import Optional

from .client import SkitClient

HELP = """commands:
  sessions                         list sessions
  create [name]                    create a session (and select it)
  use <session-id>                 select a session
  destroy [session-id]             destroy selected/named session
  nodes                            list available node kinds
  add <node-id> <kind> [json]      add a node to the selected session
  rm <node-id>                     remove a node
  connect <from> <to> [fpin tpin]  connect nodes (default out->in)
  disconnect <from> <to> [f t]     disconnect
  tune <node-id> <json>            update node params
  pipeline                         show the live pipeline
  watch [n]                        print the next n events (default 5)
  help                             this text
  quit / exit
"""


class Shell:
    def __init__(self, client: SkitClient) -> None:
        self.client = client
        self.session: Optional[str] = None

    def _sid(self, args) -> str:
        sid = args[0] if args else self.session
        if not sid:
            raise RuntimeError("no session selected (use `create` or `use <id>`)")
        return sid

    async def dispatch(self, line: str) -> bool:
        try:
            parts = shlex.split(line)
        except ValueError as e:
            print(f"parse error: {e}")
            return True
        if not parts:
            return True
        cmd, args = parts[0], parts[1:]
        try:
            if cmd in ("quit", "exit"):
                return False
            elif cmd == "help":
                print(HELP)
            elif cmd == "sessions":
                for s in await self.client.list_sessions():
                    marker = "*" if s["id"] == self.session else " "
                    print(f"{marker} {s['id']}  {s.get('name') or ''}")
            elif cmd == "create":
                p = await self.client.request("createsession", name=args[0] if args else None)
                self.session = p["session_id"]
                print(f"created + selected {p['session_id']} ({p.get('name')})")
            elif cmd == "use":
                self.session = args[0]
                print(f"selected {self.session}")
            elif cmd == "destroy":
                sid = self._sid(args)
                await self.client.request("destroysession", session_id=sid)
                if sid == self.session:
                    self.session = None
                print(f"destroyed {sid}")
            elif cmd == "nodes":
                for n in await self.client.schema_nodes():
                    print(f"{n['kind']:42s} {n['description']}")
            elif cmd == "add":
                params = json.loads(args[2]) if len(args) > 2 else None
                await self.client.request(
                    "addnode", session_id=self._sid([]), node_id=args[0], kind=args[1], params=params
                )
                print("ok")
            elif cmd == "rm":
                await self.client.request("removenode", session_id=self._sid([]), node_id=args[0])
                print("ok")
            elif cmd in ("connect", "disconnect"):
                fpin = args[2] if len(args) > 2 else "out"
                tpin = args[3] if len(args) > 3 else "in"
                await self.client.request(
                    cmd, session_id=self._sid([]), from_node=args[0], from_pin=fpin,
                    to_node=args[1], to_pin=tpin,
                )
                print("ok")
            elif cmd == "tune":
                await self.client.request(
                    "tunenode", session_id=self._sid([]), node_id=args[0],
                    message={"type": "update_params", "params": json.loads(args[1])},
                )
                print("ok")
            elif cmd == "pipeline":
                p = await self.client.request("getpipeline", session_id=self._sid([]))
                pipe = p["pipeline"]
                for name, node in pipe["nodes"].items():
                    print(f"  {name:20s} {node['kind']:32s} {node.get('state')}")
                for c in pipe["connections"]:
                    print(f"  {c['from_node']}:{c['from_pin']} -> {c['to_node']}:{c['to_pin']}")
            elif cmd == "watch":
                n = int(args[0]) if args else 5
                count = 0
                async for ev in self.client.events():
                    print(json.dumps(ev))
                    count += 1
                    if count >= n:
                        break
            else:
                print(f"unknown command {cmd!r} (try `help`)")
        except (RuntimeError, IndexError, json.JSONDecodeError) as e:
            print(f"error: {e}")
        return True

    async def repl(self) -> None:
        print("streamkit-tpu shell — `help` for commands")
        loop = asyncio.get_running_loop()
        while True:
            prompt = f"skit[{(self.session or '-')[:8]}]> "
            try:
                line = await loop.run_in_executor(None, lambda: input(prompt))
            except (EOFError, KeyboardInterrupt):
                break
            if not await self.dispatch(line):
                break


async def run_shell(server: str) -> int:
    async with SkitClient(server) as client:
        await client.connect_ws()
        await Shell(client).repl()
    return 0
