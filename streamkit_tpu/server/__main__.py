# SPDX-License-Identifier: Apache-2.0
"""``python -m streamkit_tpu.server`` — serve command (reference ``skit serve``)."""

from __future__ import annotations

import argparse
import json
import logging
import sys

from .config import ServerConfig, load_config


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="skit-tpu", description="TPU-native StreamKit server")
    sub = parser.add_subparsers(dest="command")

    serve = sub.add_parser("serve", help="start the server")
    serve.add_argument("--config", "-c", default=None, help="TOML config file")
    serve.add_argument("--address", default=None)
    serve.add_argument("--port", "-p", type=int, default=None)
    serve.add_argument("--log-level", default="info")

    cfg_cmd = sub.add_parser("config", help="config utilities")
    cfg_sub = cfg_cmd.add_subparsers(dest="config_command")
    cfg_sub.add_parser("default", help="print the default config as JSON")

    args = parser.parse_args(argv)
    if args.command == "config":
        print(json.dumps(ServerConfig().to_json(), indent=2))
        return 0
    if args.command in (None, "serve"):
        config = load_config(getattr(args, "config", None))
        if getattr(args, "address", None):
            config.address = args.address
        if getattr(args, "port", None):
            config.port = args.port
        logging.basicConfig(
            level=getattr(logging, getattr(args, "log_level", "info").upper(), logging.INFO),
            format="%(asctime)s %(levelname)s %(name)s %(message)s",
        )
        from .app import run_server

        run_server(config)
        return 0
    parser.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
