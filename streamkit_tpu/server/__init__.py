# SPDX-License-Identifier: Apache-2.0
"""The server layer: HTTP + WebSocket control plane (skit equivalent)."""

from .app import AppState, create_app, run_server
from .config import ServerConfig, load_config
from .permissions import Permissions, RoleStore
from .sessions import Session, SessionManager
