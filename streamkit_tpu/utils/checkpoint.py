# SPDX-License-Identifier: Apache-2.0
"""Model checkpoint save/restore (orbax).

The reference has no runtime-state checkpointing (SURVEY.md §5 — sessions
are ephemeral, models are files on disk). Here, fine-tuned/converted JAX
param pytrees persist via orbax so a server restart (or a fleet rollout)
restores weights without re-converting HF checkpoints. Works with sharded
pytrees: restored arrays follow the provided sharding template.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["save_params", "load_params", "latest_step", "save_train_state", "load_train_state"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_params(directory: str, params: Any, step: int = 0) -> str:
    """Save a param pytree under ``directory/step_N``; returns the path."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckpt = _checkpointer()
    ckpt.save(path, params)
    ckpt.wait_until_finished()
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(d.split("_", 1)[1])
        for d in os.listdir(directory)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def load_params(directory: str, template: Any, step: Optional[int] = None) -> Any:
    """Restore a param pytree. ``template`` provides structure/shardings
    (an abstract pytree or a concrete one, e.g. from ``init_params``)."""
    import jax

    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
        template,
    )
    return _checkpointer().restore(path, abstract)


def save_train_state(directory: str, state, step: Optional[int] = None) -> str:
    """Save a parallel.TrainState (params + optimizer state + step)."""
    import numpy as np

    s = int(np.asarray(state.step)) if step is None else step
    return save_params(directory, state._asdict(), step=s)


def load_train_state(directory: str, template_state, step: Optional[int] = None):
    from ..parallel.train import TrainState

    restored = load_params(directory, template_state._asdict(), step)
    return TrainState(**restored)
