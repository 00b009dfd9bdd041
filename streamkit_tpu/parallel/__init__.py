# SPDX-License-Identifier: Apache-2.0
"""Multi-chip scaling: device meshes, shardings, sharded train/serve steps."""

from .mesh import (
    data_sharding,
    make_mesh,
    seq2seq_param_sharding,
    shard_params,
    whisper_param_sharding,
)
from .train import TrainState, init_train_state, make_train_step
