"""Checkpoint IO: pytree state + embedded config.

Contract parity with the reference: checkpoints carry both the weights and
the resolved config so evaluation can rebuild the network from the
checkpoint alone (GMF_DGR core/deep_global_registration.py:111-116,
core/trainer.py:541-563; PointDSC writes config.json next to snapshots,
train_3DMatch.py:35-39).

Format: a directory containing ``state.msgpack`` (flax serialization) and
``config.json``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any],
                    config: Optional[Dict[str, Any]] = None) -> str:
    """Write state pytree + config to ``path`` (a directory)."""
    os.makedirs(path, exist_ok=True)
    state = jax.tree.map(np.asarray, state)
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    return path


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Optional[Dict]]:
    """Read (state pytree, config dict or None) from ``path``."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = serialization.msgpack_restore(f.read())
    config = None
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return state, config
