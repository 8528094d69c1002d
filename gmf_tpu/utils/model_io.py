"""Model loading: gmf_tpu checkpoints or reference torch state_dicts.

Keeps the reference's "eval reads config from the checkpoint" contract
(configs embedded in gmf_tpu checkpoints; torch .pkl files are converted
on the fly via utils/convert_torch.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp


def load_pointdsc(path: str, inlier_threshold: float = 0.10,
                  num_layers: int = 12, num_channels: int = 128):
    """Load a PointDSC model + variables from either checkpoint format.

    - directory  -> gmf_tpu checkpoint (state.msgpack + config.json)
    - *.pkl/.pth -> reference torch state_dict, converted
    """
    from gmf_tpu.models import PointDSC

    if os.path.isdir(path):
        from gmf_tpu.utils.checkpoint import load_checkpoint

        state, config = load_checkpoint(path)
        arch = (config or {}).get("arch") or (
            (config or {}).get("model") or {}).get("arch")
        if arch not in (None, "pointdsc", "PointDSC"):
            raise ValueError(
                f"checkpoint at {path} holds arch={arch!r}, not a "
                "PointDSC state — load it with its own converter "
                "(e.g. OANet via convert_torch.convert_oanet)")
        valid = {f for f in PointDSC.__dataclass_fields__
                 if f not in ("parent", "name", "dtype")}
        if config and "model" in config:
            model_kw = {k: v for k, v in config["model"].items()
                        if k in valid}
        else:
            model_kw = dict(num_layers=num_layers,
                            num_channels=num_channels,
                            inlier_threshold=inlier_threshold)
        model = PointDSC(**model_kw)
        variables = {"params": state["params"]}
        if "batch_stats" in state:
            variables["batch_stats"] = state["batch_stats"]
        import jax

        variables = jax.tree.map(jnp.asarray, variables)
        return model, variables

    # torch state_dict
    from gmf_tpu.utils.convert_torch import (
        convert_pointdsc, load_torch_state_dict,
    )

    sd = load_torch_state_dict(path)
    variables = convert_pointdsc(sd, num_layers=num_layers)
    import jax

    variables = jax.tree.map(jnp.asarray, variables)
    model = PointDSC(num_layers=num_layers, num_channels=num_channels,
                     inlier_threshold=inlier_threshold)
    return model, variables
