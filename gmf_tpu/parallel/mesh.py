"""Mesh + sharding helpers for SPMD data/model parallel execution.

Design (SURVEY.md §2.6): a 2-D ('data', 'model') mesh. Registration
workloads are embarrassingly data-parallel over pairs — 'data' is the
primary axis and delivers the >=5x pairs/sec target on a v5e-8. The
'model' axis exists so attention/MLP weights *can* shard (tensor parallel)
without restructuring; with model=1 everything below reduces to pure DP.
XLA inserts the psum/all_gather collectives over ICI from the sharding
annotations — no explicit communication code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    With defaults, uses all devices on the data axis.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Shard every leaf of a batch pytree along its leading (batch) dim."""
    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_shardings(mesh: Mesh):
    """(replicated, batch-sharded) NamedShardings for jit in/out specs."""
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    return repl, batched


def process_shard(items: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """Per-process slice of a host-side work list (multi-host data loading).

    SPMD multi-host JAX runs one Python process per host; each process
    must load a DISJOINT shard of the dataset (the tf.data
    ``shard(num_shards, index)`` contract). ``shard_batch`` above shards
    arrays already resident on one host across local devices; this helper
    is the loader-side half: strided assignment of dataset items (pair
    paths, scene ids) to processes, so every global batch is drawn from
    process-disjoint data.

    Single-host (this repo's v5e-1/v5e-8 scope) degenerates to identity.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return items[process_index::process_count]
