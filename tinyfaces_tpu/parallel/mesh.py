"""Device mesh and sharding helpers for data-parallel training/eval.

The reference is single-device (main.py:60-64, SURVEY.md §2.9); this
framework is SPMD from the start. The design is the standard JAX recipe:

  * one mesh axis "data"; the batch is sharded over it, parameters and
    optimizer state are replicated;
  * the train step is an ordinary jitted function — XLA's SPMD partitioner
    sees the input shardings and inserts the gradient all-reduce (psum over
    ICI) and the cross-device BatchNorm statistics reduction automatically;
  * multi-host: `jax.distributed.initialize()` + per-host sharded input
    feeding via `jax.make_array_from_process_local_data`.

Tested on an 8-virtual-device CPU mesh (tests/conftest.py) and dry-run by
the driver via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place a host batch pytree onto the mesh, sharded over the batch dim."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
