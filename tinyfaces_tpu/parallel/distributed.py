"""Multi-host SPMD initialization helpers.

The reference has no distributed backend at all (SURVEY.md §2.9: no
torch.distributed/NCCL anywhere — single cuda:0). This framework is SPMD
from the start; within one host the data mesh forms over local chips and
XLA rides ICI for the gradient psum. Across hosts:

  * call `initialize()` once per process before any jax call
    (jax.distributed.initialize — coordinator discovery via env or args);
  * build the mesh over jax.devices() (global view, all hosts);
  * feed each host only its batch shard and assemble the global array with
    `host_local_batch` (jax.make_array_from_process_local_data), so DCN
    carries no input data and gradients reduce over ICI first.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from tinyfaces_tpu.parallel.mesh import DATA_AXIS, batch_sharding, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper; no-op when single-process."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def barrier_at_exit(name: str = "exit") -> None:
    """Cross-process barrier before a rank exits a distributed run.

    The first process to exit takes the coordination service with it
    (process 0 hosts it): any rank still mid-work then FATALS with
    "Failed to send RPC to coordination service ... Socket closed"
    (reproduced in tests/test_parallel.py's 2-process eval under a
    contended host — the faster rank finished its slice and died while
    the other was still sweeping). No-op when single-process."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


class GracefulStop:
    """SIGTERM -> stop at the next epoch boundary, agreed across processes.

    A scheduler may deliver SIGTERM to only SOME ranks (one task preempted).
    With a per-process flag, the signaled rank would break out of the epoch
    loop while the rest enter the next epoch's collectives and deadlock on
    the missing participant. `agreed()` runs a tiny allgather at the epoch
    boundary so any single rank's signal stops every rank at the SAME
    boundary. Single-process: plain flag, no collective.

    The reference has no stop handling at all (main.py just dies);
    SURVEY.md §5 failure-detection. Exercised for real by
    tests/test_parallel.py::test_sigterm_stop_agreed_across_processes
    (2 processes, only rank 1 signaled).
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._flag = False
        for s in signals if signals is not None else (_signal.SIGTERM,):
            _signal.signal(s, self._handler)

    def _handler(self, signum, frame):
        print(f"signal {signum}: will checkpoint and stop after this epoch",
              flush=True)
        self._flag = True

    def requested(self) -> bool:
        """This process's local flag (no collective — safe mid-epoch)."""
        return self._flag

    def agreed(self) -> bool:
        """Global stop decision; MUST be called by every rank at the same
        point (epoch boundary) — it is a collective."""
        if jax.process_count() == 1:
            return self._flag
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(self._flag, np.int32))
        agreed = bool(np.asarray(flags).any())
        # Latch: once any rank agreed to stop, every rank reports stop from
        # here on (callers checkpoint once, then break).
        self._flag = self._flag or agreed
        return agreed


def global_mesh(axis: str = DATA_AXIS):
    """Mesh over every chip in the job (all hosts)."""
    return make_mesh(jax.devices(), axis)


def host_local_batch(batch: Any, mesh) -> Any:
    """Assemble a global sharded batch from this host's local shard.

    Each process passes arrays covering its own slice of the global batch;
    the result is a jax.Array sharded over the data axis with no cross-host
    data movement.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )


def process_batch_slice(global_batch_size: int) -> slice:
    """Which rows of the global batch this process should load."""
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
