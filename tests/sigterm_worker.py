"""Subprocess worker for the 2-process SIGTERM-agreement test.

Simulates main.py's epoch loop with the REAL GracefulStop: each rank loops
over "epochs" (a tiny sharded computation stands in for train_epoch so the
loop has real collectives), calling stop.agreed() at every boundary. The
parent SIGTERMs ONLY rank 1 partway through; both ranks must exit the loop
at the SAME epoch — the signaled rank via its flag, rank 0 via the
allgather — and neither may deadlock in the next epoch's collectives.

Usage: python sigterm_worker.py <coordinator> <num_procs> <pid> <epochs>
Prints: STOPPED pid=<pid> epoch=<epoch>
"""

import sys
import time


def main():
    coordinator, num_procs, pid, epochs = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from tinyfaces_tpu.parallel.distributed import (
        GracefulStop, barrier_at_exit, global_mesh, host_local_batch,
    )

    stop = GracefulStop()
    mesh = global_mesh()

    @jax.jit
    def epoch_work(x):
        return (x * 2.0).sum()

    print(f"READY pid={pid}", flush=True)
    stopped_at = -1
    for epoch in range(epochs):
        # stand-in for train_epoch: a real collective over the global mesh
        # 4 local rows x 2 processes = 8 global rows over the 8-device mesh
        local = np.full((4, 4), float(epoch), np.float32)
        batch = host_local_batch({"x": local}, mesh)
        float(epoch_work(batch["x"]))  # fetch = all ranks participated
        time.sleep(0.5)  # window for the parent's SIGTERM to land mid-epoch
        if stop.agreed():
            stopped_at = epoch
            break
    print(f"STOPPED pid={pid} epoch={stopped_at}", flush=True)
    barrier_at_exit("sigterm_test_done")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
