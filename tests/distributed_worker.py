"""Subprocess worker for the 2-process jax.distributed CPU test.

Each process owns 4 virtual CPU devices (8 global). It initializes the
coordinator, builds the global mesh, feeds its local half of a
deterministic global batch through host_local_batch, runs two SGD steps on
a toy linear model (grads reduce over the global mesh exactly like the real
train step's psum), and prints the final parameter checksum + loss — the
parent asserts both processes agree and match the single-process oracle.

Usage: python distributed_worker.py <coordinator> <num_procs> <pid>
"""

import sys


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=pid,
    )

    import jax.numpy as jnp
    import numpy as np

    from tinyfaces_tpu.parallel.distributed import (
        global_mesh,
        host_local_batch,
        process_batch_slice,
    )
    from tinyfaces_tpu.parallel.mesh import replicate_tree

    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

    mesh = global_mesh()

    # deterministic global batch; each process materializes only its slice
    gb = 8
    xs = np.arange(gb * 4, dtype=np.float32).reshape(gb, 4) / 10.0
    ys = np.arange(gb, dtype=np.float32)[:, None] / 5.0
    sl = process_batch_slice(gb)
    batch = host_local_batch({"x": xs[sl], "y": ys[sl]}, mesh)

    w = replicate_tree({"w": jnp.ones((4, 1)) * 0.5}, mesh)["w"]

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.01 * g, loss

    for _ in range(2):
        w, loss = step(w, batch["x"], batch["y"])

    wsum = float(jnp.sum(w))
    print(f"RESULT pid={pid} wsum={wsum:.10f} loss={float(loss):.10f}",
          flush=True)
    sys.stdout.flush()
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
