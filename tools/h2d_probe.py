"""Characterize the host->device link: bandwidth vs payload entropy, size,
dtype, and concurrency. Determines whether the remote-attach tunnel
compresses (zeros vs noise), whether chunked/parallel puts pipeline better,
and today's sustainable rate — input for bench/pipeline design.
"""

import os
import sys
import time

import numpy as np


def timed_put(jax, arr, iters=4):
    jax.device_put(arr).block_until_ready()  # warm path
    t0 = time.time()
    for _ in range(iters):
        jax.device_put(arr).block_until_ready()
    dt = (time.time() - t0) / iters
    return arr.nbytes / 2**20 / dt, dt


def main():
    import jax

    rng = np.random.default_rng(0)
    MB = 2**20

    noise = rng.integers(0, 255, (36 * MB,), dtype=np.uint8)
    zeros = np.zeros(36 * MB, np.uint8)
    # photo-like: smooth 2-D gradients + blocky regions, uint8
    x = np.linspace(0, 255, 1024)
    photo = ((x[None, :] + x[:, None]) / 2).astype(np.uint8)
    photo = np.tile(photo, (36, 1, 1))[..., None].repeat(3, -1)[:, :, :, 0]
    photo = np.ascontiguousarray(photo.reshape(-1)[: 36 * MB])

    for name, arr in (("noise36MB", noise), ("zeros36MB", zeros),
                      ("photo36MB", photo)):
        bw, dt = timed_put(jax, arr)
        print(f"{name}: {bw:.0f} MiB/s ({dt*1e3:.0f} ms)", flush=True)

    for size_mb in (1, 4, 16):
        arr = rng.integers(0, 255, (size_mb * MB,), dtype=np.uint8)
        bw, dt = timed_put(jax, arr)
        print(f"noise {size_mb}MB: {bw:.0f} MiB/s ({dt*1e3:.1f} ms)", flush=True)

    # concurrency: 4 x 9MB enqueued before blocking
    chunks = [rng.integers(0, 255, (9 * MB,), dtype=np.uint8) for _ in range(4)]
    for c in chunks:
        jax.device_put(c).block_until_ready()
    t0 = time.time()
    for _ in range(4):
        refs = [jax.device_put(c) for c in chunks]
        for r in refs:
            r.block_until_ready()
    dt = (time.time() - t0) / 4
    print(f"4x9MB async puts: {36/dt:.0f} MiB/s ({dt*1e3:.0f} ms)", flush=True)

    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()


if __name__ == "__main__":
    main()
