"""Decompose fused-pyramid end-to-end time into host prep / H2D / compute /
fetch on the real chip, and measure overlap effectiveness at several
pipeline depths. Round-2 throughput work (VERDICT #2): the driver captured
15.67 img/s vs the 48 img/s compute ceiling; this tool locates the gap.
"""

import os
import sys
import time

import numpy as np


def main():
    from tinyfaces_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector, get_model

    templates = load_templates()
    model, variables = get_model(num_templates=25, dtype=jnp.bfloat16)
    det = PyramidDetector(model, variables, templates,
                          cfg=DetectorConfig(), ec=EvalConfig())

    rng = np.random.default_rng(0)
    B = int(os.environ.get("BENCH_BATCH", "16"))
    images = [rng.integers(0, 255, (768, 1024, 3), dtype=np.uint8) for _ in range(B)]

    # warmup/compile
    t0 = time.time(); det.detect_batch(images); print(f"warmup {time.time()-t0:.1f}s", flush=True)

    # 1) host prep cost (pad/copy into the batch buffer)
    hs = [im.shape[0] for im in images]; ws = [im.shape[1] for im in images]
    t0 = time.time()
    for _ in range(5):
        batch = np.empty((B, 768, 1024, 3), np.uint8)
        for i, im in enumerate(images):
            batch[i, : im.shape[0], : im.shape[1]] = im
    prep_ms = (time.time() - t0) / 5 * 1e3
    print(f"host prep: {prep_ms:.1f} ms/batch ({B*768*1024*3/2**20:.1f} MiB)", flush=True)

    # 2) H2D: device_put + block
    t0 = time.time()
    for _ in range(5):
        jax.device_put(batch).block_until_ready()
    h2d_ms = (time.time() - t0) / 5 * 1e3
    print(f"H2D device_put(block): {h2d_ms:.1f} ms/batch "
          f"-> {B*768*1024*3/2**20/(h2d_ms/1e3):.0f} MiB/s", flush=True)

    # 3) pure compute: program on device-resident input
    dev_batch = jax.device_put(jnp.asarray(batch))
    hs_j = jnp.asarray(hs, jnp.int32); ws_j = jnp.asarray(ws, jnp.int32)
    scales = tuple(det.ec.scales)
    args = dict(scales=scales, h0p=768, w0p=1024,
                prob_thresh=float(det.ec.prob_thresh),
                nms_thresh=float(det.ec.nms_thresh), transfer="rgb")
    r = det._fused_pyramid(det.variables, det.templates_j,
                           dev_batch, hs_j, ws_j, **args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(5):
        r = det._fused_pyramid(det.variables, det.templates_j,
                               dev_batch, hs_j, ws_j, **args)
        jax.block_until_ready(r)
    comp_ms = (time.time() - t0) / 5 * 1e3
    print(f"device compute (resident input): {comp_ms:.1f} ms/batch "
          f"-> {B/(comp_ms/1e3):.1f} img/s ceiling", flush=True)

    # 4) fetch cost
    t0 = time.time()
    for _ in range(5):
        det._fetch(r)
    fetch_ms = (time.time() - t0) / 5 * 1e3
    out_bytes = np.asarray(r).nbytes
    print(f"fetch: {fetch_ms:.1f} ms/batch ({out_bytes/2**10:.0f} KiB)", flush=True)

    # 5) end-to-end serial (detect_batch)
    t0 = time.time()
    for _ in range(5):
        det.detect_batch(images)
    serial_ms = (time.time() - t0) / 5 * 1e3
    print(f"e2e serial detect_batch: {serial_ms:.1f} ms/batch "
          f"-> {B/(serial_ms/1e3):.1f} img/s", flush=True)

    # 6) pipelined at depths 1..4
    import collections
    for depth in (1, 2, 3, 4):
        q = collections.deque()
        iters = 8
        t0 = time.time()
        for _ in range(iters):
            q.append(det.detect_batch_async(images))
            if len(q) > depth:
                det._fetch(q.popleft())
        while q:
            det._fetch(q.popleft())
        dt = time.time() - t0
        print(f"pipelined depth={depth}: {dt/iters*1e3:.1f} ms/batch "
              f"-> {iters*B/dt:.1f} img/s", flush=True)

    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()


if __name__ == "__main__":
    main()
