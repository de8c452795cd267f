"""Benchmark: WIDER-style image-pyramid inference throughput on one chip.

Measures the end-to-end single-image pipeline the reference runs per val
image (evaluate_model.py -> evaluation.py:20-87): pyramid scales 2**{-2..1}
over a 1024x768 image, ResNet-101 FCN forward per scale, on-device decode,
cross-scale NMS — including host resize and transfers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md). We
use a FLOPs-derived estimate of the reference PyTorch pipeline on an A100:
the pyramid costs ~5.3x a single 768x1024 forward (~0.25 TFLOP) ≈ 1.3
TFLOP/image; fp32 PyTorch conv throughput w/ host decode round-trips ≈ 4
TFLOP/s sustained -> ~3 images/sec. vs_baseline = ours / 3.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 3.0  # estimated reference-on-A100 (see module docstring)


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
    # Wire format: planar YCbCr 4:2:0 (the format JPEG sources already carry)
    # — 1.5 B/px instead of 3, colorspace conversion fused on device. The
    # shared remote link's bandwidth, not compute, bounds e2e throughput
    # (docs/PERF.md); BENCH_TRANSFER=rgb measures the bit-exact RGB path.
    transfer = os.environ.get("BENCH_TRANSFER", "yuv420")
    detector = PyramidDetector(
        model, variables, templates, cfg=DetectorConfig(), ec=EvalConfig(),
        transfer=transfer,
    )

    rng = np.random.default_rng(0)
    # Batch 32 amortizes the remote link's ~33 ms dispatch latency:
    # measured ceilings 66.6 (b16) / 73.4 (b32) / 79.1 (b64) img/s; b32 is
    # the default so a congested-link window still finishes promptly.
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    images = [
        rng.integers(0, 255, (768, 1024, 3), dtype=np.uint8) for _ in range(batch)
    ]

    # Warmup: compiles the fused whole-pyramid program (resize + 4 forwards +
    # decode + cross-scale NMS in ONE dispatch).
    t0 = time.time()
    dets = detector.detect_batch(images)[-1]
    warmup_s = time.time() - t0

    # single-image latency (one fused dispatch; separate B=1 program)
    detector.detect(images[0])  # warmup compile
    t0 = time.time()
    lat_iters = 5
    for _ in range(lat_iters):
        detector.detect(images[0])
    lat_ms = (time.time() - t0) / lat_iters * 1e3

    # Pipelined throughput: keep DEPTH batches in flight so host padding and
    # H2D overlap device compute (depth 3 measured best on the tunnel).
    # The remote link is multi-tenant and noisy (docs/PERF.md), so measure
    # WINDOWS windows and report the median.
    import collections

    iters = int(os.environ.get("BENCH_ITERS", str(max(2, 128 // batch))))
    depth = int(os.environ.get("BENCH_DEPTH", "3"))
    # The shared link's bandwidth swings several-x between 10 s windows
    # (docs/PERF.md); 5 windows keeps the median stable under one outlier
    # in each direction at ~2 min total.
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    rates = []
    for _ in range(windows):
        q = collections.deque()
        t0 = time.time()
        for _ in range(iters):
            q.append(detector.detect_batch_async(images))
            if len(q) > depth:
                dets = detector._fetch(q.popleft())[-1]
        while q:
            dets = detector._fetch(q.popleft())[-1]
        rates.append(iters * batch / (time.time() - t0))
    rates.sort()

    imgs_per_sec = rates[len(rates) // 2]
    print(
        json.dumps(
            {
                "metric": "pyramid_inference_images_per_sec_per_chip",
                "value": round(imgs_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
            }
        )
    )
    print(
        f"# warmup(compile) {warmup_s:.1f}s; window rates "
        f"{[round(r, 1) for r in rates]} img/s (median reported); "
        f"single-image latency {lat_ms:.1f} ms; "
        f"last image produced {dets.shape[0]} detections",
        file=sys.stderr,
    )
    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()


if __name__ == "__main__":
    main()
