"""Serving latency SLO benchmark: p50/p95/p99 vs offered load.

Drives DetectionService with an open-loop Poisson arrival process (the
honest serving-load model: arrivals do NOT slow down when the service
lags, so queueing delay shows up in the tail) and reports per-request
latency percentiles and achieved throughput at each offered load.

    python tools/serving_bench.py --loads 4,8,12,16 --max-batch 16 \
        --max-delay-ms 25 --transfer yuv420 --out serving_slo.json

Each load level prints one JSON line:
  {"offered_load", "achieved", "p50_ms", "p95_ms", "p99_ms", "n", ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def natural_images(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(xx / 97.0) + 40 * np.cos(yy / 61.0)
    out = []
    for _ in range(n):
        tex = np.kron(rng.normal(0, 18, (h // 8, w // 8, 1)),
                      np.ones((8, 8, 1)))
        ctex = np.kron(rng.normal(0, 5, (h // 16, w // 16, 3)),
                       np.ones((16, 16, 1)))
        out.append(np.clip(base[..., None] + tex + ctex + [12, 0, -12],
                           0, 255).astype(np.uint8))
    return out


def run_level(service, inputs, offered_load, duration_s, seed=0):
    """Open-loop: submit at Poisson arrivals of rate `offered_load`/s for
    `duration_s`; measure submit->result latency per request."""
    rng = np.random.default_rng(seed)
    lat: list[float] = []
    lock = threading.Lock()
    futures = []

    t_start = time.monotonic()
    t_next = t_start
    i = 0
    while t_next - t_start < duration_s:
        now = time.monotonic()
        if now < t_next:
            time.sleep(t_next - now)
        t_sub = time.monotonic()
        fut = service.submit(inputs[i % len(inputs)])

        def _done(f, t0=t_sub):
            with lock:
                lat.append(time.monotonic() - t0)

        fut.add_done_callback(_done)
        futures.append(fut)
        t_next += rng.exponential(1.0 / offered_load)
        i += 1

    for f in futures:
        f.result()
    wall = time.monotonic() - t_start
    lat_ms = np.sort(np.array(lat)) * 1e3
    return {
        "offered_load": offered_load,
        "achieved": round(len(lat) / wall, 2),
        "n": len(lat),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "max_ms": round(float(lat_ms[-1]), 1),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--loads", default="4,8,12,16",
                    help="offered loads (img/s), comma-separated")
    ap.add_argument("--duration", type=float, default=20.0,
                    help="seconds per load level")
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-delay-ms", type=float, default=25.0)
    ap.add_argument("--transfer", default="yuv420",
                    choices=("rgb", "yuv420", "jpegdct"))
    ap.add_argument("--size", default="768x1024")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from tinyfaces_tpu.utils.runtime import (clean_exit,
                                          enable_compilation_cache,
                                          warm_d2h_async)

    enable_compilation_cache()
    warm_d2h_async()  # overlap the tunnel's one-time D2H init (PERF 5c)

    import io

    import jax.numpy as jnp

    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector, get_model
    from tinyfaces_tpu.serving import DetectionService

    h, w = (int(v) for v in args.size.lower().split("x"))
    images = natural_images(8, h, w)
    if args.transfer == "jpegdct":
        from PIL import Image

        inputs = []
        for im in images:
            buf = io.BytesIO()
            Image.fromarray(im).save(buf, "JPEG", quality=90, subsampling=2)
            inputs.append(buf.getvalue())
    else:
        inputs = images

    templates = load_templates()
    model, variables = get_model(num_templates=25, dtype=jnp.bfloat16)
    detector = PyramidDetector(model, variables, templates,
                               cfg=DetectorConfig(), ec=EvalConfig(),
                               transfer=args.transfer)
    service = DetectionService(detector, max_batch=args.max_batch,
                               max_delay_ms=args.max_delay_ms)

    # Warm the service's power-of-two batch ladder (the only shapes the
    # padded dispatcher produces) so measurement never hits a compile.
    n = 1
    while n <= args.max_batch:
        print(f"# warmup batch {n}", file=sys.stderr, flush=True)
        for f in [service.submit(inputs[i % len(inputs)]) for i in range(n)]:
            f.result()
        n *= 2

    rows = []
    for load in (float(v) for v in args.loads.split(",")):
        row = run_level(service, inputs, load, args.duration)
        row.update(max_batch=args.max_batch, max_delay_ms=args.max_delay_ms,
                   transfer=args.transfer)
        print(json.dumps(row), flush=True)
        rows.append(row)

    service.close()
    if args.out:
        json.dump(rows, open(args.out, "w"), indent=1)
    clean_exit()


if __name__ == "__main__":
    main()
