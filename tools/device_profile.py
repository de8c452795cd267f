"""Per-op device profile of the fused pyramid program (jax.profiler trace).

Implements the recipe proven in round 2 (docs/PERF.md): trace N dispatches
of the cached program on device-resident DISTINCT inputs (the transport
memoizes identical executions), parse the generated trace.json.gz, group
events by the device lanes, and rank op cost. Answers "where do the
417 ms/batch32 go" so kernel work (e.g. a Pallas layer1) is evidence-led.

Usage: python tools/device_profile.py [--batch 32] [--transfer jpegdct]
       [--iters 3] [--top 30]
"""

import argparse
import collections
import glob
import gzip
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--transfer", default="jpegdct",
                    choices=("jpegdct", "yuv420", "rgb"))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", default="",
                    help="skip execution; re-parse this trace directory")
    args = ap.parse_args()
    if args.parse_only:
        parse_trace(args.parse_only, args.iters, args.top, args.batch)
        return

    from tinyfaces_tpu.utils.runtime import clean_exit, enable_compilation_cache

    enable_compilation_cache()

    import jax

    from bench import natural_images
    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector, get_model
    import jax.numpy as jnp
    from PIL import Image

    templates = load_templates()
    model, variables = get_model(num_templates=25, dtype=jnp.bfloat16)
    det = PyramidDetector(model, variables, templates, cfg=DetectorConfig(),
                          ec=EvalConfig(), transfer=args.transfer)

    h, w = 768, 1024
    B = args.batch

    def inputs_for(seed):
        imgs = natural_images(B, h, w, seed=seed)
        if args.transfer != "jpegdct":
            return imgs
        out = []
        for im in imgs:
            buf = io.BytesIO()
            Image.fromarray(im).save(buf, "JPEG", quality=90, subsampling=2)
            out.append(buf.getvalue())
        return out

    # warmup / compile (cache-hit if bench.py ran at this batch size)
    t0 = time.time()
    det.detect_batch(inputs_for(0))
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    trace_dir = "/tmp/tinyfaces_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for i in range(args.iters):
            det.detect_batch(inputs_for(i + 1))

    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        print("no trace produced", file=sys.stderr)
        clean_exit(1)
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device lanes: pids whose process_name metadata mentions the
    # accelerator (non-host). Fall back to lanes with XLA op names.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if ("/device" in n.lower() or "tpu" in n.lower()
                    or "xla" in n.lower()) and "host" not in n.lower()}

    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        per_op[name] += dur
        total += dur

    per_iter = total / max(1, args.iters)
    print(f"\ndevice lanes: {[pid_names[p] for p in sorted(dev_pids)]}")
    print(f"total device time {total:.1f} ms over {args.iters} dispatches "
          f"= {per_iter:.1f} ms/batch{B} ({B / (per_iter / 1e3):.1f} img/s)\n")
    print(f"{'ms/iter':>9}  {'%':>5}  op")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms / args.iters:9.2f}  {100 * ms / total:5.1f}  {name[:110]}")

    clean_exit()


if __name__ == "__main__":
    main()
