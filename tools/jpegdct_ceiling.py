"""Device-compute ceiling of the jpegdct fused-pyramid program.

The e2e bench (bench.py) measured 58.8 img/s steady-state with the dense
DCT wire; the *pixel-path* device ceiling is 73.4 img/s @ b32
(docs/PERF.md). This tool isolates the jpegdct program's own device time
— wire buffers pre-staged on device, so no H2D or host decode in the
timed region — to attribute the remaining gap (reconstruction compute
vs host/pipeline overheads).

Methodology (required on this backend, docs/PERF.md): one DISTINCT
device-resident input per dispatch (the remote layer memoizes identical
(executable, input) executions), and completion is observed by fetching
the packed detections output — one D2H per batch, exactly what
production _fetch pays (block_until_ready does not block).

Usage: python tools/jpegdct_ceiling.py [--batch 32] [--iters 12]
"""

import argparse
import io
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--mode", choices=["device", "upload"], default="device",
                    help="device: inputs pre-staged on device (pure compute"
                         " ceiling). upload: wires pre-packed in host RAM;"
                         " the timed loop uploads + dispatches + fetches"
                         " with depth-3 pipelining — isolates whether H2D"
                         " serializes with execution on the tunnel.")
    ap.add_argument("--transfer", choices=["jpegdct", "jpegdct4"],
                    default="jpegdct",
                    help="wire format: v3 zigzag-dense or v4 bitmap-sparse.")
    ap.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16",
                    help="model compute dtype for the precision A/B "
                         "(VERDICT r3 #4: settle bf16 vs fp32 once).")
    args = ap.parse_args()

    from tinyfaces_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    from PIL import Image

    from bench import natural_images
    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import jpegdct
    from tinyfaces_tpu.evaluation import PyramidDetector, get_model
    from tinyfaces_tpu.data import load_templates

    templates = load_templates()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, variables = get_model(num_templates=25, dtype=dtype)
    det = PyramidDetector(model, variables, templates, cfg=DetectorConfig(),
                          ec=EvalConfig(), transfer=args.transfer)

    h, w = 768, 1024
    B, iters = args.batch, args.iters

    # Distinct wire buffers per dispatch: same images, but re-seeded noise
    # per iter so no two uploaded buffers are byte-identical.
    def wire_for(seed):
        imgs = natural_images(B, h, w, seed=seed)
        dcts = []
        for im in imgs:
            buf = io.BytesIO()
            Image.fromarray(im).save(buf, "JPEG", quality=90, subsampling=2)
            dcts.append(jpegdct.parse_jpeg_dct(buf.getvalue()))
        return jpegdct.pack_dct_batch(
            dcts, h, w, wire_version=4 if args.transfer == "jpegdct4" else 3)

    h0p, w0p = h, w
    host_wires = [wire_for(i)["_wire"] for i in range(iters)]
    if args.mode == "device":
        wires = [jnp.asarray(wv).block_until_ready() for wv in host_wires]
    else:
        wires = None
    print(f"staged {iters} distinct wire buffers "
          f"({host_wires[0].nbytes / 2**20:.1f} MiB each, mode={args.mode})",
          flush=True)

    def dispatch(wire_dev):
        return det._fused_pyramid(
            det.variables, det.templates_j, {"_wire": wire_dev}, None, None,
            scales=tuple(det.ec.scales), h0p=h0p, w0p=w0p,
            prob_thresh=float(det.ec.prob_thresh),
            nms_thresh=float(det.ec.nms_thresh), transfer=args.transfer,
        )

    # warmup / compile (cache-hit if bench.py ran at this batch size)
    t0 = time.time()
    np.asarray(dispatch(jnp.asarray(host_wires[0])))
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    if args.mode == "device":
        # Enqueue all distinct pre-staged dispatches; observe each
        # completion by fetching the packed (B, K, 6) detections — the
        # same single D2H the production _fetch pays (~576 KB/batch32),
        # so "device" mode includes one mandatory fetch round trip.
        outs = [dispatch(wv) for wv in wires]
        for o in outs:
            np.asarray(o)
    else:
        # bench.py-shaped loop minus all host decode/pack: upload the
        # pre-packed wire, dispatch, fetch, depth-3 in flight.
        import collections

        q = collections.deque()
        for wv in host_wires:
            q.append(dispatch(jnp.asarray(wv)))
            if len(q) > 3:
                np.asarray(q.popleft())
        while q:
            np.asarray(q.popleft())
    dt = time.time() - t0
    per_batch = dt / iters
    label = ("device time" if args.mode == "device"
             else "upload+dispatch+fetch time")
    print(f"jpegdct fused pyramid {label}: {per_batch * 1e3:.1f} ms/"
          f"batch{B} = {B / per_batch:.1f} img/s "
          f"({iters} distinct dispatches, fetch-timed)")

    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()


if __name__ == "__main__":
    main()
