"""Model evaluation CLI — same surface as the reference evaluate_model.py:16-31.

Runs the multi-scale image-pyramid detector over the val/test split and
writes WIDER-format result files (<results_dir>/<event>/<img>.txt).
"""

import argparse
import sys

from tinyfaces_tpu.config import DetectorConfig, EvalConfig
from tinyfaces_tpu.data import get_dataloader
from tinyfaces_tpu.evaluation import PyramidDetector, get_model, write_results

# HBM guard for the fused pyramid: the 2x level dominates activation
# memory, so the per-bucket device batch is capped by a pixel budget —
# eval_batch images at the 768x1024-class bucket, proportionally fewer for
# larger buckets, always >= 1.
BUDGET_PX_PER_EVAL_IMAGE = 768 * 1024


def bucket_batch_for(bucket: tuple[int, int], eval_batch: int,
                     mesh_n: int = 1) -> int:
    """Device batch size used for a padded (h0p, w0p) bucket. One fused
    program compiles per (bucket, batch) pair, so this policy also defines
    the compile ladder (tools/prewarm_cache.py precompiles it)."""
    budget_px = eval_batch * BUDGET_PX_PER_EVAL_IMAGE
    n = max(1, min(eval_batch, budget_px // (bucket[0] * bucket[1])))
    return max(mesh_n, n // mesh_n * mesh_n)


def bucket_plan(sizes, eval_batch: int, mesh_n: int = 1) -> dict:
    """{(h0p, w0p): device_batch} over an iterable of (h, w) image sizes —
    the exact set of fused-pyramid programs a sweep will compile. WIDER val
    (1024-max-dimension convention) produces ~6-9 buckets; see
    tests/test_evaluation.py::test_wider_val_bucket_ladder_is_small."""
    from tinyfaces_tpu.evaluation import _round_up

    plan = {}
    for h, w in sizes:
        b = (_round_up(h), _round_up(w))
        plan[b] = bucket_batch_for(b, eval_batch, mesh_n)
    return plan


def arguments(argv=None):
    parser = argparse.ArgumentParser("Model Evaluator")
    parser.add_argument("dataset")
    parser.add_argument("--split", default="val")
    parser.add_argument("--dataset-root")
    parser.add_argument("--checkpoint",
                        help="The path to the model checkpoint", default="")
    parser.add_argument("--prob_thresh", type=float, default=0.03)
    parser.add_argument("--nms_thresh", type=float, default=0.3)
    parser.add_argument("--workers", default=8, type=int)
    parser.add_argument("--batch_size", default=1, type=int)
    parser.add_argument("--results_dir", default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--arch", default="resnet101",
                        choices=("resnet101", "resnet50"),
                        help="backbone (reference model.py:13 base_model knob)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 inference (fp32 decode) — the "
                             "DEFAULT since round 4c (35%% faster fused "
                             "pyramid, docs/PERF.md); explicit form of "
                             "the default (mutually exclusive with --fp32)")
    parser.add_argument("--fp32", action="store_true",
                        help="full fp32 inference (reference-exact "
                             "precision; parity_run's default)")
    parser.add_argument("--eval-batch", type=int, default=32,
                        help="device batch per bucket (1 = per-image); 32 "
                             "amortizes the remote link's ~33 ms dispatch "
                             "latency best (docs/PERF.md round 4i: 62.9 vs "
                             "37.9 img/s at 16 on the val sweep)")
    parser.add_argument("--host-resize", action="store_true",
                        help="PIL per-scale resize (reference resampling, "
                             "one dispatch per scale — slow; see --resample "
                             "pil for the fused equivalent)")
    parser.add_argument("--resample", default="linear",
                        choices=("linear", "pil"),
                        help="fused-path level resampling: linear = device "
                             "scale_and_translate (fast default); pil = "
                             "PIL-bilinear-matched on the uint8 grid "
                             "(reference resampling fused in-program; "
                             "requires --transfer rgb)")
    parser.add_argument("--template-pruning", default="reference",
                        choices=("reference", "natural"),
                        help="per-scale template pruning: reference "
                             "(default) reproduces models/utils.py:15-44 "
                             "incl. its dead branch (type-B 19-37 px "
                             "templates never fire); natural enables "
                             "type-B at upsampled scales, as the branch "
                             "intends (Hu's MATLAB) — lifts tiny-face "
                             "recall, off by default for parity")
    parser.add_argument("--transfer", default="jpegdct",
                        choices=("rgb", "yuv420", "jpegdct", "jpegdct4"),
                        help="fused-path wire format. jpegdct (default — "
                             "the production wire, docs/PERF.md rounds 3/4) "
                             "ships entropy-decoded DCT coefficients "
                             "(~0.5-0.9 B/px) and decodes on the TPU; "
                             "rgb uploads the uint8 canvas (bit-exact "
                             "reference input); yuv420 halves H2D bytes; "
                             "jpegdct4 is bitmap-sparse (~2/3 the bytes, "
                             "for links <~15 MiB/s)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard each fused batch over every local chip "
                             "(requires eval-batch divisible by chip count)")
    # Multi-host sharded evaluation (process-sliced: each process detects
    # images rank::world and writes its slice of the per-image result
    # files into the shared results_dir; the files are disjoint, so the
    # merged tree appears as processes finish — score it with
    # wider_eval.py once all are done).
    parser.add_argument("--coordinator-address", default="",
                        help="host:port of process 0 for jax.distributed "
                             "(optional — slicing alone needs no "
                             "coordinator)")
    parser.add_argument("--num-processes", default=0, type=int,
                        help="total eval processes (0 = single process)")
    parser.add_argument("--process-id", default=0, type=int)
    parser.add_argument("--shard", default="batch",
                        choices=("batch", "spatial", "auto"),
                        help="mesh sharding mode with --data-parallel: batch "
                             "= one image group per chip (throughput); "
                             "spatial = GSPMD H-axis partitioning of each "
                             "image (single-image latency on huge inputs); "
                             "auto = spatial when the batch is smaller than "
                             "the mesh")

    return parser.parse_args(argv)


def run(detector, dataset, prob_thresh, nms_thresh, split, results_dir=None,
        debug=False, eval_batch=32, host_resize=False, workers=8,
        inflight=3, rank=0, world=1):
    """Evaluate the split with a three-stage pipeline: worker threads decode
    JPEGs (the reference's DataLoader(num_workers=8) equivalent,
    evaluate_model.py:34-44), the main thread groups images sharing a padded
    bucket shape into fixed-size device batches, and up to `inflight`
    batches ride the device queue concurrently (detect_batch_async) so host
    decode + padding + H2D overlap device compute. `host_resize` falls back
    to the per-image PIL-resample path (reference-identical resampling).

    `rank`/`world`: multi-process sharding — this process detects images
    `rank::world` only; per-image result files are disjoint across
    processes, so all ranks may share one results_dir."""
    import time
    from collections import defaultdict, deque
    from concurrent.futures import ThreadPoolExecutor

    from tinyfaces_tpu.evaluation import _round_up

    indices = list(range(len(dataset)))[rank::world]
    n = len(indices)
    done = 0
    dets = None
    run.last_phases = None  # set by the batched path's summary below
    # Phase attribution (VERDICT r4 #3: the e2e artifact recorded 0.93
    # img/s with no way to tell compile from dispatch from writer time).
    # Thread-worker phases accumulate under the GIL; the summary prints
    # on stderr at the end of every sweep.
    ph = {"decode_wait": 0.0, "pack": 0.0, "dispatch": 0.0,
          "result_wait": 0.0, "fetch_d2h": 0.0, "write": 0.0,
          "fetches": 0, "first_fetch": 0.0, "t_first_settled": 0.0,
          "done_at_first": 0}
    t_sweep = time.perf_counter()

    jpegdct = getattr(detector, "transfer", "rgb").startswith("jpegdct")
    if jpegdct and host_resize:
        raise ValueError("--host-resize needs decoded pixels; use "
                         "--transfer rgb with it")
    # jpegdct: worker threads entropy-decode only (ctypes drops the GIL);
    # pixels never exist on the host.
    fetch = dataset.get_dct if jpegdct else dataset.__getitem__

    def dims(item):
        if not jpegdct:
            return item.shape[:2]
        if isinstance(item, (bytes, bytearray, memoryview)):
            from tinyfaces_tpu.data.jpegdct import jpeg_dims

            return jpeg_dims(bytes(item))  # get_dct guaranteed parseable
        return (item.h, item.w)

    if host_resize or eval_batch <= 1:
        for i in indices:
            image, img_path = fetch(i)
            if host_resize:
                dets = detector.detect(image, prob_thresh, nms_thresh,
                                       host_resize=True)
            else:
                dets = detector.detect_batch([image], prob_thresh,
                                             nms_thresh)[0]
            write_results(dets, img_path, split, results_dir)
            done += 1
            if done % 25 == 0 or done == n:
                print(f"[{done}/{n}] {img_path}: {dets.shape[0]} detections")
            if debug and done >= 5:
                break
        return dets

    groups: dict = defaultdict(list)
    pending: deque = deque()

    # Batch-axis divisibility only binds under batch sharding; pure spatial
    # sharding splits H instead, so any batch size (incl. 1) is valid.
    # ("auto" keeps the divisible batches so full buckets ride the batch
    # axis; a smaller-than-mesh tail batch falls back to spatial.)
    mesh_n = (
        detector.mesh.size
        if detector.mesh is not None and getattr(detector, "shard", "batch") != "spatial"
        else 1
    )

    def bucket_batch(bucket) -> int:
        return bucket_batch_for(bucket, eval_batch, mesh_n)

    def settle(entry):
        nonlocal done, dets
        items, submitted = entry
        t0 = time.perf_counter()
        async_out = submitted.result()
        t1 = time.perf_counter()
        results = detector._fetch(async_out)
        t2 = time.perf_counter()
        ph["result_wait"] += t1 - t0
        ph["fetch_d2h"] += t2 - t1
        for (im, img_path), d in zip(items, results):
            write_results(d, img_path, split, results_dir)
            dets = d
            done += 1
            if done % 25 == 0 or done == n:
                print(f"[{done}/{n}] {img_path}: {d.shape[0]} detections")
        ph["write"] += time.perf_counter() - t2
        # First-fetch attribution: the tunnel pays a size-independent,
        # once-per-process init (measured 181-470 s, docs/PERF.md round
        # 5c) on the process's FIRST D2H; warm_d2h_async overlaps it with
        # startup, but when the sweep's first fetch still absorbs the
        # remainder, the steady-state rate must not be polluted by it.
        ph["fetches"] += 1
        if ph["fetches"] == 1:
            ph["first_fetch"] = t2 - t1
            ph["t_first_settled"] = time.perf_counter() - t_sweep
            ph["done_at_first"] = done

    # Host prep splits into two single-worker stages: pack (CPU-bound
    # C++ entropy-decode + pack) and upload+dispatch (network-bound). A
    # single fused worker serializes them per batch, leaving the core
    # idle during every network wait on a 1-core host (bench.py measured
    # the same structure on the tunnel); pack_pool lets the next group's
    # decode run under the current group's upload.
    pack_pool = ThreadPoolExecutor(1)
    submit_pool = ThreadPoolExecutor(1)  # one worker: keeps dispatch order

    def timed_pack(imgs):
        t0 = time.perf_counter()
        out = detector.pack_inputs(imgs)
        ph["pack"] += time.perf_counter() - t0
        return out

    def timed_dispatch(p):
        packed = p.result()
        t0 = time.perf_counter()
        out = detector.detect_batch_async(packed, prob_thresh, nms_thresh)
        ph["dispatch"] += time.perf_counter() - t0
        return out

    def flush(bucket):
        items = groups.pop(bucket)
        imgs = [im for im, _ in items]
        # pad the group to the bucket's fixed batch size (stable compile
        # shapes); surplus outputs are discarded
        imgs += [imgs[-1]] * (bucket_batch(bucket) - len(imgs))
        packed = pack_pool.submit(timed_pack, imgs)
        pending.append(
            (items,
             submit_pool.submit(timed_dispatch, packed))
        )
        while len(pending) > inflight:
            settle(pending.popleft())

    limit = min(5, n) if debug else n
    # Decode ahead in worker threads (PIL JPEG decode drops the GIL) through
    # a bounded sliding window of futures — ThreadPoolExecutor.map would
    # submit the whole split at once and buffer gigabytes of decoded pixels.
    window = max(2, workers) * 3
    with ThreadPoolExecutor(max(1, workers)) as pool:
        futs: deque = deque()
        nxt = 0
        while futs or nxt < limit:
            while nxt < limit and len(futs) < window:
                futs.append(pool.submit(fetch, indices[nxt]))
                nxt += 1
            t0 = time.perf_counter()
            image, img_path = futs.popleft().result()
            ph["decode_wait"] += time.perf_counter() - t0
            h, w = dims(image)
            bucket = (_round_up(h), _round_up(w))
            groups[bucket].append((image, img_path))
            if len(groups[bucket]) >= bucket_batch(bucket):
                flush(bucket)
        for bucket in list(groups):
            flush(bucket)
        while pending:
            settle(pending.popleft())
    pack_pool.shutdown(wait=True)
    submit_pool.shutdown(wait=True)
    wall = time.perf_counter() - t_sweep
    # Steady-state rate: everything after the first batch settles. The
    # first settle absorbs whatever remains of the once-per-process D2H
    # init (plus any cold compile) — real throughput is the rest.
    steady_n = done - ph["done_at_first"]
    steady_wall = wall - ph["t_first_settled"]
    steady = steady_n / steady_wall if steady_n > 0 and steady_wall > 1e-3 else None
    run.last_phases = {**ph, "wall": wall, "done": done,
                       "images_per_sec": done / wall if wall > 0 else None,
                       "images_per_sec_steady": steady}
    print(
        f"# sweep phases (wall {wall:.1f}s, {done} imgs, "
        f"{done / wall:.1f} img/s"
        + (f", steady-state {steady:.1f} img/s after the first settle"
           if steady is not None else "")
        + f"): main-thread decode_wait "
        f"{ph['decode_wait']:.1f}s, result_wait {ph['result_wait']:.1f}s "
        f"(compile+compute+D2H not overlapped), fetch_d2h "
        f"{ph['fetch_d2h']:.1f}s (first fetch {ph['first_fetch']:.1f}s — "
        f"absorbs the once-per-process D2H init, PERF 5c), write "
        f"{ph['write']:.1f}s; worker-thread "
        f"pack {ph['pack']:.1f}s, dispatch {ph['dispatch']:.1f}s",
        file=sys.stderr,
    )
    return dets


def main():
    from tinyfaces_tpu.utils.runtime import (enable_compilation_cache,
                                          warm_d2h_async)

    enable_compilation_cache()
    warm_d2h_async()  # overlap the tunnel's one-time D2H init (PERF 5c)

    import jax.numpy as jnp

    args = arguments()

    # Precision resolution (advisor r4): the default silently moved to
    # bf16 in round 4c — surface it once so pre-round-4 invocations know
    # their numbers changed, and reject the contradictory flag pair.
    if args.bf16 and args.fp32:
        raise SystemExit("--bf16 and --fp32 are mutually exclusive")
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    if not (args.fp32 or args.bf16):
        print("# precision: bf16 (default since round 4c; pass --fp32 for "
              "reference-exact precision)", file=sys.stderr)

    world = max(1, args.num_processes)
    if args.coordinator_address:
        # Optional: some multi-host runtimes (TPU pods) require the global
        # runtime to be initialized even for process-local work. Must run
        # before any other jax call (same as main.py:81-90).
        from tinyfaces_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes or None,
            process_id=args.process_id,
        )

    cfg = DetectorConfig()
    dataset, templates = get_dataloader(
        args.dataset, args, train=False, split=args.split, cfg=cfg
    )

    model, variables = get_model(
        args.checkpoint,
        num_templates=templates.shape[0],
        dtype=dtype,
        arch=args.arch,
    )

    mesh = None
    if args.shard != "batch" and not args.data_parallel:
        raise SystemExit(
            f"--shard {args.shard} requires --data-parallel (without a "
            f"device mesh there is nothing to shard over)"
        )
    if args.data_parallel:
        import jax

        from tinyfaces_tpu.parallel.mesh import make_mesh

        # Process-sliced eval keeps device work process-local: each rank
        # meshes over its OWN chips (unlike training's global mesh).
        devices = jax.local_devices() if world > 1 else jax.devices()
        if args.shard == "batch" and args.eval_batch % len(devices):
            raise SystemExit(
                f"--data-parallel needs --eval-batch divisible by the "
                f"{len(devices)} devices"
            )
        mesh = make_mesh(devices)

    detector = PyramidDetector(model, variables, templates, cfg=cfg,
                               ec=EvalConfig(
                                   resample=args.resample,
                                   template_pruning=args.template_pruning),
                               transfer=args.transfer,
                               mesh=mesh, shard=args.shard)
    run(
        detector, dataset, args.prob_thresh, args.nms_thresh, args.split,
        results_dir=args.results_dir, debug=args.debug,
        eval_batch=args.eval_batch, host_resize=args.host_resize,
        workers=args.workers, rank=args.process_id, world=world,
    )
    if args.coordinator_address:
        # the first rank to exit kills the coordination service under
        # every other rank (parallel/distributed.py:barrier_at_exit)
        from tinyfaces_tpu.parallel.distributed import barrier_at_exit

        barrier_at_exit("eval_sweep_done")


if __name__ == "__main__":
    main()

    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()
