"""Model evaluation CLI — same surface as the reference evaluate_model.py:16-31.

Runs the multi-scale image-pyramid detector over the val/test split and
writes WIDER-format result files (<results_dir>/<event>/<img>.txt).
"""

import argparse

from tinyfaces_tpu.config import DetectorConfig, EvalConfig
from tinyfaces_tpu.data import get_dataloader
from tinyfaces_tpu.evaluation import PyramidDetector, get_model, write_results


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
                        help="bfloat16 inference (fp32 decode)")
    parser.add_argument("--eval-batch", type=int, default=8,
                        help="device batch per bucket (1 = per-image)")
    parser.add_argument("--host-resize", action="store_true",
                        help="PIL per-scale resize (reference resampling)")
    parser.add_argument("--transfer", default="rgb", choices=("rgb", "yuv420"),
                        help="fused-path wire format; yuv420 halves H2D bytes"
                             " (JPEG-native chroma subsampling)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard each fused batch over every local chip "
                             "(requires eval-batch divisible by chip count)")
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
        debug=False, eval_batch=8, host_resize=False, workers=8,
        inflight=3):
    """Evaluate the split with a three-stage pipeline: worker threads decode
    JPEGs (the reference's DataLoader(num_workers=8) equivalent,
    evaluate_model.py:34-44), the main thread groups images sharing a padded
    bucket shape into fixed-size device batches, and up to `inflight`
    batches ride the device queue concurrently (detect_batch_async) so host
    decode + padding + H2D overlap device compute. `host_resize` falls back
    to the per-image PIL-resample path (reference-identical resampling)."""
    from collections import defaultdict, deque
    from concurrent.futures import ThreadPoolExecutor

    from tinyfaces_tpu.evaluation import _round_up

    n = len(dataset)
    done = 0
    dets = None

    if host_resize or eval_batch <= 1:
        for i in range(n):
            image, img_path = dataset[i]
            dets = detector.detect(image, prob_thresh, nms_thresh,
                                   host_resize=host_resize)
            write_results(dets, img_path, split, results_dir)
            done += 1
            if done % 25 == 0 or done == n:
                print(f"[{done}/{n}] {img_path}: {dets.shape[0]} detections")
            if debug and i >= 4:
                break
        return dets

    groups: dict = defaultdict(list)
    pending: deque = deque()

    # HBM guard: the 2x pyramid level dominates activation memory, so cap the
    # per-bucket batch by a pixel budget (eval_batch at the 768x1024-class
    # bucket, fewer for larger originals, always >= 1). Under mesh sharding
    # the batch must stay divisible by the mesh size.
    budget_px = eval_batch * 768 * 1024
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
        n = max(1, min(eval_batch, budget_px // (bucket[0] * bucket[1])))
        return max(mesh_n, n // mesh_n * mesh_n)

    def settle(entry):
        nonlocal done, dets
        items, async_result = entry
        results = detector._fetch(async_result)
        for (im, img_path), d in zip(items, results):
            write_results(d, img_path, split, results_dir)
            dets = d
            done += 1
            if done % 25 == 0 or done == n:
                print(f"[{done}/{n}] {img_path}: {d.shape[0]} detections")

    def flush(bucket):
        items = groups.pop(bucket)
        imgs = [im for im, _ in items]
        # pad the group to the bucket's fixed batch size (stable compile
        # shapes); surplus outputs are discarded
        imgs += [imgs[-1]] * (bucket_batch(bucket) - len(imgs))
        pending.append(
            (items, detector.detect_batch_async(imgs, prob_thresh, nms_thresh))
        )
        while len(pending) > inflight:
            settle(pending.popleft())

    limit = 5 if debug else n
    # Decode ahead in worker threads (PIL JPEG decode drops the GIL) through
    # a bounded sliding window of futures — ThreadPoolExecutor.map would
    # submit the whole split at once and buffer gigabytes of decoded pixels.
    window = max(2, workers) * 3
    with ThreadPoolExecutor(max(1, workers)) as pool:
        futs: deque = deque()
        nxt = 0
        while futs or nxt < limit:
            while nxt < limit and len(futs) < window:
                futs.append(pool.submit(dataset.__getitem__, nxt))
                nxt += 1
            image, img_path = futs.popleft().result()
            bucket = (_round_up(image.shape[0]), _round_up(image.shape[1]))
            groups[bucket].append((image, img_path))
            if len(groups[bucket]) >= bucket_batch(bucket):
                flush(bucket)
        for bucket in list(groups):
            flush(bucket)
        while pending:
            settle(pending.popleft())
    return dets


def main():
    from tinyfaces_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    args = arguments()

    cfg = DetectorConfig()
    dataset, templates = get_dataloader(
        args.dataset, args, train=False, split=args.split, cfg=cfg
    )

    model, variables = get_model(
        args.checkpoint,
        num_templates=templates.shape[0],
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
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

        if args.shard == "batch" and args.eval_batch % len(jax.devices()):
            raise SystemExit(
                f"--data-parallel needs --eval-batch divisible by the "
                f"{len(jax.devices())} devices"
            )
        mesh = make_mesh()

    detector = PyramidDetector(model, variables, templates, cfg=cfg,
                               ec=EvalConfig(), transfer=args.transfer,
                               mesh=mesh, shard=args.shard)
    run(
        detector, dataset, args.prob_thresh, args.nms_thresh, args.split,
        results_dir=args.results_dir, debug=args.debug,
        eval_batch=args.eval_batch, host_resize=args.host_resize,
        workers=args.workers,
    )


if __name__ == "__main__":
    main()

    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()
