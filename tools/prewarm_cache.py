"""Prewarm the persistent XLA compilation cache on a fresh VM.

Remote-attached TPUs compile through a tunnel: the fused batch-16 pyramid
alone takes 400-900 s cold, the train step ~400 s (docs/PERF.md). The
on-disk cache (~/.cache/tinyfaces_tpu_xla) makes reruns ~20 s, but it
starts EMPTY on a fresh session VM — the first production run (or the
benchmark harness) then spends its whole budget compiling.

This tool compiles the standard program set once, ahead of time:

  * fused pyramid at each `--batch` size (default 32 = bench.py's default,
    plus 1 = the single-image latency path), 768x1024 canvas, yuv420
    and/or rgb wire formats — add `--batch 16` if you serve with
    DetectionService's default max_batch=16;
  * the jitted train step, batch 12, 500x500, yuv420 and/or rgb input.

Run it in the background right after the VM boots:

    nohup python tools/prewarm_cache.py > /tmp/prewarm.log 2>&1 &

Extra eval bucket shapes (one compile each) can be added with
`--bucket HxW` (repeatable), matching the shapes evaluate_model's
bucketing produces for your dataset.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(f"[prewarm +{time.time() - T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


# The standard WIDER-val compile ladder, derived from the dataset's
# 1024-max-dimension convention: landscape heights bucket to x128
# multiples against width 1024, plus the common portrait shapes. A full
# val sweep compiles one fused program per (bucket, bucket_batch) pair —
# this set covers it (~6 programs; tests/test_evaluation.py pins the
# count for a WIDER-like size distribution).
VAL_LADDER = [(768, 1024), (640, 1024), (512, 1024), (896, 1024),
              (1024, 1024), (1024, 768), (1024, 896)]


def warm_inference(transfer: str, buckets: list[tuple[int, int]],
                   batches: list[int],
                   ladder_eval_batch: int = 0,
                   dtype: str = "bf16", resample: str = "linear") -> None:
    import jax.numpy as jnp
    import numpy as np

    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector, get_model

    templates = load_templates()
    model, variables = get_model(
        num_templates=25,
        dtype=jnp.float32 if dtype == "fp32" else jnp.bfloat16)
    det = PyramidDetector(model, variables, templates, cfg=DetectorConfig(),
                          ec=EvalConfig(resample=resample), transfer=transfer)
    rng = np.random.default_rng(0)

    def make(h, w, n):
        return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                for _ in range(n)]

    def run(imgs, b, h, w):
        if b == 1:
            det.detect(imgs[0])
        else:
            det.detect_batch(imgs[:b])
        log(f"fused pyramid batch-{b} {h}x{w} "
            f"({transfer}, {dtype}, {resample}) compiled")

    for h, w in buckets:
        imgs = make(h, w, max(batches))
        for b in batches:
            run(imgs, b, h, w)

    if ladder_eval_batch:
        from evaluate_model import bucket_batch_for

        for h, w in VAL_LADDER:
            b = bucket_batch_for((h, w), ladder_eval_batch)
            run(make(h, w, b), b, h, w)


def warm_train(transfer: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinyfaces_tpu.config import DetectorConfig, TrainConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
    from tinyfaces_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from tinyfaces_tpu.trainer import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = DetectorConfig()
    tc = TrainConfig(batch_size=12)
    templates = load_templates()
    model = TinyFacesDetector(dtype=jnp.float32)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0))
    tx = make_optimizer(tc, steps_per_epoch=1000)
    state = replicate_tree(
        create_train_state(model, params, batch_stats, tx), make_mesh())
    step_fn = make_train_step(model, tx, cfg, templates)

    rng = np.random.default_rng(0)
    b = tc.batch_size
    batch = {
        "image": rng.integers(0, 255, (b, 500, 500, 3), dtype=np.uint8),
        "gt_boxes": np.tile(
            np.array([[20.0, 20.0, 80.0, 90.0]], np.float32), (b, cfg.max_gt, 1)),
        "gt_valid": np.zeros((b, cfg.max_gt), bool),
        "paste_box": np.tile(np.array([0, 0, 500, 500], np.float32), (b, 1)),
        "flip": np.zeros(b, bool),
    }
    batch["gt_valid"][:, :2] = True
    if transfer == "yuv420":
        from tinyfaces_tpu.data.targets import rgb_to_yuv420

        y, u, v = rgb_to_yuv420(batch.pop("image"))
        batch.update(image_y=y, image_u=u, image_v=v)
    elif transfer in ("jpegdct", "jpegdct4"):
        # DCT train wire (main.py --transfer jpegdct): device-side decode +
        # augmentation fused into the step — a different HLO than the
        # pixel wires.
        import io

        from PIL import Image

        from tinyfaces_tpu.data.dct_train import decode_dct, train_item_dct

        buf = io.BytesIO()
        Image.fromarray(batch.pop("image")[0]).save(
            buf, format="jpeg", quality=88)
        dct = decode_dct(buf.getvalue())
        items = [train_item_dct(
            dct, np.array([[20.0, 20.0, 80.0, 90.0]], np.float32), cfg,
            np.random.default_rng(i)) for i in range(b)]
        batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
    state, lb = step_fn(state, shard_batch(batch, make_mesh()),
                        jax.random.PRNGKey(1))
    jax.block_until_ready(lb.total)
    log(f"train step batch-12 500x500 ({transfer}) compiled "
        f"(loss={float(lb.total):.2f})")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transfer",
                    choices=("both", "yuv420", "rgb", "jpegdct",
                             "jpegdct4"),
                    default="yuv420",
                    help="wire formats to warm (default: yuv420; 'both' = "
                         "yuv420 + rgb)")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--bucket", action="append", default=[],
                    metavar="HxW",
                    help="extra eval canvas bucket, e.g. --bucket 512x672 "
                         "(repeatable; 768x1024 is always included)")
    ap.add_argument("--batch", action="append", type=int, default=[],
                    metavar="B",
                    help="extra fused-pyramid batch size (repeatable; "
                         "32 and 1 are always included)")
    ap.add_argument("--val-ladder", type=int, nargs="?", const=32, default=0,
                    metavar="EVAL_BATCH",
                    help="also compile the standard WIDER-val bucket ladder "
                         "at each bucket's device batch for this "
                         "--eval-batch (default 32 when given bare, matching "
                         "evaluate_model's default) — a full val sweep then "
                         "hits only warm programs")
    ap.add_argument("--parity-ladder", action="store_true",
                    help="also compile the reference-exact parity "
                         "configuration (fp32 + rgb wire + in-program PIL "
                         "resampling — parity_run's defaults) over the "
                         "same buckets/ladder, so a real-data mAP parity "
                         "run hits only warm programs (VERDICT r4 #7)")
    args = ap.parse_args()

    from tinyfaces_tpu.utils.runtime import clean_exit, enable_compilation_cache

    enable_compilation_cache()

    buckets = [(768, 1024)]
    for s in args.bucket:
        h, w = s.lower().split("x")
        if (int(h), int(w)) not in buckets:
            buckets.append((int(h), int(w)))

    batches = sorted({32, 1, *args.batch}, reverse=True)

    transfers = ("yuv420", "rgb") if args.transfer == "both" else (args.transfer,)
    if not args.skip_eval:
        for t in transfers:
            warm_inference(t, buckets, batches,
                           ladder_eval_batch=args.val_ladder)
        if args.parity_ladder:
            warm_inference("rgb", buckets, batches,
                           ladder_eval_batch=args.val_ladder,
                           dtype="fp32", resample="pil")
    if not args.skip_train:
        for t in transfers:
            warm_train(t)
    log("cache warm")
    clean_exit()


if __name__ == "__main__":
    main()
