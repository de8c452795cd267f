"""Training CLI — same surface as the reference main.py:18-36 (flag names and
defaults preserved; `--resume PATH` actually works here, unlike the reference
whose store_true flag can't carry the path, SURVEY.md §2.7).

Flow (reference main.py:39-104): dataloader -> model/loss -> SGD with
per-group LRs + StepLR -> epoch loop -> periodic checkpoints. TPU-native:
one jitted SPMD train step over the "data" mesh axis.
"""

import argparse
from pathlib import Path

import jax
import numpy as np

from tinyfaces_tpu.config import DetectorConfig, TrainConfig
from tinyfaces_tpu.data import get_dataloader
from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
from tinyfaces_tpu.trainer import Trainer, load_checkpoint, save_checkpoint


def arguments(argv=None):
    parser = argparse.ArgumentParser()

    parser.add_argument("traindata")
    parser.add_argument("valdata")
    parser.add_argument("--dataset-root", default="")
    parser.add_argument("--dataset", default="WIDERFace")
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--weight-decay", default=0.0005, type=float)
    parser.add_argument("--momentum", default=0.9, type=float)
    parser.add_argument("--batch_size", default=12, type=int)
    parser.add_argument("--workers", default=8, type=int)
    parser.add_argument("--start-epoch", default=0, type=int)
    parser.add_argument("--epochs", default=50, type=int)
    parser.add_argument("--save-every", default=10, type=int)
    parser.add_argument("--resume", default="",
                        help="checkpoint path to resume from")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--pretrained-backbone", default="",
                        help="npz/pth with converted ImageNet ResNet-101 weights")
    parser.add_argument("--arch", default="resnet101",
                        choices=("resnet101", "resnet50"),
                        help="backbone (reference model.py:13 base_model knob)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 activations (fp32 params)")
    parser.add_argument("--profile-dir", default="",
                        help="capture a jax.profiler trace of epoch 0 here")
    parser.add_argument("--max-gt", default=0, type=int,
                        help="static per-crop GT bound (0 = config default "
                             "192; truncation past it is counted and warned "
                             "— data/overflow.py). Measured Pallas "
                             "assignment cost: 14.7/18.5/20.3 ms per "
                             "batch-12 at G=192/384/512 (docs/PERF.md)")
    parser.add_argument("--log-every", default=1, type=int,
                        help="console cadence; >1 unblocks device pipelining")
    parser.add_argument("--metrics-log", default="",
                        help="append structured JSONL training metrics here")
    parser.add_argument("--transfer", default="rgb",
                        choices=("rgb", "yuv420", "jpegdct"),
                        help="train-input wire format; yuv420 halves H2D "
                             "bytes (JPEG-native chroma subsampling); "
                             "jpegdct skips host pixel decode entirely — "
                             "DCT coefficients ship to the device, which "
                             "decodes AND augments (fastest on 1-core "
                             "hosts; augmentation geometry identical, "
                             "pixel filtering differs per docs/PERF.md)")
    parser.add_argument("--nan-guard", action="store_true",
                        help="drop non-finite updates on device instead of "
                             "poisoning the weights")
    parser.add_argument("--async-checkpoint", action="store_true",
                        help="write checkpoints in the background (training "
                             "continues during the save)")
    # Multi-host SPMD (reference is single-device, main.py:60-64; these
    # launch one process per host — see tinyfaces_tpu/parallel/distributed.py)
    parser.add_argument("--coordinator-address", default="",
                        help="host:port of process 0 for jax.distributed")
    parser.add_argument("--num-processes", default=0, type=int,
                        help="total train processes (0 = single-host)")
    parser.add_argument("--process-id", default=0, type=int)

    return parser.parse_args(argv)


def main():
    from tinyfaces_tpu.utils.runtime import (enable_compilation_cache,
                                          warm_d2h_async)

    enable_compilation_cache()
    warm_d2h_async()  # overlap the tunnel's one-time D2H init (PERF 5c)

    args = arguments()

    if args.num_processes > 1 or args.coordinator_address:
        # Must run before any other jax call so every process sees the
        # global device set.
        from tinyfaces_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=args.coordinator_address or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id,
        )

    num_templates = 25  # aka the number of clusters

    cfg = DetectorConfig(num_templates=num_templates)
    if args.max_gt:
        import dataclasses

        cfg = dataclasses.replace(cfg, max_gt=args.max_gt)
    tc = TrainConfig(
        lr=args.lr,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        batch_size=args.batch_size,
        epochs=args.epochs,
        start_epoch=args.start_epoch,
        save_every=args.save_every,
        workers=args.workers,
    )

    train_dataset, templates = get_dataloader(
        args.traindata, args, num_templates, cfg=cfg, train=True, split="train"
    )

    if args.debug:
        debug_visualize(train_dataset)
        return

    import jax.numpy as jnp

    from tinyfaces_tpu.models.resnet import ARCH_STAGES

    model = TinyFacesDetector(
        num_objects=1,
        num_templates=num_templates,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        stage_sizes=ARCH_STAGES[args.arch],
    )
    params, batch_stats = init_model(model, jax.random.PRNGKey(args.seed))

    if args.pretrained_backbone:
        from tinyfaces_tpu.evaluation import load_weights

        pretrained = load_weights(args.pretrained_backbone)
        params = {**params, "backbone": pretrained["params"]["backbone"]}
        batch_stats = {**batch_stats, "backbone": pretrained["batch_stats"]["backbone"]}

    weights_dir = Path("weights")
    weights_dir.mkdir(exist_ok=True)

    trainer = Trainer(model=model, cfg=cfg, tc=tc, templates=templates,
                      seed=args.seed, metrics_path=args.metrics_log or None,
                      transfer=args.transfer, nan_guard=args.nan_guard)
    steps_per_epoch = max(1, len(train_dataset) // tc.batch_size)
    state = trainer.setup(steps_per_epoch, params, batch_stats)

    start_epoch = args.start_epoch
    if args.resume:
        restored = load_checkpoint(
            args.resume,
            {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
                "step": np.zeros((), np.int32),
                "epoch": np.zeros((), np.int64),
                "batch_size": np.zeros((), np.int64),
            },
        )
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        if not start_epoch:
            start_epoch = int(restored["epoch"])

    from tinyfaces_tpu.utils.profiling import trace

    # Failure handling (SURVEY.md §5): on SIGTERM finish the current epoch
    # boundary with an emergency checkpoint instead of losing progress;
    # multi-host ranks agree on the stop via allgather (GracefulStop).
    from tinyfaces_tpu.parallel.distributed import GracefulStop

    stop = GracefulStop()

    for epoch in range(start_epoch, args.epochs):
        with trace(args.profile_dir if epoch == start_epoch else None):
            state = trainer.train_epoch(
                state, train_dataset, epoch, log_every=args.log_every
            )
        stop_now = stop.agreed()
        if (epoch + 1) % args.save_every == 0 or stop_now:
            # COLLECTIVE save: orbax's save protocol includes
            # cross-process sync barriers once jax.distributed is
            # initialized, so a rank-0-only save deadlocks the job (rank 0
            # waits in orbax's barrier, the rest in the next epoch /
            # exit barrier — caught by tests/test_parallel.py::
            # test_four_process_train_checkpoint_resume). Every rank
            # calls; orbax writes from the primary host only.
            save_checkpoint(
                state, epoch + 1, tc.batch_size,
                save_path=weights_dir,
                filename=f"checkpoint_{epoch + 1}",
                block=not args.async_checkpoint,
            )
        if stop_now:
            break

    from tinyfaces_tpu.trainer import wait_for_checkpoints

    wait_for_checkpoints()
    # Ranks finish the loop together (lockstep steps), but process 0 then
    # writes checkpoints: a faster non-zero rank must not exit first —
    # rank 0 hosts the coordination service, and conversely rank 0
    # exiting while another rank straggles FATALS it
    # (parallel/distributed.py:barrier_at_exit).
    from tinyfaces_tpu.parallel.distributed import barrier_at_exit

    barrier_at_exit("train_done")


def debug_visualize(dataset):
    """`make debug` flow (reference wider_face.py:171-183): render the first
    augmented sample's boxes + assigned heatmap positives, then exit."""
    import jax.numpy as jnp
    from PIL import Image

    from tinyfaces_tpu.data.targets import build_targets
    from tinyfaces_tpu.utils.visualize import visualize_bboxes

    item = dataset[0]
    batch = {
        "image": jnp.asarray(item["image"][None]),
        "gt_boxes": jnp.asarray(item["gt_boxes"][None]),
        "gt_valid": jnp.asarray(item["gt_valid"][None]),
        "paste_box": jnp.asarray(item["paste_box"][None]),
        "flip": jnp.asarray(np.array([item["flip"]])),
    }
    _, cls_maps, _ = build_targets(
        batch, jnp.asarray(dataset.templates, jnp.float32),
        jax.random.PRNGKey(0), dataset.cfg,
    )
    print("positive anchors:", int((np.asarray(cls_maps) == 1).sum()))
    img = Image.fromarray(item["image"])
    visualize_bboxes(img, item["gt_boxes"][item["gt_valid"]])


if __name__ == "__main__":
    main()

    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()
