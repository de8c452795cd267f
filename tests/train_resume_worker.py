"""Worker for the 4-process train -> checkpoint -> resume test
(test_parallel.py::test_four_process_train_checkpoint_resume).

Each process owns 2 virtual CPU devices (8 global). All ranks build the
REAL detector/optimizer/train-step stack (trainer.py), replicate the state
over the global mesh, and feed rank-local slices of deterministic global
batches — exactly the multi-host flow main.py drives.

Phases (argv[5]):
  full  — run 4 steps straight through; print the params+opt_state digest.
  part1 — run 2 steps; rank 0 saves an orbax checkpoint (the real
          save_checkpoint); all ranks exit through the barrier.
  part2 — every rank restores the checkpoint (load_checkpoint), re-replicates
          over the mesh, runs steps 2..3, prints the digest. The parent
          asserts all four part2 digests are bitwise-equal to each other AND
          to the four `full` digests: the checkpoint seam is invisible.

argv: coordinator num_processes process_id workdir phase
"""

import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

GLOBAL_BATCH = 8
TOTAL_STEPS = 4
CKPT_STEP = 2  # part1 runs [0, CKPT_STEP), part2 runs [CKPT_STEP, TOTAL)


def make_global_batch(step: int, cfg):
    """Deterministic global batch, a pure function of the step index —
    every phase/rank regenerates identical data."""
    rng = np.random.default_rng(100 + step)
    b = GLOBAL_BATCH
    return {
        "image": rng.integers(0, 255, (b, *cfg.input_size, 3), dtype=np.uint8),
        "gt_boxes": np.tile(
            np.array([[10.0, 10.0, 40.0, 44.0]], np.float32), (b, cfg.max_gt, 1)
        ),
        "gt_valid": np.tile(np.arange(cfg.max_gt) < 1, (b, 1)),
        "paste_box": np.tile(
            np.array([0, 0, *cfg.input_size], np.float32), (b, 1)
        ),
        "flip": np.zeros(b, bool),
    }


def digest(state) -> str:
    """Order-stable bitwise digest of params + opt_state + batch_stats."""
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(
        {"p": jax.device_get(state.params),
         "o": jax.device_get(state.opt_state),
         "b": jax.device_get(state.batch_stats),
         "s": jax.device_get(state.step)}
    ):
        h.update(np.ascontiguousarray(leaf).tobytes())
    return h.hexdigest()


def main():
    coord, nproc, pid, workdir, phase = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), Path(sys.argv[4]),
        sys.argv[5],
    )
    from tinyfaces_tpu.parallel.distributed import (
        barrier_at_exit,
        global_mesh,
        host_local_batch,
        initialize,
        process_batch_slice,
    )

    initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    from tinyfaces_tpu.config import DetectorConfig, TrainConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
    from tinyfaces_tpu.parallel.mesh import replicate_tree
    from tinyfaces_tpu.trainer import (
        create_train_state,
        load_checkpoint,
        make_optimizer,
        make_train_step,
        save_checkpoint,
    )

    cfg = DetectorConfig(input_size=(64, 64), heatmap_size=(8, 8), max_gt=4)
    tc = TrainConfig(batch_size=GLOBAL_BATCH)
    templates = load_templates()
    mesh = global_mesh()

    model = TinyFacesDetector(stage_sizes=(1, 1, 1))
    params, batch_stats = init_model(
        model, jax.random.PRNGKey(0), input_size=cfg.input_size
    )
    tx = make_optimizer(tc, steps_per_epoch=CKPT_STEP)
    state = create_train_state(model, params, batch_stats, tx)

    first, last = 0, TOTAL_STEPS
    if phase == "part1":
        last = CKPT_STEP
    elif phase == "part2":
        restored = load_checkpoint(
            workdir / "ckpt",
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
        first = CKPT_STEP

    state = replicate_tree(state, mesh)
    step_fn = make_train_step(model, tx, cfg, templates)
    sl = process_batch_slice(GLOBAL_BATCH)
    for step in range(first, last):
        gb = make_global_batch(step, cfg)
        local = {k: v[sl] for k, v in gb.items()}
        batch = host_local_batch(local, mesh)
        # key folded with state.step inside the step body -> phase-invariant
        state, lb = step_fn(state, batch, jax.random.PRNGKey(7))
    jax.block_until_ready(state.params)
    assert np.isfinite(float(lb.total)), float(lb.total)

    if phase == "part1":
        # COLLECTIVE save: with jax.distributed initialized, orbax's save
        # protocol includes cross-process sync barriers — a rank-0-only
        # save deadlocks against the other ranks' exit barrier (found by
        # this very test, r5). Every rank calls save; orbax writes from
        # the primary host only.
        save_checkpoint(state, epoch=1, batch_size=GLOBAL_BATCH,
                        save_path=workdir, filename="ckpt")
        print(f"SAVED pid={pid}", flush=True)
    else:
        print(f"DIGEST pid={pid} phase={phase} {digest(state)}", flush=True)
    sys.stdout.flush()
    barrier_at_exit(f"train_resume_{phase}")
    os._exit(0)


if __name__ == "__main__":
    main()
