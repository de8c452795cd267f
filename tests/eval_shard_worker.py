"""Worker for the 2-process sharded-evaluation test (test_parallel.py).

Each process: jax.distributed.initialize over loopback, build a tiny
detector, evaluate its rank::world slice of a synthetic WIDER val split
into a SHARED results_dir (per-image files are disjoint across ranks).

argv: coordinator num_processes process_id wider_root results_dir
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord, nproc, pid, wider_root, results_dir = sys.argv[1:6]
    from tinyfaces_tpu.parallel.distributed import initialize

    initialize(coordinator_address=coord, num_processes=int(nproc),
               process_id=int(pid))
    assert jax.process_count() == int(nproc)

    import evaluate_model
    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.data.wider_face import WIDERFace
    from tinyfaces_tpu.evaluation import PyramidDetector
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model

    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=(1, 1, 1))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (128, 128))
    det = PyramidDetector(
        model, {"params": params, "batch_stats": batch_stats}, templates,
        cfg=DetectorConfig(),
        ec=EvalConfig(scales=(0,), max_dets_per_scale=50, max_total_dets=50),
    )
    root = Path(wider_root)
    val = WIDERFace(root / "wider_face_split" / "val.txt", templates,
                    dataset_root=root, split="val")
    evaluate_model.run(
        det, val, prob_thresh=0.2, nms_thresh=0.3, split="val",
        results_dir=results_dir, eval_batch=2, workers=2,
        rank=int(pid), world=int(nproc),
    )
    # barrier before exit: the first rank to die takes the coordination
    # service (hosted by rank 0) with it and FATALS the slower rank
    from tinyfaces_tpu.parallel.distributed import barrier_at_exit

    barrier_at_exit("eval_sweep_done")
    print(f"EVAL_SHARD_OK pid={pid} n={len(val)}")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
