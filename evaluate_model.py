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
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 inference (fp32 decode)")

    return parser.parse_args(argv)


def run(detector, dataset, prob_thresh, nms_thresh, split, results_dir=None,
        debug=False):
    n = len(dataset)
    dets = None
    for i in range(n):
        image, img_path = dataset[i]
        dets = detector.detect(image, prob_thresh, nms_thresh)
        write_results(dets, img_path, split, results_dir)
        if (i + 1) % 25 == 0 or i == n - 1:
            print(f"[{i + 1}/{n}] {img_path}: {dets.shape[0]} detections")
        if debug and i >= 4:
            break
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
    )

    detector = PyramidDetector(model, variables, templates, cfg=cfg, ec=EvalConfig())
    run(
        detector, dataset, args.prob_thresh, args.nms_thresh, args.split,
        results_dir=args.results_dir, debug=args.debug,
    )


if __name__ == "__main__":
    main()

    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()
