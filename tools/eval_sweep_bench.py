"""Eval-sweep throughput: serial vs pipelined (VERDICT round-1 item 5).

Builds a synthetic WIDER val tree of N JPEG images (mixed sizes), then
times evaluate_model.run() in three modes on the real chip:

  per-image   eval_batch=1 (the reference-like serial path)
  sync-batch  bucket batching, no async inflight, 1 decode worker
  pipelined   bucket batching + threaded decode + 3 batches in flight

Usage: python tools/eval_sweep_bench.py [--n 200] [--transfer yuv420]
"""

import argparse
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_tree(root: Path, n: int, seed: int = 0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    d = root / "WIDER_val" / "images" / "0--Bench"
    d.mkdir(parents=True, exist_ok=True)
    ann = []
    # two realistic size classes so bucketing has work to do; natural
    # spectral statistics so the jpegdct wire size is representative
    sizes = [(768, 1024), (680, 1024), (768, 1024), (576, 768)]
    for i in range(n):
        h, w = sizes[i % len(sizes)]
        yy, xx = np.mgrid[0:h, 0:w]
        base = 128 + 60 * np.sin(xx / 97.0) + 40 * np.cos(yy / 61.0)
        tex = np.kron(rng.normal(0, 18, (h // 8, w // 8, 3)),
                      np.ones((8, 8, 1)))
        img = np.clip(base[..., None] + tex, 0, 255).astype(np.uint8)
        img[100:180, 100:180] = 255
        Image.fromarray(img).save(d / f"im{i}.jpg", quality=90)
        ann += [f"0--Bench/im{i}.jpg", "1", "100 100 80 80 0 0 0 0 0 0"]
    gt = root / "val.txt"
    gt.write_text("\n".join(ann) + "\n")
    return gt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=200)
    parser.add_argument("--transfer", default="jpegdct",
                        help="wire format (jpegdct = production default, "
                             "matching evaluate_model.py)")
    parser.add_argument("--eval-batch", type=int, default=32,
                        help="device batch per bucket for the batched modes "
                             "(32 = evaluate_model's default; it reuses "
                             "bench.py's warmest program)")
    parser.add_argument("--root", default="/tmp/eval_sweep_bench")
    args = parser.parse_args()

    from tinyfaces_tpu.utils.runtime import clean_exit, enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    import evaluate_model
    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.data.wider_face import WIDERFace
    from tinyfaces_tpu.evaluation import PyramidDetector, get_model

    root = Path(args.root)
    if root.exists():
        shutil.rmtree(root)
    gt = build_tree(root, args.n)

    templates = load_templates()
    model, variables = get_model(num_templates=25, dtype=jnp.bfloat16)
    det = PyramidDetector(model, variables, templates, cfg=DetectorConfig(),
                          ec=EvalConfig(), transfer=args.transfer)
    dataset = WIDERFace(gt, templates, dataset_root=root, split="val")

    import contextlib
    import io

    def timed(name, warm_n=8, **kw):
        # warm the compile caches on a small prefix first
        class Prefix:
            def __len__(self):
                return warm_n

            def __getitem__(self, i):
                return dataset[i]

            def get_dct(self, i):
                return dataset.get_dct(i)

        with contextlib.redirect_stdout(io.StringIO()):
            evaluate_model.run(det, Prefix(), 0.03, 0.3, "val",
                               results_dir=root / "warm", **kw)
            t0 = time.time()
            evaluate_model.run(det, dataset, 0.03, 0.3, "val",
                               results_dir=root / name, **kw)
        dt = time.time() - t0
        print(f"{name}: {args.n / dt:.2f} img/s ({dt:.1f}s)", flush=True)
        return args.n / dt

    eb = args.eval_batch
    r_pipe = timed("pipelined", eval_batch=eb, workers=8, inflight=3)
    r_sync = timed("sync-batch", eval_batch=eb, workers=1, inflight=0)
    r_serial = timed("per-image", eval_batch=1)
    print(f"pipelined vs sync-batch: {r_pipe / r_sync:.2f}x; "
          f"vs per-image: {r_pipe / r_serial:.2f}x", flush=True)
    clean_exit()


if __name__ == "__main__":
    main()
