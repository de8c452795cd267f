"""Offline template clustering CLI (`make cluster`).

Reference flow (datasets/__init__.py:23-36, clustering/cluster.py): gather
all train GT boxes, k-medoids for k=25, write templates.json. The natural-
scale column (0.5/1/2) of the shipped templates comes from Hu's release;
regenerated templates get scale column 1.0 with a warning (retraining with
regenerated templates redefines the template id -> scale mapping).
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from tinyfaces_tpu.clustering.cluster import compute_kmedoids  # noqa: E402
from tinyfaces_tpu.data.wider_face import WIDERFace  # noqa: E402


def main():
    parser = argparse.ArgumentParser("Template clustering")
    parser.add_argument("traindata", help="wider_face_train_bbx_gt.txt")
    parser.add_argument("--num-templates", type=int, default=25)
    parser.add_argument("--out", default="tinyfaces_tpu/data/templates.json")
    parser.add_argument("--max-limit", type=int, default=5000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--option", default="local",
                        choices=("local", "pam", "pyclustering", "pyclust"),
                        help="k-medoids backend (reference cluster.py:39-44; "
                             "pyclustering/pyclust map to the PAM backend)")
    args = parser.parse_args()

    dataset = WIDERFace(args.traindata, np.zeros((0, 5)), split="train")
    bboxes = dataset.get_all_bboxes()
    print(f"{bboxes.shape[0]} GT boxes")

    clustering = compute_kmedoids(
        bboxes, 1, option=args.option, indices=args.num_templates,
        max_clusters=args.num_templates, max_limit=args.max_limit,
        seed=args.seed,
    )
    medoids = np.asarray(clustering[args.num_templates]["medoids"])
    print("Canonical bounding boxes computed")

    # Sort by area (large->small) and attach the natural-scale column.
    areas = (medoids[:, 2] - medoids[:, 0]) * (medoids[:, 3] - medoids[:, 1])
    medoids = medoids[np.argsort(-areas)]
    templates = np.concatenate([medoids, np.ones((medoids.shape[0], 1))], axis=1)
    print("WARNING: regenerated templates carry natural scale 1.0; "
          "the shipped templates.json uses Hu's 0.5/1/2 assignment.")

    json.dump(templates.tolist(), open(args.out, "w"), indent=1)
    print("Wrote", args.out)


if __name__ == "__main__":
    main()
