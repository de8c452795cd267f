"""Data layer: templates, WIDER Face dataset, device-side target building.

`load_templates` mirrors the reference loader (datasets/__init__.py:11-41):
use the checked-in templates.json if present, otherwise cluster the train GT
boxes with k-medoids and persist the result; either way round to 8 decimals.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from tinyfaces_tpu.config import DetectorConfig
from tinyfaces_tpu.data.wider_face import WIDERFace, parse_wider_annotations  # noqa: F401
from tinyfaces_tpu.data.targets import build_targets, normalize_images  # noqa: F401

TEMPLATE_FILE = Path(__file__).parent / "templates.json"


def load_templates(
    template_file: str | Path | None = None,
    traindata: str | Path | None = None,
    num_templates: int = 25,
) -> np.ndarray:
    """(T, 5) template matrix [x1, y1, x2, y2, natural_scale], rounded to 8
    decimals. Regenerates via clustering when the file is missing."""
    template_file = Path(template_file or TEMPLATE_FILE)

    if template_file.exists():
        templates = json.load(open(template_file))
    else:
        if traindata is None:
            raise FileNotFoundError(
                f"{template_file} missing and no traindata given to recluster"
            )
        from tinyfaces_tpu.clustering.cluster import compute_kmedoids

        dataset = WIDERFace(traindata, np.zeros((0, 5)))
        clustering = compute_kmedoids(
            dataset.get_all_bboxes(), 1, indices=num_templates,
            max_clusters=num_templates,
        )
        templates = clustering[num_templates]["medoids"].tolist()
        json.dump(templates, open(template_file, "w"))

    return np.round(np.array(templates, np.float64), decimals=8)


def get_dataloader(
    datapath: str | Path,
    args,
    num_templates: int = 25,
    template_file: str | Path | None = None,
    train: bool = True,
    split: str = "train",
    cfg: DetectorConfig | None = None,
):
    """Reference-compatible factory (datasets/__init__.py:11): returns
    (dataset, templates). Batching is via dataset.iter_batches (train) or
    per-image iteration (val/test)."""
    templates = load_templates(template_file, getattr(args, "traindata", None), num_templates)
    dataset = WIDERFace(
        datapath,
        templates,
        cfg=cfg,
        dataset_root=Path(getattr(args, "dataset_root", "") or ""),
        split=split,
        debug=getattr(args, "debug", False),
    )
    return dataset, templates
