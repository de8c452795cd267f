"""Offline template generation: k-medoids over GT box shapes.

Capability parity with tinyfaces/clustering/ (cluster.py:14-130,
k_medoids.py:6-69): center all train GT boxes to (-w/2, -h/2, w/2, h/2),
build a 1-IoU distance matrix, run k-medoids for k=25, and emit the medoid
boxes as the canonical templates.

Differences from the reference, by design:
  * the O(N^2) pairwise-IoU Python loop (cluster.py:28-36) is one vectorized
    NumPy broadcast — seconds instead of hours at N=5000;
  * the third-party pyclustering/pyclust backends are replaced by a local
    Voronoi-iteration k-medoids (same algorithm family as the reference's
    'local' option) — no native C++ dependency needed at this scale;
  * the distance-matrix joblib cache is a plain .npy file.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def centralize_bbox(bboxes: np.ndarray) -> np.ndarray:
    """(N, 4) corner boxes -> origin-centered boxes (cluster.py:14-25).

    Uses the +1 size convention: a box spanning [x1, x2] has w = x2-x1+1 and
    centers to (-(w-1)/2, ..., (w-1)/2).
    """
    hs = bboxes[:, 3] - bboxes[:, 1] + 1
    ws = bboxes[:, 2] - bboxes[:, 0] + 1
    return np.stack(
        [-(ws - 1) / 2, -(hs - 1) / 2, (ws - 1) / 2, (hs - 1) / 2], axis=1
    )


def compute_distances(bboxes: np.ndarray) -> np.ndarray:
    """(N, N) pairwise 1-IoU distance matrix, fully vectorized.

    IoU in the continuous convention of the reference's jaccard_index
    (metrics.py:8-41); all centered boxes contain the origin so every pair
    overlaps and union > 0.
    """
    x1 = np.maximum(bboxes[:, None, 0], bboxes[None, :, 0])
    y1 = np.maximum(bboxes[:, None, 1], bboxes[None, :, 1])
    x2 = np.minimum(bboxes[:, None, 2], bboxes[None, :, 2])
    y2 = np.minimum(bboxes[:, None, 3], bboxes[None, :, 3])
    inter = (x2 - x1) * (y2 - y1)
    areas = (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1])
    union = areas[:, None] + areas[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return 1.0 - iou


def k_medoids(distances: np.ndarray, k: int, rng: np.random.Generator,
              max_iter: int = 300):
    """Voronoi-iteration k-medoids on a precomputed distance matrix.

    Returns (medoid_indices (k,), assignment (N,)).
    """
    n = distances.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds the {n} available boxes")
    medoids = rng.choice(n, size=k, replace=False)

    for _ in range(max_iter):
        assign = np.argmin(distances[medoids, :], axis=0)  # (N,)
        new_medoids = medoids.copy()
        for c in range(k):
            members = np.where(assign == c)[0]
            if members.size == 0:
                continue
            within = distances[np.ix_(members, members)]
            new_medoids[c] = members[int(np.argmin(within.sum(axis=1)))]
        if np.array_equal(np.sort(new_medoids), np.sort(medoids)):
            break
        medoids = new_medoids

    assign = np.argmin(distances[medoids, :], axis=0)
    return medoids, assign


def compute_kmedoids(
    bboxes: np.ndarray,
    cls: int,
    option: str = "local",
    indices: int = 15,
    max_clusters: int = 35,
    max_limit: int = 5000,
    cache_dir: Optional[str | Path] = None,
    seed: int = 0,
):
    """Cluster GT box shapes for k in [indices, max_clusters].

    Returns a list where entry k (appended in order) is
    {"n_clusters": k, "medoids": (k, 4) array, "class": cls}, preceded by
    `indices` empty placeholder dicts — the reference's exact return layout
    (cluster.py:46, :86-91), so callers index `clustering[num_templates]`.
    """
    rng = np.random.default_rng(seed)
    clustering: list[dict] = [{} for _ in range(indices)]

    boxes = centralize_bbox(np.asarray(bboxes, np.float64))

    if boxes.shape[0] > max_limit:
        sub = rng.choice(boxes.shape[0], size=max_limit, replace=False)
        boxes = boxes[sub]

    cache = Path(cache_dir) / f"distances_{cls}.npy" if cache_dir else None
    if cache is not None and cache.exists():
        dist = np.load(cache)
    else:
        dist = compute_distances(boxes)
        if cache is not None:
            np.save(cache, dist)

    for k in range(indices, max_clusters + 1):
        medoid_idx, _ = k_medoids(dist, k, rng)
        clustering.append(
            {"n_clusters": k, "medoids": boxes[medoid_idx], "class": cls}
        )

    return clustering
