"""Box algebra primitives (pure jnp, jittable, CPU/TPU identical).

Capability parity with the reference's NumPy metrics
(tinyfaces/metrics.py:8-74), re-expressed as vectorized XLA ops.
Two pixel-arithmetic conventions coexist in the reference and are kept
explicit here:

* "MATLAB" boxes: width = x2 - x1 + 1 (used by rect_dist, dense overlap,
  template geometry).
* "continuous" boxes: width = x2 - x1 (used by torchvision-style NMS and
  jaccard_index).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area_plus1(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area with the MATLAB +1 convention. boxes: (..., 4) as x1,y1,x2,y2."""
    return (boxes[..., 2] - boxes[..., 0] + 1.0) * (boxes[..., 3] - boxes[..., 1] + 1.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Continuous-coordinate area. boxes: (..., 4)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def rect_dist(i: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """1 - IoU with +1 pixel arithmetic, elementwise over matched box rows.

    Parity with reference tinyfaces/metrics.py:44-74 (including the
    "intersection counts only if x2 > x1 and y2 > y1" gate and the clamp of
    the result into [0, 1]).
    """
    i = jnp.atleast_2d(i)
    j = jnp.atleast_2d(j)

    ai = box_area_plus1(i)
    aj = box_area_plus1(j)

    x1 = jnp.maximum(i[..., 0], j[..., 0])
    y1 = jnp.maximum(i[..., 1], j[..., 1])
    x2 = jnp.minimum(i[..., 2], j[..., 2])
    y2 = jnp.minimum(i[..., 3], j[..., 3])

    valid = jnp.logical_and(x2 > x1, y2 > y1)
    aij = (x2 - x1 + 1.0) * (y2 - y1 + 1.0) * valid

    denom = ai + aj - aij
    iou = jnp.where(denom != 0, aij / denom, 0.0)
    iou = jnp.where(jnp.isfinite(iou), iou, 0.0)

    return jnp.clip(1.0 - iou, 0.0, 1.0)


def jaccard_index(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Scalar IoU in continuous coordinates (reference metrics.py:8-41).

    Note: like the reference, the intersection is *not* clamped at zero —
    disjoint boxes can produce a negative "intersection"; only union <= 0
    yields 0. Kept for clustering parity.
    """
    area_a = (box_a[2] - box_a[0]) * (box_a[3] - box_a[1])
    area_b = (box_b[2] - box_b[0]) * (box_b[3] - box_b[1])

    xa = jnp.maximum(box_a[0], box_b[0])
    ya = jnp.maximum(box_a[1], box_b[1])
    xb = jnp.minimum(box_a[2], box_b[2])
    yb = jnp.minimum(box_a[3], box_b[3])

    intersection = (xb - xa) * (yb - ya)
    union = area_a + area_b - intersection
    return jnp.where(union <= 0, 0.0, intersection / union)


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) IoU matrix in continuous coordinates (torchvision NMS convention).

    Intersection clamped at 0; zero-union pairs give 0.
    """
    x1 = jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    y1 = jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    x2 = jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    y2 = jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])

    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = box_area(boxes_a)[:, None] + box_area(boxes_b)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def pairwise_rect_dist(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, N) 1-IoU distance matrix with +1 arithmetic, for k-medoids clustering.

    Vectorized replacement for the reference's O(N^2) Python loop
    (tinyfaces/clustering/cluster.py:28-36).
    """
    n = boxes.shape[0]
    a = jnp.broadcast_to(boxes[:, None, :], (n, n, 4)).reshape(-1, 4)
    b = jnp.broadcast_to(boxes[None, :, :], (n, n, 4)).reshape(-1, 4)
    return rect_dist(a, b).reshape(n, n)
