"""Dense anchor-template vs. ground-truth IoU ("dense overlap").

Capability parity with the reference's pure-Python quadruple loop
(tinyfaces/datasets/dense_overlap.py:4-75) — the data-pipeline hotspot —
re-expressed as a single broadcasted XLA computation that runs on device.

For each spatial location (y, x) of the (vsy, vsx) heatmap grid, each of the
T templates is placed centered at (ofx + x*stx, ofy + y*sty) and its IoU with
every GT box is computed using the MATLAB +1 pixel convention. Output shape
is (vsy, vsx, T, G).

The reference rounds to 14 decimals for MATLAB bit-parity; at float32 device
precision that rounding is a no-op, so we omit it (tests compare against a
float64 oracle with allclose).
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_dense_overlap(
    ofx: float,
    ofy: float,
    stx: float,
    sty: float,
    vsx: int,
    vsy: int,
    templates: jnp.ndarray,  # (T, >=4) [dx1, dy1, dx2, dy2, ...]
    gt_boxes: jnp.ndarray,  # (G, 4) [x1, y1, x2, y2]
    gt_mask: jnp.ndarray | None = None,  # (G,) bool, False rows give 0 overlap
) -> jnp.ndarray:
    """Returns (vsy, vsx, T, G) IoU tensor, float32.

    Instead of the O(H*W*T*G) scalar loop, the intersection is built from two
    rank-1 factors: the x-extent overlap (vsx, T, G) and the y-extent overlap
    (vsy, T, G), whose outer product gives the intersection area — O(H*W*T*G)
    VPU work but with tiny operands and full XLA fusion.
    """
    dx1, dy1, dx2, dy2 = (templates[:, i] for i in range(4))
    gx1, gy1, gx2, gy2 = (gt_boxes[:, i] for i in range(4))

    filter_w = dx2 - dx1 + 1.0
    filter_h = dy2 - dy1 + 1.0
    filter_area = filter_w * filter_h  # (T,)

    bbox_w = gx2 - gx1 + 1.0
    bbox_h = gy2 - gy1 + 1.0
    bbox_area = bbox_w * bbox_h  # (G,)

    cx = ofx + jnp.arange(vsx, dtype=jnp.float32) * stx  # (X,)
    cy = ofy + jnp.arange(vsy, dtype=jnp.float32) * sty  # (Y,)

    # Per-axis intersection extents, factored: (X, T, G) and (Y, T, G).
    x1 = jnp.maximum(cx[:, None, None] + dx1[None, :, None], gx1[None, None, :])
    x2 = jnp.minimum(cx[:, None, None] + dx2[None, :, None], gx2[None, None, :])
    int_w = x2 - x1 + 1.0

    y1 = jnp.maximum(cy[:, None, None] + dy1[None, :, None], gy1[None, None, :])
    y2 = jnp.minimum(cy[:, None, None] + dy2[None, :, None], gy2[None, None, :])
    int_h = y2 - y1 + 1.0

    # (Y, X, T, G) intersection; positive-extent gate matches the reference's
    # `if int_h > 0 and int_w > 0` (dense_overlap.py:62).
    int_area = int_h[:, None, :, :] * int_w[None, :, :, :]
    valid = (int_h[:, None, :, :] > 0) & (int_w[None, :, :, :] > 0)

    union = filter_area[None, None, :, None] + bbox_area[None, None, None, :] - int_area
    iou = jnp.where(valid, int_area / union, 0.0)

    if gt_mask is not None:
        iou = jnp.where(gt_mask[None, None, None, :], iou, 0.0)

    return iou.astype(jnp.float32)
