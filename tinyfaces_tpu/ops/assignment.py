"""On-device ground-truth assignment: dense IoU -> class/regression heatmaps.

Capability parity with the reference's DataProcessor.get_padding /
get_regression / get_heatmaps (tinyfaces/datasets/processor.py:114-277),
which run as pure-Python NumPy loops inside DataLoader worker processes.
Here the whole assignment is one jitted, statically-shaped XLA computation
(vmap-able over the batch), fed with padded GT boxes + validity masks.

Label alphabet (processor.py:249-274): -1 negative, 0 ignore, +1 positive.
Assignment rules, in reference order:
  1. per-GT best anchor (argmax over all H*W*T locations of the *perturbed*
     IoU) is forced positive if its IoU > neg_thresh;
  2. anchors with best-over-GT IoU >= pos_thresh are positive;
  3. anchors with best IoU in [neg_thresh, pos_thresh) become ignore (via
     elementwise max with a 0/-1 "gray" map);
  4. anchors whose template crosses the pasted-crop border and that are not
     negative become ignore, and their tx regression block is zeroed
     (reference quirk: *only* the first `nt` of the 4*nt regression channels
     are zeroed, processor.py:272-274 — reproduced for parity).

The reference perturbs the IoU by +1e-6*U(0,1) to break argmax ties
(processor.py:193-195); we reproduce that with an explicit jax.random key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinyfaces_tpu.ops.dense_overlap import compute_dense_overlap


def compute_pad_mask(
    paste_box: jnp.ndarray,  # (4,) [x1, y1, x2, y2] of the pasted crop
    templates: jnp.ndarray,  # (T, >=4)
    ofx: float,
    ofy: float,
    stx: float,
    sty: float,
    vsx: int,
    vsy: int,
    flip: jnp.ndarray | bool = False,
) -> jnp.ndarray:
    """(vsy, vsx, T) bool mask of anchors that cross the pasted-crop border.

    Parity with DataProcessor.get_padding (processor.py:114-150) including
    the MATLAB +1 on the lower bounds, plus the horizontal-flip mirroring
    applied by the dataset after padding (wider_face.py:165).
    """
    cx = ofx + jnp.arange(vsx, dtype=jnp.float32) * stx  # (X,)
    cy = ofy + jnp.arange(vsy, dtype=jnp.float32) * sty  # (Y,)

    dx1, dy1, dx2, dy2 = (templates[:, i] for i in range(4))

    padx1 = cx[None, :, None] + dx1[None, None, :] < paste_box[0] + 1
    pady1 = cy[:, None, None] + dy1[None, None, :] < paste_box[1] + 1
    padx2 = cx[None, :, None] + dx2[None, None, :] > paste_box[2]
    pady2 = cy[:, None, None] + dy2[None, None, :] > paste_box[3]

    mask = padx1 | pady1 | padx2 | pady2
    return jnp.where(flip, jnp.flip(mask, axis=1), mask)


def assign_targets(
    gt_boxes: jnp.ndarray,  # (G, 4) padded GT boxes [x1, y1, x2, y2]
    gt_valid: jnp.ndarray,  # (G,) bool validity of each padded row
    pad_mask: jnp.ndarray,  # (vsy, vsx, T) bool border mask
    templates: jnp.ndarray,  # (T, >=4)
    key: jax.Array,  # PRNG key for the IoU tie-break perturbation
    *,
    ofx: float,
    ofy: float,
    stx: float,
    sty: float,
    pos_thresh: float,
    neg_thresh: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (class_map (Y,X,T), regress_map (Y,X,4T), iou (Y,X,T,G))."""
    vsy, vsx, nt = pad_mask.shape
    ng = gt_boxes.shape[0]

    # Reference drops degenerate boxes before assignment (processor.py:225-230).
    degenerate = (gt_boxes[:, 2] <= gt_boxes[:, 0]) | (gt_boxes[:, 3] <= gt_boxes[:, 1])
    gt_valid = gt_valid & ~degenerate

    iou = compute_dense_overlap(
        ofx, ofy, stx, sty, vsx, vsy, templates, gt_boxes, gt_valid
    )  # (Y, X, T, G)

    # Tie-break perturbation (processor.py:193-195). The perturbed IoU is what
    # the reference uses for every subsequent max/argmax.
    iou_pert = iou + 1e-6 * jax.random.uniform(key, iou.shape, dtype=iou.dtype)
    # Invalid GT rows must never win any argmax.
    iou_ranked = jnp.where(gt_valid[None, None, None, :], iou_pert, -1.0)

    any_gt = jnp.any(gt_valid)

    # --- Classification map -------------------------------------------------
    best_iou = jnp.max(iou_ranked, axis=3)  # (Y, X, T)
    best_gt = jnp.argmax(iou_ranked, axis=3)  # (Y, X, T)

    # Rule 1: per-GT best anchor over the flattened (Y*X*T) grid.
    flat = iou_ranked.reshape(-1, ng)  # (YXT, G)
    per_gt_best_idx = jnp.argmax(flat, axis=0)  # (G,)
    per_gt_best_iou = jnp.max(flat, axis=0)  # (G,)
    force = (per_gt_best_iou > neg_thresh) & gt_valid
    best_anchor_mask = (
        jnp.zeros((vsy * vsx * nt,), dtype=bool).at[per_gt_best_idx].max(force)
    ).reshape(vsy, vsx, nt)

    class_map = jnp.full((vsy, vsx, nt), -1.0, dtype=jnp.float32)
    class_map = jnp.where(best_anchor_mask, 1.0, class_map)
    # Rule 2: positives.
    class_map = jnp.maximum(class_map, (best_iou >= pos_thresh) * 2.0 - 1.0)
    # Rule 3: gray zone.
    gray = jnp.where((best_iou >= neg_thresh) & (best_iou < pos_thresh), 0.0, -1.0)
    class_map = jnp.maximum(class_map, gray)
    # With zero valid GTs the reference leaves the map all-negative.
    class_map = jnp.where(any_gt, class_map, -1.0)

    # --- Regression map -----------------------------------------------------
    # Anchor-relative targets against the per-location best GT
    # (processor.py:152-211): tx = (gt_cx - anchor_cx) / template_w, etc.,
    # with the +1 MATLAB size convention on both template and GT extents.
    coarse_x = ofx + jnp.arange(vsx, dtype=jnp.float32) * stx  # (X,)
    coarse_y = ofy + jnp.arange(vsy, dtype=jnp.float32) * sty  # (Y,)

    dww = templates[:, 2] - templates[:, 0] + 1.0  # (T,)
    dhh = templates[:, 3] - templates[:, 1] + 1.0

    fcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2.0  # (G,)
    fcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2.0
    fww = gt_boxes[:, 2] - gt_boxes[:, 0] + 1.0
    fhh = gt_boxes[:, 3] - gt_boxes[:, 1] + 1.0

    # Gather per-location best-GT stats — no (Y,X,T,G) temporaries needed.
    sel_cx = fcx[best_gt]  # (Y, X, T)
    sel_cy = fcy[best_gt]
    sel_w = fww[best_gt]
    sel_h = fhh[best_gt]

    tx = (sel_cx - coarse_x[None, :, None]) / dww[None, None, :]
    ty = (sel_cy - coarse_y[:, None, None]) / dhh[None, None, :]
    tw = jnp.log(sel_w / dww[None, None, :])
    th = jnp.log(sel_h / dhh[None, None, :])

    regress_map = jnp.concatenate([tx, ty, tw, th], axis=2)  # (Y, X, 4T)
    # Reference emits all-zero regression when there are no GTs
    # (processor.py:220 init, never overwritten).
    regress_map = jnp.where(any_gt, regress_map, 0.0)

    # --- Border handling (processor.py:272-274) -----------------------------
    non_neg_border = pad_mask & (class_map != -1.0)
    class_map = jnp.where(non_neg_border, 0.0, class_map)
    # Parity quirk: only the tx block is zeroed at the border.
    tx_block = jnp.where(non_neg_border, 0.0, regress_map[:, :, :nt])
    regress_map = jnp.concatenate([tx_block, regress_map[:, :, nt:]], axis=2)

    return class_map, regress_map, iou
