"""NumPy float64 oracles encoding the reference implementation's semantics.

These are independent re-derivations of the behaviors catalogued in
SURVEY.md §2.2/§2.4/§2.5 (reference: tinyfaces/datasets/dense_overlap.py,
processor.py, models/utils.py, metrics.py), used as golden references for
the jitted device ops. Deliberately simple/loopy — clarity over speed.
"""

from __future__ import annotations

import numpy as np


def iou_plus1(box_a: np.ndarray, box_b: np.ndarray) -> float:
    """IoU of two boxes with the MATLAB +1 pixel convention."""
    ax1, ay1, ax2, ay2 = box_a
    bx1, by1, bx2, by2 = box_b
    iw = min(ax2, bx2) - max(ax1, bx1) + 1
    ih = min(ay2, by2) - max(ay1, by1) + 1
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    area_a = (ax2 - ax1 + 1) * (ay2 - ay1 + 1)
    area_b = (bx2 - bx1 + 1) * (by2 - by1 + 1)
    return inter / (area_a + area_b - inter)


def dense_overlap_oracle(ofx, ofy, stx, sty, vsx, vsy, templates, gt_boxes):
    """(vsy, vsx, T, G) dense IoU, straight from the definition."""
    nt = templates.shape[0]
    ng = gt_boxes.shape[0]
    out = np.zeros((vsy, vsx, nt, ng), dtype=np.float64)
    for g in range(ng):
        for t in range(nt):
            for x in range(vsx):
                for y in range(vsy):
                    cx = ofx + x * stx
                    cy = ofy + y * sty
                    anchor = (
                        templates[t, 0] + cx,
                        templates[t, 1] + cy,
                        templates[t, 2] + cx,
                        templates[t, 3] + cy,
                    )
                    out[y, x, t, g] = iou_plus1(anchor, gt_boxes[g])
    return out


def rect_dist_oracle(boxes_i: np.ndarray, boxes_j: np.ndarray) -> np.ndarray:
    """Rowwise 1-IoU distance with +1 arithmetic and the reference's
    x2 > x1 (strict) intersection gate and [0,1] clamp."""
    boxes_i = np.atleast_2d(boxes_i).astype(np.float64)
    boxes_j = np.atleast_2d(boxes_j).astype(np.float64)
    n = boxes_i.shape[0]
    out = np.zeros(n)
    for r in range(n):
        ax1, ay1, ax2, ay2 = boxes_i[r]
        bx1, by1, bx2, by2 = boxes_j[r]
        x1, y1 = max(ax1, bx1), max(ay1, by1)
        x2, y2 = min(ax2, bx2), min(ay2, by2)
        inter = (x2 - x1 + 1) * (y2 - y1 + 1) * float(x2 > x1 and y2 > y1)
        a_i = (ax2 - ax1 + 1) * (ay2 - ay1 + 1)
        a_j = (bx2 - bx1 + 1) * (by2 - by1 + 1)
        denom = a_i + a_j - inter
        iou = inter / denom if denom != 0 else 0.0
        if not np.isfinite(iou):
            iou = 0.0
        out[r] = min(1.0, max(0.0, 1.0 - iou))
    return out


def greedy_nms_oracle(boxes: np.ndarray, scores: np.ndarray, thresh: float):
    """torchvision-semantics greedy NMS; returns kept indices (original order)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), dtype=bool)
    for oi, i in enumerate(order):
        if suppressed[oi]:
            continue
        keep.append(i)
        bi = boxes[i]
        area_i = (bi[2] - bi[0]) * (bi[3] - bi[1])
        for oj in range(oi + 1, len(order)):
            if suppressed[oj]:
                continue
            j = order[oj]
            bj = boxes[j]
            iw = min(bi[2], bj[2]) - max(bi[0], bj[0])
            ih = min(bi[3], bj[3]) - max(bi[1], bj[1])
            inter = max(iw, 0.0) * max(ih, 0.0)
            area_j = (bj[2] - bj[0]) * (bj[3] - bj[1])
            union = area_i + area_j - inter
            iou = inter / union if union > 0 else 0.0
            if iou > thresh:
                suppressed[oj] = True
    return np.array(keep, dtype=np.int64)


def assign_oracle(
    gt_boxes: np.ndarray,  # (G, 4) valid boxes only
    pad_mask: np.ndarray,  # (Y, X, T) bool
    templates: np.ndarray,
    noise: np.ndarray,  # (Y, X, T, G) the exact perturbation used on device
    *,
    ofx, ofy, stx, sty, pos_thresh, neg_thresh,
):
    """Reference get_heatmaps/get_regression semantics on float64."""
    vsy, vsx, nt = pad_mask.shape

    # drop degenerate boxes
    ok = ~((gt_boxes[:, 2] <= gt_boxes[:, 0]) | (gt_boxes[:, 3] <= gt_boxes[:, 1]))
    gt_boxes = gt_boxes[ok]
    noise = noise[..., ok]
    ng = gt_boxes.shape[0]

    class_map = -np.ones((vsy, vsx, nt))
    regress_map = np.zeros((vsy, vsx, nt * 4))

    if ng > 0:
        iou = dense_overlap_oracle(ofx, ofy, stx, sty, vsx, vsy, templates, gt_boxes)
        iou = iou + 1e-6 * noise

        # regression targets w.r.t. per-location best GT
        best_gt = iou.argmax(axis=3)
        cxs = ofx + np.arange(vsx) * stx
        cys = ofy + np.arange(vsy) * sty
        dww = templates[:, 2] - templates[:, 0] + 1
        dhh = templates[:, 3] - templates[:, 1] + 1
        fcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
        fcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
        fww = gt_boxes[:, 2] - gt_boxes[:, 0] + 1
        fhh = gt_boxes[:, 3] - gt_boxes[:, 1] + 1

        tx = np.zeros((vsy, vsx, nt))
        ty = np.zeros((vsy, vsx, nt))
        tw = np.zeros((vsy, vsx, nt))
        th = np.zeros((vsy, vsx, nt))
        for y in range(vsy):
            for x in range(vsx):
                for t in range(nt):
                    g = best_gt[y, x, t]
                    tx[y, x, t] = (fcx[g] - cxs[x]) / dww[t]
                    ty[y, x, t] = (fcy[g] - cys[y]) / dhh[t]
                    tw[y, x, t] = np.log(fww[g] / dww[t])
                    th[y, x, t] = np.log(fhh[g] / dhh[t])
        regress_map = np.concatenate([tx, ty, tw, th], axis=2)

        best_iou = iou.max(axis=3)

        # per-GT best anchor forced positive if above neg_thresh
        flat = iou.reshape(-1, ng)
        for g in range(ng):
            if flat[:, g].max() > neg_thresh:
                class_map.reshape(-1)[flat[:, g].argmax()] = 1

        class_map = np.maximum(class_map, (best_iou >= pos_thresh) * 2.0 - 1.0)
        gray = -np.ones_like(class_map)
        gray[(best_iou >= neg_thresh) & (best_iou < pos_thresh)] = 0
        class_map = np.maximum(class_map, gray)

    border = pad_mask & (class_map != -1)
    class_map[border] = 0
    regress_map[:, :, :nt][border] = 0
    return class_map, regress_map
