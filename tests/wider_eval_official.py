"""Loop-level transcription of the official WIDER eval_tools algorithm.

Second, independent witness for wider_eval.py (VERDICT r2 #4): this module
transcribes the official MATLAB evaluation (eval_tools: norm_score.m,
image_evaluation/boxoverlap.m, img_pr_info / dataset_pr_info, VOCap.m —
the tool the reference defers to via `make evaluation`,
/root/reference/Makefile:20-21) statement by statement, scalar loops and
all, with none of wider_eval.py's vectorization. The A/B test
(tests/test_wider_eval.py) requires agreement to < 1e-6 AP on randomized
multi-event fixtures.

Official protocol quirks reproduced deliberately (all verified against the
published eval_tools source structure):
  * boxes convert xywh -> xyxy as x2 = x + w (NO -1) while the overlap
    uses the +1 pixel convention — a 1-px-widened IoU;
  * EVERY detection whose best-overlap GT is outside the difficulty split
    is excluded from the proposal count (not just the first);
  * images with zero GT boxes are skipped entirely — their detections
    count as neither TPs nor false positives;
  * scores are min-max normalized over the whole result set and swept
    over 1000 thresholds; detections are assumed score-descending within
    each file (what the writer produces).
"""

from __future__ import annotations

import numpy as np

THRESH_NUM = 1000
IOU_THRESH = 0.5


def boxoverlap(gts_xyxy: np.ndarray, det_xyxy: np.ndarray) -> np.ndarray:
    """MATLAB boxoverlap.m: +1-convention IoU of one det against all GTs."""
    o = np.zeros(gts_xyxy.shape[0])
    for g in range(gts_xyxy.shape[0]):
        x1 = max(gts_xyxy[g, 0], det_xyxy[0])
        y1 = max(gts_xyxy[g, 1], det_xyxy[1])
        x2 = min(gts_xyxy[g, 2], det_xyxy[2])
        y2 = min(gts_xyxy[g, 3], det_xyxy[3])
        w = x2 - x1 + 1
        h = y2 - y1 + 1
        if w <= 0 or h <= 0:
            continue
        inter = w * h
        ga = (gts_xyxy[g, 2] - gts_xyxy[g, 0] + 1) * (
            gts_xyxy[g, 3] - gts_xyxy[g, 1] + 1)
        da = (det_xyxy[2] - det_xyxy[0] + 1) * (det_xyxy[3] - det_xyxy[1] + 1)
        o[g] = inter / (ga + da - inter)
    return o


def image_evaluation(pred_info: np.ndarray, gt_bbx: np.ndarray,
                     ignore: np.ndarray):
    """image_evaluation.m: per-detection greedy state machine.

    pred_info: (D, 5) xywh+score, score-descending. gt_bbx: (G, 4) xywh.
    ignore: (G,) 1 = in split, 0 = ignored.
    Returns (pred_recall (D,), proposal_list (D,))."""
    d = pred_info.astype(np.float64).copy()
    g = gt_bbx.astype(np.float64).copy()
    pred_recall = np.zeros(d.shape[0])
    recall_list = np.zeros(g.shape[0])
    proposal_list = np.ones(d.shape[0])
    d[:, 2] = d[:, 0] + d[:, 2]  # x2 = x + w (official: no -1)
    d[:, 3] = d[:, 1] + d[:, 3]
    g[:, 2] = g[:, 0] + g[:, 2]
    g[:, 3] = g[:, 1] + g[:, 3]
    for h in range(d.shape[0]):
        overlaps = boxoverlap(g, d[h, :4])
        max_idx = int(np.argmax(overlaps))
        if overlaps[max_idx] >= IOU_THRESH:
            if ignore[max_idx] == 0:
                recall_list[max_idx] = -1
                proposal_list[h] = -1
            elif recall_list[max_idx] == 0:
                recall_list[max_idx] = 1
        pred_recall[h] = int(np.sum(recall_list == 1))
    return pred_recall, proposal_list


def img_pr_info(pred_info: np.ndarray, proposal_list: np.ndarray,
                pred_recall: np.ndarray) -> np.ndarray:
    """img_pr_info: per-image (proposals, TP) at each of 1000 thresholds.
    pred_info scores must already be normalized."""
    pr_info = np.zeros((THRESH_NUM, 2))
    for t in range(THRESH_NUM):
        thresh = 1.0 - (t + 1) / THRESH_NUM
        r_index = np.where(pred_info[:, 4] >= thresh)[0]
        if len(r_index) == 0:
            continue
        r_index = r_index[-1]
        p_index = np.where(proposal_list[: r_index + 1] == 1)[0]
        pr_info[t, 0] = len(p_index)
        pr_info[t, 1] = pred_recall[r_index]
    return pr_info


def voc_ap_official(rec: np.ndarray, prec: np.ndarray) -> float:
    """VOCap.m: interpolated area under the PR envelope."""
    mrec = np.concatenate([[0.0], rec, [1.0]])
    mpre = np.concatenate([[0.0], prec, [0.0]])
    for i in range(mpre.size - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
    return float(np.sum((mrec[idx] - mrec[idx - 1]) * mpre[idx]))


def evaluate_official(results: dict, gt: dict, keep: dict) -> float:
    """wider_eval.m main loop: norm_score -> per-image eval -> PR -> AP.

    results: img -> (D, 5) xywh+score (score-descending rows).
    gt: img -> (G, 4) xywh. keep: img -> (G,) bool split membership.
    """
    # norm_score.m: global min-max normalization over every detection
    all_scores = []
    for r in results.values():
        for i in range(r.shape[0]):
            all_scores.append(r[i, 4])
    if all_scores:
        smin, smax = min(all_scores), max(all_scores)
    else:
        smin, smax = 0.0, 0.0
    span = smax - smin if smax > smin else 1e-12

    count_face = 0
    pr_curve = np.zeros((THRESH_NUM, 2))
    for img, gts in gt.items():
        keep_mask = np.asarray(keep[img], bool)
        count_face += int(keep_mask.sum())
        dets = results.get(img, np.zeros((0, 5)))
        if gts.shape[0] == 0 or dets.shape[0] == 0:
            continue  # official quirk: empty-GT images contribute nothing
        norm = dets.astype(np.float64).copy()
        norm[:, 4] = (norm[:, 4] - smin) / span
        ignore = keep_mask.astype(np.float64)
        pred_recall, proposal_list = image_evaluation(norm, gts, ignore)
        pr_curve += img_pr_info(norm, proposal_list, pred_recall)

    precision = np.zeros(THRESH_NUM)
    recall = np.zeros(THRESH_NUM)
    for t in range(THRESH_NUM):
        if pr_curve[t, 0] > 0:
            precision[t] = pr_curve[t, 1] / pr_curve[t, 0]
        recall[t] = pr_curve[t, 1] / count_face if count_face else 0.0
    return voc_ap_official(recall, precision)
