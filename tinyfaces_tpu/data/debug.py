"""Debug visualization of ground-truth heatmaps and live model output.

Capability parity with DataProcessor.visualize_heatmaps
(processor.py:279-338) and trainer.visualize_output (trainer.py:29-64):
decode a class/regression map pair back into boxes (anchor geometry +
regression refinement), NMS them, and render onto the image. Used by
`make debug` and for qualitative checks during training.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.config import IMAGENET_MEAN, IMAGENET_STD, DetectorConfig
from tinyfaces_tpu.ops.nms import nms
from tinyfaces_tpu.utils.visualize import draw_bounding_box


def heatmap_to_boxes(
    cls_map: np.ndarray,  # (Y, X, T) labels or probabilities
    reg_map: np.ndarray,  # (Y, X, 4T)
    templates: np.ndarray,
    cfg: Optional[DetectorConfig] = None,
    prob_thresh: float = 1.0,
    nms_thresh: float = 1.0,
):
    """Decode map locations with cls >= prob_thresh into refined boxes.

    Mirrors the reference's visualize_heatmaps decode (processor.py:287-318,
    note: template w/h WITHOUT the +1 there, unlike the eval decode — a
    reference inconsistency kept for parity of the debug rendering).
    """
    cfg = cfg or DetectorConfig()
    sty, stx = cfg.rf.stride
    ofy, ofx = cfg.rf.offset
    nt = templates.shape[0]

    fy, fx, fc = np.where(cls_map >= prob_thresh)
    cy, cx = fy * sty + ofy, fx * stx + ofx
    cw = templates[fc, 2] - templates[fc, 0]
    ch = templates[fc, 3] - templates[fc, 1]

    tx = reg_map[:, :, 0 * nt:1 * nt][fy, fx, fc]
    ty = reg_map[:, :, 1 * nt:2 * nt][fy, fx, fc]
    tw = reg_map[:, :, 2 * nt:3 * nt][fy, fx, fc]
    th = reg_map[:, :, 3 * nt:4 * nt][fy, fx, fc]

    rx = cx + cw * tx
    ry = cy + ch * ty
    rw = cw * np.exp(tw)
    rh = ch * np.exp(th)

    boxes = np.stack(
        [np.abs(rx - rw / 2), np.abs(ry - rh / 2), rx + rw / 2, ry + rh / 2],
        axis=1,
    ).astype(np.float32)
    scores = cls_map[fy, fx, fc].astype(np.float32)

    if boxes.shape[0] and nms_thresh < 1.0:
        order, keep = nms(jnp.asarray(boxes), jnp.asarray(scores), nms_thresh)
        idx = np.asarray(order)[np.asarray(keep)]
        boxes, scores = boxes[idx], scores[idx]

    return boxes, scores


def visualize_heatmaps(
    img,  # PIL image
    cls_map: np.ndarray,
    reg_map: np.ndarray,
    templates: np.ndarray,
    cfg: Optional[DetectorConfig] = None,
    prob_thresh: float = 1.0,
    nms_thresh: float = 1.0,
    show: bool = True,
):
    boxes, _ = heatmap_to_boxes(cls_map, reg_map, templates, cfg, prob_thresh, nms_thresh)
    print("Number of bboxes ", boxes.shape[0])
    for idx, bbox in enumerate(boxes):
        img = draw_bounding_box(img, np.round(bbox), {"name": str(idx)})
    if show:
        img.show(title="Heatmap visualized")
    return img


def denormalize_image(x: np.ndarray) -> np.ndarray:
    """Normalized float image (H, W, 3) -> uint8 (trainer.py:36-40)."""
    mean = np.asarray(IMAGENET_MEAN)
    std = np.asarray(IMAGENET_STD)
    return np.clip((x * std + mean) * 255.0, 0, 255).astype(np.uint8)


def visualize_output(
    image: np.ndarray,  # (H, W, 3) normalized float image
    output: np.ndarray,  # (Y, X, 5T) model output (NHWC)
    templates: np.ndarray,
    cfg: Optional[DetectorConfig] = None,
    prob_thresh: float = 0.55,
    nms_thresh: float = 0.1,
    show: bool = True,
):
    """Render a live training-time prediction (trainer.py:29-58): sigmoid the
    class channels and reuse the heatmap decode."""
    from PIL import Image

    nt = templates.shape[0]
    prob = 1.0 / (1.0 + np.exp(-output[..., :nt]))
    pil = Image.fromarray(denormalize_image(image))
    return visualize_heatmaps(
        pil, prob, output[..., nt:], templates, cfg, prob_thresh, nms_thresh,
        show=show,
    )
