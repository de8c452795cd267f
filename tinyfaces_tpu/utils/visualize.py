"""PIL-based bounding-box visualization (reference tinyfaces/utils/
visualize.py:5-68): debug rendering of boxes onto images, interactive
display, and qualitative result dumps."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

try:
    from PIL import Image, ImageDraw
except ImportError:  # pragma: no cover
    Image = ImageDraw = None


def draw_bounding_box(image, bbox, label: Optional[dict] = None, width: int = 2,
                      color: str = "red"):
    """Draw one box (x1, y1, x2, y2) onto a PIL image, optionally labeled."""
    draw = ImageDraw.Draw(image)
    x1, y1, x2, y2 = [float(v) for v in bbox[:4]]
    draw.rectangle(((x1, y1), (x2, y2)), outline=color, width=width)
    if label and "name" in label:
        draw.text((x1, max(0.0, y1 - 10)), str(label["name"]), fill=color)
    return image


def visualize_bboxes(image, bboxes, show: bool = True):
    """Render all boxes; show interactively when requested."""
    for i, bbox in enumerate(np.asarray(bboxes)):
        image = draw_bounding_box(image, bbox, {"name": str(i)})
    if show:
        image.show()
    return image


def render_and_save_bboxes(
    image,
    img_id,
    bboxes: Sequence,
    scores: Optional[Sequence] = None,
    scales: Optional[Sequence] = None,
    out_dir: str | Path = "qualitative",
):
    """Qualitative dump: draw detections (with scores) and save to disk."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, bbox in enumerate(np.asarray(bboxes)):
        name = f"{scores[i]:.2f}" if scores is not None else str(i)
        image = draw_bounding_box(image, bbox, {"name": name})
    out_path = out_dir / f"{img_id}.jpg"
    image.save(out_path)
    return out_path
