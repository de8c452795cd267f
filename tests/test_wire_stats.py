"""tools/wire_stats.py: content generators + per-cell measurement keys.

The B/px numbers themselves are pinned by tests/test_jpegdct*.py; here we
pin the sweep tool's contract (bench.py's BENCH_CONTENT knob imports
content_images from it).
"""

import numpy as np
import pytest

from tools.wire_stats import content_images, measure


@pytest.mark.parametrize("kind", ["smooth", "natural", "texture", "graphics"])
def test_content_images_shapes(kind):
    imgs = content_images(kind, 2, 64, 80, seed=1)
    assert len(imgs) == 2
    for im in imgs:
        assert im.shape == (64, 80, 3) and im.dtype == np.uint8


def test_content_images_unknown_kind():
    with pytest.raises(ValueError):
        content_images("plasma", 1, 32, 32)


def test_measure_reports_truncation_and_bpx():
    imgs = content_images("texture", 2, 64, 64, seed=0)
    row = measure(imgs, 64, 64, quality=90)
    for key in ("jpeg_Bpx", "v3_Bpx", "v4_Bpx", "v3_drop_pct",
                "v4_drop_pct", "nonzero_ac"):
        assert key in row
    # fixed-capacity wires: v4 strictly smaller than v3 on the wire
    assert 0 < row["v4_Bpx"] < row["v3_Bpx"]
    # per-pixel noise must show real truncation; and v4's tighter value
    # budget can only drop more than v3's zigzag cutoff alone
    assert row["v3_drop_pct"] > 1.0
    assert row["v4_drop_pct"] >= row["v3_drop_pct"]


def test_measure_transparent_on_smooth_content():
    imgs = content_images("smooth", 2, 64, 64, seed=0)
    row = measure(imgs, 64, 64, quality=85)
    assert row["v3_drop_pct"] == 0.0
    assert row["v4_drop_pct"] == 0.0
