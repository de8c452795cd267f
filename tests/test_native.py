"""Native C++ augmentation engine vs the Python reference path."""

import numpy as np
import pytest

from tinyfaces_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.is_available():
        pytest.skip("native library unavailable (no toolchain)")
    return True


def _batch(rng, b=6):
    images, boxes = [], []
    for _ in range(b):
        h, w = int(rng.integers(120, 400)), int(rng.integers(150, 500))
        images.append(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        n = int(rng.integers(0, 5))
        x1 = rng.uniform(0, w * 0.7, n)
        y1 = rng.uniform(0, h * 0.7, n)
        bx = np.stack(
            [x1, y1, x1 + rng.uniform(5, w * 0.3, n), y1 + rng.uniform(5, h * 0.3, n)],
            axis=1,
        ).astype(np.float32)
        boxes.append(bx)
    return images, boxes


def test_native_augment_shapes_and_invariants(lib_ok):
    rng = np.random.default_rng(0)
    images, boxes = _batch(rng)
    out = native.native_augment_batch(
        images, boxes, input_size=(200, 200), neg_thresh=0.3, max_gt=16,
        seed=42, n_threads=4,
    )
    assert out["image"].shape == (6, 200, 200, 3)
    assert out["gt_boxes"].shape == (6, 16, 4)
    assert out["gt_valid"].shape == (6, 16)
    assert out["paste_box"].shape == (6, 4)

    for i in range(6):
        px1, py1, px2, py2 = out["paste_box"][i].astype(int)
        assert 0 <= px1 <= px2 <= 200 and 0 <= py1 <= py2 <= 200
        # outside the paste region: mean pixel
        if py1 > 0:
            assert (out["image"][i, :py1] == np.array([123, 116, 103], np.uint8)).all()
        # valid boxes lie within the canvas
        gv = out["gt_valid"][i]
        gt = out["gt_boxes"][i][gv]
        if gt.shape[0]:
            assert (gt[:, 0] >= 0).all() and (gt[:, 2] <= 201).all()
            assert (gt[:, 2] > gt[:, 0]).all() and (gt[:, 3] > gt[:, 1]).all()


def test_native_deterministic_per_seed(lib_ok):
    rng = np.random.default_rng(1)
    images, boxes = _batch(rng, b=3)
    a = native.native_augment_batch(images, boxes, (128, 128), 0.3, 8, seed=7)
    b = native.native_augment_batch(images, boxes, (128, 128), 0.3, 8, seed=7)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
    c = native.native_augment_batch(images, boxes, (128, 128), 0.3, 8, seed=8)
    assert (a["image"] != c["image"]).any()


def test_native_pastes_source_pixels(lib_ok):
    """With an image smaller than the canvas, the full image is pasted —
    check the pasted pixels equal the (possibly resized) source."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    out = native.native_augment_batch(
        [img], [np.zeros((0, 4), np.float32)], (256, 256), 0.3, 4, seed=3
    )
    px1, py1, px2, py2 = out["paste_box"][0].astype(int)
    region = out["image"][0, py1:py2, px1:px2]
    if out["flip"][0]:
        region = region[:, ::-1]
    # region must be one of: original, half-size, or double-size source
    hh, ww = region.shape[:2]
    assert (hh, ww) in {(64, 80), (32, 40), (128, 160)}
    if (hh, ww) == (64, 80):
        np.testing.assert_array_equal(region, img)


def test_native_matches_python_distribution(lib_ok):
    """Flip rate ~0.5 and resize choice ~uniform thirds over many seeds."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
    flips = 0
    n = 200
    for s in range(n):
        out = native.native_augment_batch(
            [img], [np.zeros((0, 4), np.float32)], (64, 64), 0.3, 4, seed=s
        )
        flips += int(out["flip"][0])
    assert 0.35 < flips / n < 0.65


def test_native_prefetch_loader_end_to_end(lib_ok, tmp_path):
    """Full loader path: synthetic WIDER tree -> decode -> C++ augment."""
    from PIL import Image

    from tinyfaces_tpu.config import DetectorConfig
    from tinyfaces_tpu.data.loader import NativePrefetchLoader
    from tinyfaces_tpu.data.wider_face import WIDERFace

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "WIDER_train" / "images" / "0--Ev"
    img_dir.mkdir(parents=True)
    lines = []
    for i in range(4):
        img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        Image.fromarray(img).save(img_dir / f"im{i}.jpg")
        lines += [f"0--Ev/im{i}.jpg", "1", "10 12 40 50 0 0 0 0 0 0"]
    ann = tmp_path / "gt.txt"
    ann.write_text("\n".join(lines) + "\n")

    cfg = DetectorConfig(input_size=(96, 96), max_gt=4)
    ds = WIDERFace(ann, np.zeros((25, 5)), cfg=cfg, dataset_root=tmp_path, split="train")
    loader = NativePrefetchLoader(ds, batch_size=2, workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (2, 96, 96, 3)
        assert b["gt_boxes"].shape == (2, 4, 4)
        assert b["paste_box"].shape == (2, 4)
