import numpy as np
import jax
import jax.numpy as jnp

from tinyfaces_tpu.config import DetectorConfig
from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.data.targets import build_targets, normalize_images
from tinyfaces_tpu.data.wider_face import (
    augment_sample,
    crop_and_paste,
    parse_wider_annotations,
)

ANNOT = """0--Parade/0_Parade_marchingband_1_849.jpg
2
449 330 122 149 0 0 0 0 0 0
100 100 40 50 1 0 1 0 0 0
0--Parade/0_Parade_Parade_0_904.jpg
0
0 0 0 0 0 0 0 0 0 0
1--Handshaking/1_Handshaking_Handshaking_1_35.jpg
1
20 30 0 50 0 0 0 0 0 0
"""


def test_parse_annotations(tmp_path):
    p = tmp_path / "gt.txt"
    p.write_text(ANNOT)
    samples = parse_wider_annotations(p, "train")
    assert len(samples) == 3
    # (x, y, w, h) -> (x1, y1, x2, y2) with -1
    np.testing.assert_allclose(samples[0].bboxes[0], [449, 330, 449 + 121, 330 + 148])
    assert samples[0].attrs["blur"][1] == 1
    assert samples[1].bboxes.shape == (0, 4)
    # zero-width box dropped
    assert samples[2].bboxes.shape == (0, 4)


def test_parse_test_split(tmp_path):
    p = tmp_path / "filelist.txt"
    p.write_text("a/b.jpg\nc/d.jpg\n")
    samples = parse_wider_annotations(p, "test")
    assert [s.img_path for s in samples] == ["a/b.jpg", "c/d.jpg"]


def test_crop_and_paste_preserves_pixels():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
    boxes = np.array([[50.0, 50.0, 120.0, 150.0]])
    canvas, out_boxes, paste_box = crop_and_paste(img, boxes, (200, 200), 0.3, rng)
    assert canvas.shape == (200, 200, 3)
    x1, y1, x2, y2 = paste_box.astype(int)
    # pasted region comes from the source image; outside is the mean pixel
    assert (canvas[:y1] == np.array([123, 116, 103], np.uint8)).all()
    # surviving boxes lie within the canvas
    if out_boxes.shape[0]:
        assert (out_boxes[:, 0] >= 0).all() and (out_boxes[:, 2] <= 200).all()


def test_crop_drops_boxes_outside():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (600, 600, 3), dtype=np.uint8)
    # box in the far corner: will often fall outside the 100x100 crop
    boxes = np.array([[550.0, 550.0, 590.0, 590.0]])
    dropped = 0
    for _ in range(20):
        _, out_boxes, _ = crop_and_paste(img, boxes.copy(), (100, 100), 0.3, rng)
        dropped += out_boxes.shape[0] == 0
    assert dropped > 0


def test_augment_sample_static_shapes():
    cfg = DetectorConfig(input_size=(200, 200), max_gt=16)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (350, 280, 3), dtype=np.uint8)
    boxes = np.array([[30.0, 40.0, 120.0, 160.0], [200.0, 50.0, 260.0, 140.0]])
    canvas, gt, gt_valid, paste_box, flip = augment_sample(img, boxes, cfg, rng)
    assert canvas.shape == (200, 200, 3) and canvas.dtype == np.uint8
    assert gt.shape == (16, 4) and gt_valid.shape == (16,)
    assert not gt_valid[gt_valid.argmin():].any() or gt_valid.all()


def test_normalize_images_matches_torchvision_semantics():
    img = np.full((1, 2, 2, 3), 255, np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(img)))
    want = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_build_targets_batch():
    cfg = DetectorConfig(input_size=(128, 128), heatmap_size=(16, 16), max_gt=8)
    templates = load_templates()
    rng = np.random.default_rng(3)
    b = 2
    batch = {
        "image": jnp.asarray(rng.integers(0, 255, (b, 128, 128, 3), dtype=np.uint8)),
        "gt_boxes": jnp.asarray(
            np.tile(np.array([[30.0, 30, 80, 90]], np.float32), (b, cfg.max_gt, 1))
        ),
        "gt_valid": jnp.asarray(np.tile(np.arange(cfg.max_gt) < 1, (b, 1))),
        "paste_box": jnp.asarray(np.tile(np.array([0, 0, 128, 128], np.float32), (b, 1))),
        "flip": jnp.asarray(np.array([False, True])),
    }
    images, cls_maps, reg_maps = build_targets(
        batch, jnp.asarray(templates, jnp.float32), jax.random.PRNGKey(0), cfg
    )
    assert images.shape == (b, 128, 128, 3)
    assert cls_maps.shape == (b, 16, 16, 25)
    assert reg_maps.shape == (b, 16, 16, 100)
    assert set(np.unique(np.asarray(cls_maps))) <= {-1.0, 0.0, 1.0}
    # each sample has at least the forced-positive anchor for its GT
    assert (np.asarray(cls_maps) == 1).reshape(b, -1).sum(1).min() >= 1


def test_yuv420_roundtrip_matches_normalize():
    """rgb_to_yuv420 -> yuv420_to_normalized vs normalize_images: exact-ish
    for gray images (chroma-neutral), small bounded error on smooth images
    (the 4:2:0 chroma loss a JPEG source already has)."""
    import jax.numpy as jnp

    from tinyfaces_tpu.data.targets import (
        normalize_images,
        rgb_to_yuv420,
        yuv420_to_normalized,
    )

    # gray ramp: U=V=128 everywhere, so only the Y path matters
    g = np.tile(np.arange(256, dtype=np.uint8)[None, :, None], (64, 1, 3))[None]
    want = np.asarray(normalize_images(jnp.asarray(g)))
    got = np.asarray(yuv420_to_normalized(*map(jnp.asarray, rgb_to_yuv420(g))))
    assert np.abs(got - want).max() < 2.5 / 255 / 0.22  # ~1-2 LSB / min std

    # smooth color gradients
    yy, xx = np.mgrid[0:128, 0:128]
    img = np.stack([yy * 2, xx * 2, (yy + xx)], -1).astype(np.uint8)[None]
    want = np.asarray(normalize_images(jnp.asarray(img)))
    got = np.asarray(yuv420_to_normalized(*map(jnp.asarray, rgb_to_yuv420(img))))
    err = np.abs(got - want)
    assert err.mean() < 0.035 and err.max() < 0.15, (err.mean(), err.max())


def test_yuv420_plane_shapes_and_dtype():
    from tinyfaces_tpu.data.targets import rgb_to_yuv420

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 64, 96, 3), dtype=np.uint8)
    y, u, v = rgb_to_yuv420(img)
    assert y.shape == (2, 64, 96) and u.shape == v.shape == (2, 32, 48)
    assert y.dtype == u.dtype == v.dtype == np.uint8
    # total wire bytes exactly halved
    assert y.nbytes + u.nbytes + v.nbytes == img.nbytes // 2


def test_build_targets_yuv_matches_rgb_on_gray():
    """build_targets with the yuv420-packed batch produces (near-)identical
    normalized images and identical target maps vs the RGB batch."""
    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.config import DetectorConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.data.loader import _pack_yuv
    from tinyfaces_tpu.data.targets import build_targets

    cfg = DetectorConfig(input_size=(64, 64), heatmap_size=(8, 8), max_gt=4)
    rng = np.random.default_rng(0)
    gray = np.repeat(rng.integers(0, 255, (64, 64, 1), dtype=np.uint8), 3, -1)
    base = {
        "image": gray,
        "gt_boxes": np.array([[8.0, 8, 40, 44], [0, 0, 0, 0],
                              [0, 0, 0, 0], [0, 0, 0, 0]], np.float32),
        "gt_valid": np.array([True, False, False, False]),
        "paste_box": np.array([0, 0, 64, 64], np.float32),
        "flip": False,
    }
    rgb_batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in base.items()}
    packed = _pack_yuv(base)
    yuv_batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in packed.items()}

    templates = jnp.asarray(load_templates(), jnp.float32)
    key = jax.random.PRNGKey(0)
    img_a, cls_a, reg_a = build_targets(rgb_batch, templates, key, cfg)
    img_b, cls_b, reg_b = build_targets(yuv_batch, templates, key, cfg)

    assert np.abs(np.asarray(img_a) - np.asarray(img_b)).max() < 2.5 / 255 / 0.22
    np.testing.assert_array_equal(np.asarray(cls_a), np.asarray(cls_b))
    np.testing.assert_allclose(np.asarray(reg_a), np.asarray(reg_b))


def test_loader_yuv_pack_mode():
    from tinyfaces_tpu.data.loader import PrefetchLoader

    class Ds:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {
                "image": rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                "flip": bool(i % 2),
            }

    batches = list(PrefetchLoader(Ds(), 4, workers=2, shuffle=False,
                                  pack="yuv420"))
    b = batches[0]
    assert "image" not in b
    assert b["image_y"].shape == (4, 32, 32)
    assert b["image_u"].shape == b["image_v"].shape == (4, 16, 16)
    assert b["image_y"].dtype == np.uint8


def test_gt_overflow_counted_python_path():
    """Crops producing more GT boxes than max_gt must truncate loudly:
    counter incremented, warning raised, first max_gt boxes kept (the
    reference handles unbounded counts, processor.py:213-277)."""
    import warnings

    from tinyfaces_tpu.config import DetectorConfig
    from tinyfaces_tpu.data import overflow
    from tinyfaces_tpu.data.wider_face import augment_sample

    overflow.reset()
    cfg = DetectorConfig()
    # Dense 1000x1000 grid of small faces: any 500x500 crop (at 0.5x, 1x or
    # 2x augmentation scale) contains far more than max_gt=192 boxes.
    img = np.full((1000, 1000, 3), 127, np.uint8)
    step, size = 12, 8
    xs, ys = np.meshgrid(np.arange(4, 996, step), np.arange(4, 996, step))
    boxes = np.stack(
        [xs.ravel(), ys.ravel(), xs.ravel() + size, ys.ravel() + size], axis=1
    ).astype(np.float64)
    assert boxes.shape[0] > 4 * cfg.max_gt

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _, gt, gt_valid, _, _ = augment_sample(
            img, boxes, cfg, np.random.default_rng(0))
    assert gt_valid.sum() == cfg.max_gt  # full capacity used
    snap = overflow.snapshot()
    assert snap["truncated_samples"] == 1
    assert snap["dropped_boxes"] > 0
    assert any(issubclass(w.category, RuntimeWarning) for w in caught)
    overflow.reset()


def test_gt_overflow_counted_native_path():
    from tinyfaces_tpu.config import DetectorConfig
    from tinyfaces_tpu.data import native, overflow

    if not native.is_available():
        import pytest

        pytest.skip("native library unavailable")
    overflow.reset()
    cfg = DetectorConfig()
    img = np.full((1000, 1000, 3), 127, np.uint8)
    step, size = 12, 8
    xs, ys = np.meshgrid(np.arange(4, 996, step), np.arange(4, 996, step))
    boxes = np.stack(
        [xs.ravel(), ys.ravel(), xs.ravel() + size, ys.ravel() + size], axis=1
    ).astype(np.float32)

    item = native.native_augment_sample(
        img, boxes, cfg.input_size, cfg.neg_thresh, cfg.max_gt, seed=7)
    assert item["gt_valid"].sum() == cfg.max_gt
    snap = overflow.snapshot()
    assert snap["truncated_samples"] == 1
    assert snap["dropped_boxes"] > 0
    overflow.reset()
