"""jpegdct TRAIN wire: host pack (data/dct_train.py) + device augmentation
(data/targets.device_augment_dct) against the host rgb pixel path.

Geometry (gt boxes, paste_box, flip) must be bit-identical across wires —
both consume wider_face.augment_draws. Pixels may differ only by the lossy
coefficient budget, float-vs-uint8 intermediates, and 1-px resize edge
clamping (see data/dct_train.py docstring)."""

import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tinyfaces_tpu.config import DetectorConfig
from tinyfaces_tpu.data import jpegdct
from tinyfaces_tpu.data.dct_train import (
    TRAIN_REGION,
    decode_dct,
    region_anchor,
    train_item_dct,
    wire_total_bytes,
)
from tinyfaces_tpu.data.targets import device_augment_dct, normalize_images
from tinyfaces_tpu.data.wider_face import augment_draws, augment_sample

pytestmark = pytest.mark.skipif(
    not jpegdct.is_available(), reason="native jpegdct library unavailable"
)


def _smooth_image(rng, h, w):
    """Low-frequency content so the wire's coefficient budget is honest
    (natural-image-like), with a few face-ish blobs."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 71.0))[..., None]
    img = img + np.stack([10 * np.sin(yy / 31.0)] * 3, -1)
    for _ in range(4):
        s = int(rng.integers(24, 80))
        y0 = int(rng.integers(0, max(1, h - s)))
        x0 = int(rng.integers(0, max(1, w - s)))
        img[y0:y0 + s, x0:x0 + s] = img[y0:y0 + s, x0:x0 + s] * 0.5 + 70
    return np.clip(img, 0, 255).astype(np.uint8)


def _jpeg_roundtrip(img):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="jpeg", quality=95)
    data = buf.getvalue()
    with Image.open(io.BytesIO(data)) as im:
        decoded = np.asarray(im.convert("RGB"))
    return data, decoded


def _seeds_per_scale(hw, cfg, want=(0, 1, 2)):
    """Find one RNG seed per scale branch (draws are seed-deterministic)."""
    found = {}
    boxes = np.array([[40.0, 40.0, 90.0, 100.0]], np.float32)
    for seed in range(200):
        d, *_ = augment_draws(hw, boxes.copy(), cfg,
                              np.random.default_rng(seed))
        found.setdefault(d.scale_id, seed)
        if all(s in found for s in want):
            return found
    raise AssertionError(f"scale branches not all hit: {found}")


def test_region_anchor_bounds():
    cfg = DetectorConfig()
    rng = np.random.default_rng(0)
    boxes = np.array([[10.0, 10.0, 60.0, 70.0]], np.float32)
    for _ in range(300):
        h = int(rng.integers(40, 1400))
        w = int(rng.integers(40, 1400))
        d, *_ = augment_draws((h, w), boxes.copy(), cfg,
                              np.random.default_rng(rng.integers(1 << 31)))
        a0y, a0x, offy, offx = region_anchor(d)
        assert a0y % 16 == 0 and a0x % 16 == 0 and a0y >= 0 and a0x >= 0
        if d.scale_id == 1:
            assert 0 <= offy < 16 and 0 <= offx < 16
            assert offy + cfg.input_size[0] <= TRAIN_REGION
        elif d.scale_id == 0:
            assert 0 <= offy < 9 and 0 <= offx < 9
            assert offy + cfg.input_size[0] <= TRAIN_REGION // 2
        else:
            assert 0 <= offy < 35 and 0 <= offx < 35
        # the device never reads source rows past the shipped region
        if d.scale_id == 0:
            assert 2 * (offy + cfg.input_size[0]) + 2 <= TRAIN_REGION


def test_geometry_identical_to_rgb_path():
    cfg = DetectorConfig()
    rng = np.random.default_rng(3)
    img = _smooth_image(rng, 310, 420)
    data, decoded = _jpeg_roundtrip(img)
    dct = decode_dct(data)
    assert (dct.h, dct.w) == img.shape[:2]
    for seed in range(12):
        item = train_item_dct(dct, np.array([[30, 30, 120, 140]], np.float32),
                              cfg, np.random.default_rng(seed))
        canvas, gt, gtv, pb, flip = augment_sample(
            decoded, np.array([[30, 30, 120, 140]], np.float32), cfg,
            np.random.default_rng(seed))
        np.testing.assert_array_equal(item["gt_boxes"], gt)
        np.testing.assert_array_equal(item["gt_valid"], gtv)
        np.testing.assert_array_equal(item["paste_box"], pb)
        assert item["flip"] == flip
        assert item["dct_wire"].shape == (wire_total_bytes(),)


def test_device_augment_matches_host_all_scales():
    cfg = DetectorConfig()
    rng = np.random.default_rng(7)
    img = _smooth_image(rng, 560, 730)
    data, decoded = _jpeg_roundtrip(img)
    dct = decode_dct(data)
    seeds = _seeds_per_scale((560, 730), cfg)

    items, canvases = [], []
    for sid, seed in sorted(seeds.items()):
        items.append(train_item_dct(
            dct, np.array([[50, 50, 200, 220]], np.float32), cfg,
            np.random.default_rng(seed)))
        canvas, *_ = augment_sample(
            decoded, np.array([[50, 50, 200, 220]], np.float32), cfg,
            np.random.default_rng(seed))
        canvases.append(canvas)

    batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
    batch["flip"] = np.array([it["flip"] for it in items])
    got = np.asarray(device_augment_dct(batch, cfg))
    want = np.asarray(normalize_images(np.stack(canvases)))

    ih, iw = cfg.input_size
    for i, (sid, _) in enumerate(sorted(seeds.items())):
        diff = np.abs(got[i] - want[i])
        # normalized units; 0.0174 ~= 1/255 / std. Wire truncation +
        # float-vs-uint8 resize + edge clamping stay well under these.
        assert diff.mean() < 0.03, (sid, diff.mean())
        assert np.percentile(diff, 99) < 0.2, (sid, np.percentile(diff, 99))
        # outside the paste box both paths paint the exact canvas fill
        pb = items[i]["paste_box"]
        cols = np.arange(iw)
        outside = (cols < pb[0]) | (cols >= pb[2])
        if items[i]["flip"]:
            outside = outside[::-1]
        if outside.any():
            np.testing.assert_allclose(
                got[i][:, outside], want[i][:, outside], atol=1e-5)


def test_prefetch_loader_jpegdct_pack(tmp_path):
    """End-to-end loader path over a tiny on-disk tree."""
    from PIL import Image

    from tinyfaces_tpu.data.loader import PrefetchLoader
    from tinyfaces_tpu.data.wider_face import WIDERFace

    rng = np.random.default_rng(0)
    d = tmp_path / "WIDER_train" / "images" / "0--T"
    d.mkdir(parents=True)
    lines = []
    for i in range(4):
        img = _smooth_image(rng, 240, 300)
        Image.fromarray(img).save(d / f"t{i}.jpg", quality=92)
        lines += [f"0--T/t{i}.jpg", "1", "40 40 80 90 0 0 0 0 0 0"]
    sd = tmp_path / "wider_face_split"
    sd.mkdir()
    (sd / "train.txt").write_text("\n".join(lines) + "\n")

    ds = WIDERFace(sd / "train.txt", templates=np.zeros((3, 5)),
                   dataset_root=tmp_path, split="train", seed=0)
    loader = PrefetchLoader(ds, batch_size=2, workers=2, shuffle=False,
                            pack="jpegdct")
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["dct_wire"].shape == (2, wire_total_bytes())
    assert b["aug_scale"].shape == (2,) and b["aug_off"].shape == (2, 2)
    # decode cache populated: second epoch hits it
    assert len(ds._dct_cache._store) == 4
    out = device_augment_dct(
        {k: b[k] for k in ("dct_wire", "aug_scale", "aug_off",
                           "paste_box", "flip")},
        ds.cfg)
    assert out.shape == (2, *ds.cfg.input_size, 3)
    assert np.isfinite(np.asarray(out)).all()
