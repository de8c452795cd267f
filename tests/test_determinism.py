"""Data-path determinism under threaded loading.

Regression for the round-1 defect where WIDERFace.__getitem__ mutated one
shared np.random.Generator from PrefetchLoader's worker pool (thread-unsafe:
silent nondeterminism + correlated augmentation draws). The fix derives a
per-sample Generator from SeedSequence((seed, epoch, index)) — the same
scheme the C++ engine uses — so batches are a pure function of those ints.
Reference anchor: SURVEY §7 explicit-PRNG discipline.
"""

import numpy as np
import pytest
from PIL import Image

from tinyfaces_tpu.config import DetectorConfig
from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.data.loader import PrefetchLoader
from tinyfaces_tpu.data.wider_face import WIDERFace


@pytest.fixture(scope="module")
def wider_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("wider_det")
    rng = np.random.default_rng(7)
    d = root / "WIDER_train" / "images" / "0--Ev"
    d.mkdir(parents=True)
    ann = []
    for i in range(12):
        h, w = int(rng.integers(120, 220)), int(rng.integers(140, 240))
        img = rng.integers(0, 200, (h, w, 3), dtype=np.uint8)
        x, y, bw, bh = 10, 12, 40, 36
        img[y : y + bh, x : x + bw] = 255
        Image.fromarray(img).save(d / f"im{i}.jpg")
        ann += [f"0--Ev/im{i}.jpg", "1", f"{x} {y} {bw} {bh} 0 0 0 0 0 0"]
    gt = root / "train.txt"
    gt.write_text("\n".join(ann) + "\n")
    return root, gt


def _make_loader(wider_tree, seed=3, workers=8):
    root, gt = wider_tree
    cfg = DetectorConfig(input_size=(96, 96), max_gt=8)
    ds = WIDERFace(gt, load_templates(), cfg=cfg, dataset_root=root,
                   split="train", seed=seed)
    return PrefetchLoader(ds, batch_size=4, workers=workers, shuffle=True,
                          seed=seed)


def _epochs(loader, n=2):
    out = []
    for _ in range(n):
        out.append(list(loader))
    return out


def test_same_seed_loaders_identical_under_threads(wider_tree):
    """Two same-seed loaders, 8 worker threads each, must produce byte-
    identical batches across two epochs."""
    a = _epochs(_make_loader(wider_tree, workers=8))
    b = _epochs(_make_loader(wider_tree, workers=8))
    for ea, eb in zip(a, b):
        assert len(ea) == len(eb)
        for ba, bb in zip(ea, eb):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_worker_count_does_not_change_batches(wider_tree):
    """Determinism must not depend on thread scheduling: 1 worker == 8."""
    a = list(_make_loader(wider_tree, workers=1))
    b = list(_make_loader(wider_tree, workers=8))
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["image"], bb["image"])
        np.testing.assert_array_equal(ba["gt_boxes"], bb["gt_boxes"])


def test_epochs_draw_fresh_augmentations(wider_tree):
    """set_epoch rebases the augmentation stream: epoch 0 != epoch 1."""
    e0, e1 = _epochs(_make_loader(wider_tree))
    same = all(
        np.array_equal(b0["image"], b1["image"]) for b0, b1 in zip(e0, e1)
    )
    assert not same


def test_fresh_loader_per_epoch_matches_trainer_usage(wider_tree):
    """Trainer builds a NEW loader each epoch with epoch=N: epoch 1's
    batches must differ from epoch 0's (fresh augmentations) while a second
    epoch-1 loader reproduces them exactly."""
    root, gt = wider_tree
    cfg = DetectorConfig(input_size=(96, 96), max_gt=8)

    def one_epoch(epoch):
        ds = WIDERFace(gt, load_templates(), cfg=cfg, dataset_root=root,
                       split="train", seed=5)
        return list(PrefetchLoader(ds, batch_size=4, workers=4, shuffle=True,
                                   seed=5, epoch=epoch))

    e0, e1, e1b = one_epoch(0), one_epoch(1), one_epoch(1)
    assert not all(
        np.array_equal(a["image"], b["image"]) for a, b in zip(e0, e1)
    )
    for a, b in zip(e1, e1b):
        np.testing.assert_array_equal(a["image"], b["image"])


def test_sample_rng_pure_function_of_seed_epoch_index(wider_tree):
    root, gt = wider_tree
    ds = WIDERFace(gt, load_templates(), cfg=DetectorConfig(input_size=(96, 96), max_gt=8),
                   dataset_root=root, split="train", seed=11)
    a = ds.sample_rng(3).random(4)
    b = ds.sample_rng(3).random(4)
    np.testing.assert_array_equal(a, b)
    ds.set_epoch(1)
    c = ds.sample_rng(3).random(4)
    assert not np.array_equal(a, c)
