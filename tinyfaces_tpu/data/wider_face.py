"""WIDER Face dataset: annotation parsing + host-side augmentation.

Capability parity with the reference dataset (tinyfaces/datasets/
wider_face.py:65-121 parsing, :133-192 augmentation pipeline, and
processor.py:41-112 crop/paste). The split of work is TPU-first:

  host (this file): JPEG decode, random resize (x0.5 / x1 / x2), random
      500x500 crop pasted at a random offset onto an ImageNet-mean canvas,
      overlap-based GT filtering, horizontal flip — all cheap uint8/NumPy
      work producing fixed-shape batches;
  device (ops/assignment.py): dense-IoU GT assignment and heatmap/regression
      target generation — the reference's Python hot loop — as jitted XLA.

Each sample yields:
  image     (H, W, 3) uint8
  gt_boxes  (MAX_GT, 4) float32, zero-padded
  gt_valid  (MAX_GT,) bool
  paste_box (4,) float32 — where the crop landed (for the border mask)
  flip      () bool — whether the sample was mirrored

Annotation format notes (wider_face.py:65-121): header line is the image
path, then a count, then `x y w h blur expression illumination invalid
occlusion pose` rows; all fields abs()'d; zero-w/h boxes dropped; (x,y,w,h)
-> (x1,y1,x2,y2) with the -1 MATLAB convention. A count of 0 is followed by
one placeholder row. The test split is a bare file list.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator, List, NamedTuple, Optional

import numpy as np

from tinyfaces_tpu.config import IMAGENET_MEAN, DetectorConfig

try:  # Pillow is only needed for real-image IO, not for synthetic tests.
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


@dataclasses.dataclass
class WiderSample:
    img_path: str
    bboxes: np.ndarray  # (N, 4) x1, y1, x2, y2 (MATLAB 1-indexed convention)
    attrs: Optional[dict] = None  # blur/expression/illumination/invalid/occlusion/pose


def parse_wider_annotations(path: str | Path, split: str = "train") -> List[WiderSample]:
    """Parse a WIDER bbx_gt annotation file (or test filelist)."""
    lines = Path(path).read_text().splitlines()

    if split == "test":
        return [WiderSample(l.strip(), np.zeros((0, 4), np.float64)) for l in lines if l.strip()]

    samples: List[WiderSample] = []
    i = 0
    while i < len(lines):
        img_path = lines[i].strip()
        i += 1
        count = int(lines[i].strip())
        i += 1

        rows = np.zeros((count, 10), np.float64)
        if count == 0:
            i += 1  # placeholder row
        else:
            for b in range(count):
                rows[b] = [abs(float(v)) for v in lines[i].split()]
                i += 1

        # Drop degenerate boxes, convert to corner form with -1 (MATLAB).
        rows = rows[(rows[:, 2] != 0) & (rows[:, 3] != 0)]
        boxes = rows[:, :4].copy()
        boxes[:, 2] = boxes[:, 0] + boxes[:, 2] - 1
        boxes[:, 3] = boxes[:, 1] + boxes[:, 3] - 1

        attrs = {
            "blur": rows[:, 4],
            "expression": rows[:, 5],
            "illumination": rows[:, 6],
            "invalid": rows[:, 7],
            "occlusion": rows[:, 8],
            "pose": rows[:, 9],
        }
        samples.append(WiderSample(img_path, boxes, attrs))
    return samples


def _rect_dist_np(clipped: np.ndarray, original: np.ndarray) -> np.ndarray:
    """Host-side rowwise 1-IoU (+1 convention) for crop filtering."""
    ai = (clipped[:, 2] - clipped[:, 0] + 1) * (clipped[:, 3] - clipped[:, 1] + 1)
    aj = (original[:, 2] - original[:, 0] + 1) * (original[:, 3] - original[:, 1] + 1)
    x1 = np.maximum(clipped[:, 0], original[:, 0])
    y1 = np.maximum(clipped[:, 1], original[:, 1])
    x2 = np.minimum(clipped[:, 2], original[:, 2])
    y2 = np.minimum(clipped[:, 3], original[:, 3])
    inter = (x2 - x1 + 1) * (y2 - y1 + 1) * ((x2 > x1) & (y2 > y1))
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = inter / (ai + aj - inter)
    iou = np.nan_to_num(iou, nan=0.0, posinf=0.0, neginf=0.0)
    return np.clip(1.0 - iou, 0.0, 1.0)


MEAN_PIXEL = tuple(int(m * 255) for m in IMAGENET_MEAN)  # (123, 116, 103)


def _crop_params_and_boxes(
    shape_hw: tuple[int, int],
    bboxes: np.ndarray,  # (N, 4)
    input_size: tuple[int, int],
    neg_thresh: float,
    rng: np.random.Generator,
):
    """The RNG draws + box math of crop_and_paste, without touching pixels.

    Shared by the host pixel path (crop_and_paste) and the jpegdct train
    wire (data/dct_train.py), which performs the pixel crop/paste on
    device — both consume identical draws so the augmentation geometry is
    bit-identical across wires.
    """
    ih, iw = input_size
    crop_x1 = int(rng.integers(0, max(1, shape_hw[1] - iw + 1)))
    crop_y1 = int(rng.integers(0, max(1, shape_hw[0] - ih + 1)))
    crop_x2 = min(shape_hw[1], crop_x1 + iw)
    crop_y2 = min(shape_hw[0], crop_y1 + ih)
    ch, cw = crop_y2 - crop_y1, crop_x2 - crop_x1

    px = int(rng.integers(0, iw - cw + 1))
    py = int(rng.integers(0, ih - ch + 1))
    paste_box = np.array([px, py, px + cw, py + ch], np.float32)

    if bboxes.shape[0] > 0:
        clipped = bboxes.copy()
        clipped[:, 0] = np.maximum(clipped[:, 0], crop_x1)
        clipped[:, 1] = np.maximum(clipped[:, 1], crop_y1)
        clipped[:, 2] = np.minimum(clipped[:, 2], crop_x2)
        clipped[:, 3] = np.minimum(clipped[:, 3], crop_y2)
        overlap = 1.0 - _rect_dist_np(clipped, bboxes)

        out = bboxes.copy()
        out[:, [0, 2]] += px - crop_x1
        out[:, [1, 3]] += py - crop_y1
        out[:, 0] = np.clip(out[:, 0], 0, iw)
        out[:, 1] = np.clip(out[:, 1], 0, ih)
        out[:, 2] = np.clip(out[:, 2], 1, iw)
        out[:, 3] = np.clip(out[:, 3], 1, ih)

        good = (out[:, 2] > out[:, 0]) & (out[:, 3] > out[:, 1]) & (overlap >= neg_thresh)
        bboxes = out[good]

    return bboxes, paste_box, (crop_y1, crop_x1, ch, cw, py, px)


def crop_and_paste(
    img: np.ndarray,  # (H, W, 3) uint8
    bboxes: np.ndarray,  # (N, 4)
    input_size: tuple[int, int],
    neg_thresh: float,
    rng: np.random.Generator,
):
    """Random crop of `input_size`, pasted at a random offset onto a canvas
    prefilled with the ImageNet mean pixel (processor.py:41-112).

    Boxes are shifted into canvas coordinates, clipped, and dropped when the
    clipped box retains < neg_thresh IoU with the original.
    """
    ih, iw = input_size
    bboxes, paste_box, (cy, cx, ch, cw, py, px) = _crop_params_and_boxes(
        img.shape[:2], bboxes, input_size, neg_thresh, rng
    )
    canvas = np.empty((ih, iw, 3), np.uint8)
    canvas[:] = MEAN_PIXEL
    canvas[py : py + ch, px : px + cw] = img[cy : cy + ch, cx : cx + cw]
    return canvas, bboxes, paste_box


class AugDraws(NamedTuple):
    """All RNG outcomes of one train-time augmentation, pixel-free.

    scale_id: 0 = x0.5, 1 = x1, 2 = x2 (reference wider_face.py:133-143).
    crop/paste coords are in RESIZED-image coordinates; (rh, rw) are the
    resized dims the crop was drawn on; (src_h, src_w) the original dims.
    """

    scale_id: int
    crop_y1: int
    crop_x1: int
    ch: int
    cw: int
    py: int
    px: int
    flip: bool
    rh: int
    rw: int
    src_h: int
    src_w: int


def augment_draws(
    shape_hw: tuple[int, int],
    bboxes: np.ndarray,
    cfg: DetectorConfig,
    rng: np.random.Generator,
):
    """RNG draws + GT box pipeline of the full train augmentation, without
    decoding or touching pixels (reference wider_face.py:133-165).

    Returns (AugDraws, gt (max_gt,4), gt_valid (max_gt,), paste_box (4,)).
    augment_sample applies the pixel ops on the host; the jpegdct train
    wire (data/dct_train.py + data/targets.py) applies them on device —
    both consume this function, so boxes/paste/flip are bit-identical
    across wire formats and only pixel filtering differs.
    """
    h, w = int(shape_hw[0]), int(shape_hw[1])
    r = rng.random()
    if r < 1 / 3 and min(h, w) >= 2:
        scale_id, rh, rw = 0, int(0.5 * h), int(0.5 * w)
        bboxes = bboxes / 2.0
    elif r > 2 / 3:
        scale_id, rh, rw = 2, 2 * h, 2 * w
        bboxes = bboxes * 2.0
    else:
        scale_id, rh, rw = 1, h, w

    bboxes, paste_box, (cy, cx, ch, cw, py, px) = _crop_params_and_boxes(
        (rh, rw), bboxes, cfg.input_size, cfg.neg_thresh, rng
    )

    flip = bool(rng.random() > 0.5)
    if flip and bboxes.shape[0] > 0:
        x1 = bboxes[:, 0].copy()
        x2 = bboxes[:, 2].copy()
        # MATLAB-indexing-aware mirror (wider_face.py:160-163).
        bboxes[:, 0] = cfg.input_size[1] - x2 + 1
        bboxes[:, 2] = cfg.input_size[1] - x1 + 1

    # Pad GT to the static bound; truncation is counted, never silent
    # (the reference handles unbounded counts, processor.py:213-277).
    from tinyfaces_tpu.data import overflow

    overflow.record(bboxes.shape[0], cfg.max_gt)
    n = min(bboxes.shape[0], cfg.max_gt)
    gt = np.zeros((cfg.max_gt, 4), np.float32)
    gt[:n] = bboxes[:n]
    gt_valid = np.zeros(cfg.max_gt, bool)
    gt_valid[:n] = True

    draws = AugDraws(scale_id, cy, cx, ch, cw, py, px, flip, rh, rw, h, w)
    return draws, gt, gt_valid, paste_box


def augment_sample(
    img: np.ndarray,  # (H, W, 3) uint8 decoded image
    bboxes: np.ndarray,
    cfg: DetectorConfig,
    rng: np.random.Generator,
):
    """Full reference train-time augmentation for one sample
    (wider_face.py:133-165): random x0.5/x1/x2 resize, crop/paste, flip."""
    d, gt, gt_valid, paste_box = augment_draws(img.shape[:2], bboxes, cfg, rng)

    if d.scale_id != 1:
        img = _resize_uint8(img, (d.rh, d.rw))

    ih, iw = cfg.input_size
    canvas = np.empty((ih, iw, 3), np.uint8)
    canvas[:] = MEAN_PIXEL
    canvas[d.py : d.py + d.ch, d.px : d.px + d.cw] = img[
        d.crop_y1 : d.crop_y1 + d.ch, d.crop_x1 : d.crop_x1 + d.cw
    ]
    if d.flip:
        canvas = canvas[:, ::-1].copy()

    return canvas, gt, gt_valid, paste_box, d.flip


def _resize_uint8(img: np.ndarray, new_hw: tuple[int, int]) -> np.ndarray:
    if Image is not None:
        pil = Image.fromarray(img)
        return np.asarray(pil.resize((new_hw[1], new_hw[0]), Image.BILINEAR))
    # NumPy nearest-neighbor fallback (tests without Pillow).
    ys = (np.arange(new_hw[0]) * img.shape[0] / new_hw[0]).astype(int)
    xs = (np.arange(new_hw[1]) * img.shape[1] / new_hw[1]).astype(int)
    return img[ys][:, xs]


class WIDERFace:
    """Dataset over a WIDER annotation file.

    split="train": __getitem__ returns the augmented fixed-shape sample dict.
    split="val"/"test": returns (decoded uint8 image, img_path).
    """

    def __init__(
        self,
        path: str | Path,
        templates: np.ndarray,
        cfg: DetectorConfig | None = None,
        dataset_root: str | Path = "",
        split: str = "train",
        seed: int = 0,
        debug: bool = False,
    ):
        self.cfg = cfg or DetectorConfig()
        self.split = split
        self.templates = templates
        self.dataset_root = Path(dataset_root)
        self.samples = parse_wider_annotations(path, split)
        self.seed = seed
        self.epoch = 0
        # Shuffle-only generator for iter_batches (single-threaded use).
        self.rng = np.random.default_rng(seed)
        self.debug = debug

    def set_epoch(self, epoch: int) -> None:
        """Advance the augmentation stream: per-sample generators are derived
        from (seed, epoch, index), so each epoch draws fresh augmentations
        while any (seed, epoch) pair is exactly reproducible."""
        self.epoch = int(epoch)

    def sample_rng(self, idx: int) -> np.random.Generator:
        """Thread-safe per-sample generator (SURVEY §7 PRNG discipline).

        np.random.Generator is NOT thread-safe; a shared generator mutated
        from PrefetchLoader's worker pool gives nondeterministic, correlated
        draws. Deriving a fresh generator from SeedSequence((seed, epoch,
        idx)) makes every sample's augmentation an independent pure function
        of those three ints — the same scheme the C++ engine uses
        (native/tinyfaces_native.cpp per-sample seeds)."""
        return np.random.default_rng(
            np.random.SeedSequence((self.seed, self.epoch, idx))
        )

    def __len__(self) -> int:
        return len(self.samples)

    def image_path(self, idx: int) -> Path:
        return (
            self.dataset_root
            / f"WIDER_{self.split}"
            / "images"
            / self.samples[idx].img_path
        )

    def _decode(self, idx: int) -> np.ndarray:
        if Image is None:  # pragma: no cover
            raise RuntimeError("Pillow required for image decoding")
        with Image.open(self.image_path(idx)) as im:
            return np.asarray(im.convert("RGB"))

    def get_dct(self, idx: int):
        """(raw JPEG bytes | DCTImage, img_path) for the jpegdct wire
        format — no pixel decode on the host at all (the reference decodes
        fully on the host, wider_face.py:197-199). Baseline-4:2:0 and
        grayscale files stay raw bytes: the fused C++ entropy-decode +
        pack runs at batch-pack time (pack_dct_batch). Other streams are
        entropy-decoded here (with PIL transcode fallback)."""
        from tinyfaces_tpu.data.jpegdct import jpeg_dims, parse_jpeg_dct

        data = self.image_path(idx).read_bytes()
        if jpeg_dims(data) is not None:
            return data, self.samples[idx].img_path
        return parse_jpeg_dct(data), self.samples[idx].img_path

    def getitem_train_dct(self, idx: int) -> dict:
        """Train sample on the jpegdct wire (data/dct_train.py): ships DCT
        coefficients of the augmentation source region; pixels never decode
        on the host. Entropy-decoded coefficients are cached per process
        (decode is deterministic; augmentation draws are not), so epochs
        after the first cost only the coefficient crop + pack."""
        from tinyfaces_tpu.data import dct_train

        if not hasattr(self, "_dct_cache"):
            self._dct_cache = dct_train.CoefCache()
        sample = self.samples[idx]
        dct = self._dct_cache.get(
            idx, lambda: dct_train.decode_dct(self.image_path(idx).read_bytes())
        )
        return dct_train.train_item_dct(
            dct, sample.bboxes.copy(), self.cfg, self.sample_rng(idx)
        )

    def get_all_bboxes(self) -> np.ndarray:
        """All train GT boxes — input to offline template clustering
        (reference wider_face.py:123-128)."""
        if not self.samples:
            return np.zeros((0, 4))
        return np.concatenate([s.bboxes for s in self.samples], axis=0)

    def __getitem__(self, idx: int):
        sample = self.samples[idx]
        if self.split == "train":
            img = self._decode(idx)
            canvas, gt, gt_valid, paste_box, flip = augment_sample(
                img, sample.bboxes.copy(), self.cfg, self.sample_rng(idx)
            )
            return {
                "image": canvas,
                "gt_boxes": gt,
                "gt_valid": gt_valid,
                "paste_box": paste_box,
                "flip": flip,
            }
        return self._decode(idx), sample.img_path

    def iter_batches(self, batch_size: int, shuffle: bool = True) -> Iterator[dict]:
        """Host-side batching into device-ready stacked arrays."""
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(i)] for i in order[start : start + batch_size]]
            yield {
                "image": np.stack([it["image"] for it in items]),
                "gt_boxes": np.stack([it["gt_boxes"] for it in items]),
                "gt_valid": np.stack([it["gt_valid"] for it in items]),
                "paste_box": np.stack([it["paste_box"] for it in items]),
                "flip": np.array([it["flip"] for it in items]),
            }
