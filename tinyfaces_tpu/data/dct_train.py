"""Host side of the jpegdct TRAIN wire: ship entropy-decoded DCT
coefficients of just the augmentation source region; the device decodes
(dequant + IDCT + chroma upsample) and applies resize/crop/paste/flip
(data/targets.device_augment_dct).

Why: training is host-CPU bound on this 1-core host — the yuv420 wire
spends ~30 ms/img on PIL full decode + resize + paste (TRAIN_SOAK r4:
27 img/s e2e vs the 98 img/s device-step ceiling; the reference does
the same work in 8 DataLoader worker processes, datasets/__init__.py:
46-50 + wider_face.py:133-165). This wire keeps only the sequential
JPEG entropy decode on the host (C++ native/jpeg_dct.cpp, once per
image per process thanks to the coefficient cache) plus a block-aligned
coefficient crop + pack; every pixel op moves onto the TPU where it
fuses into the train step.

Geometry is bit-identical to the host path: both consume
wider_face.augment_draws, so GT boxes / paste_box / flip match the rgb
and yuv420 wires exactly. Pixel values differ only by (a) the lossy
coefficient budget of the wire (same bound as eval, tests/test_jpegdct),
(b) float vs uint8-quantized intermediates, and (c) edge-clamp behavior
of the device resize filters at image borders (1-px effects). The
resize filters themselves replicate PIL BILINEAR's triangle kernels for
exact x0.5 / x2 factors (see targets._pil_downscale2/_pil_upscale2).

Region layout: a sample's crop needs source pixels [a0, a0 + extent)
where extent <= 2*input + filter margin (the x0.5 branch dominates:
2*500 + margins). One static region TRAIN_REGION=1024 (multiple of 16:
4:2:0 chroma blocks cover 16 luma px) covers every branch; the anchor
a0 is 16-aligned so luma and chroma grids crop cleanly. Per-scale slice
offsets within the (possibly half-res or upsampled) region ride in
aug_off; proofs of the offset bounds are in region_anchor's docstring.
"""

from __future__ import annotations

import os
import threading

import numpy as np

from tinyfaces_tpu.config import DetectorConfig
from tinyfaces_tpu.data.jpegdct import (
    DCTImage,
    pack_dct_batch,
    parse_jpeg_dct,
    wire_layout,
)
from tinyfaces_tpu.data.wider_face import AugDraws, augment_draws

# Static source-region canvas (px, square, multiple of 16). 1024 covers
# the worst case: x0.5 scale needs 2*500 source px + 2 px filter margin
# + 15 px alignment slack = 1017.
TRAIN_REGION = 1024


def wire_total_bytes(region: int = TRAIN_REGION) -> int:
    return wire_layout(region, region)["__total__"]


def upsample_src(input_size: int) -> int:
    """Static side of the x2-branch source slice: out rows [cy, cy+ih)
    of the 2x-upsampled image need source rows up to
    floor((cy + ih - 1)/2) + 1 - a0y <= aug_off/2 + ih/2 + 2 where
    aug_off <= 34 (region_anchor), so ih/2 + 19 -> round up to 16."""
    need = input_size // 2 + 19
    return ((need + 15) // 16) * 16


def region_anchor(d: AugDraws) -> tuple[int, int, int, int]:
    """(a0y, a0x, off_y, off_x): 16-aligned source-region origin and the
    per-scale slice offset the device applies.

    scale 1 : a0 = 16*floor(c/16);            off = c - a0        in [0, 16)
    scale .5: a0 = max(0, 16*floor((2c-2)/16)); off = c - a0/2    in [0, 9)
              (a0 even => off integer; a0 <= 2c-2 gives the 1-row top
               margin the 4-tap downscale filter reads, except at c=0
               where PIL clamps at the true image edge and a0=0 clamps
               identically)
    scale 2 : a0 = max(0, 16*floor((c/2-1)/16)); off = c - 2*a0   in [0, 35)
              (2x-upsampling the region reproduces resized rows
               [2*a0, ...); the 0.25-weight tap at c=0 clamps at the
               image edge on both paths)
    """
    cy, cx = d.crop_y1, d.crop_x1
    if d.scale_id == 1:
        a0y, a0x = (cy // 16) * 16, (cx // 16) * 16
        return a0y, a0x, cy - a0y, cx - a0x
    if d.scale_id == 0:
        a0y = max(0, ((2 * cy - 2) // 16) * 16)
        a0x = max(0, ((2 * cx - 2) // 16) * 16)
        return a0y, a0x, cy - a0y // 2, cx - a0x // 2
    a0y = max(0, ((cy // 2 - 1) // 16) * 16)
    a0x = max(0, ((cx // 2 - 1) // 16) * 16)
    return a0y, a0x, cy - 2 * a0y, cx - 2 * a0x


def crop_coef_region(dct: DCTImage, a0y: int, a0x: int,
                     region: int = TRAIN_REGION) -> DCTImage:
    """Block-aligned coefficient crop: luma blocks [a0/8, a0/8 + region/8),
    chroma [a0/16, ...). Blocks past the image extent are absent from the
    sliced arrays; pack_dct_batch neutral-fills them (the MEAN_PIXEL
    canvas value), matching the host path's canvas prefill."""
    nb, nbc = region // 8, region // 16
    by, bx = a0y // 8, a0x // 8
    cy, cx = a0y // 16, a0x // 16
    return DCTImage(
        h=max(0, min(region, dct.h - a0y)),
        w=max(0, min(region, dct.w - a0x)),
        y=dct.y[by:by + nb, bx:bx + nb],
        cb=None if dct.cb is None else dct.cb[cy:cy + nbc, cx:cx + nbc],
        cr=None if dct.cr is None else dct.cr[cy:cy + nbc, cx:cx + nbc],
        qy=dct.qy, qc=dct.qc,
    )


def train_item_dct(dct: DCTImage, bboxes: np.ndarray, cfg: DetectorConfig,
                   rng: np.random.Generator) -> dict:
    """One training sample on the jpegdct wire. Same keys as the rgb path
    plus the wire + device-augmentation params instead of pixels."""
    d, gt, gt_valid, paste_box = augment_draws((dct.h, dct.w), bboxes, cfg, rng)
    a0y, a0x, offy, offx = region_anchor(d)
    wire = pack_dct_batch([crop_coef_region(dct, a0y, a0x)],
                          TRAIN_REGION, TRAIN_REGION)
    return {
        "dct_wire": wire["_wire"][0],
        "gt_boxes": gt,
        "gt_valid": gt_valid,
        "paste_box": paste_box,
        "flip": d.flip,
        "aug_scale": np.int32(d.scale_id),
        "aug_off": np.array([offy, offx], np.int32),
    }


class CoefCache:
    """Entropy-decoded coefficient cache: JPEG entropy decode is the one
    sequential, non-offloadable host cost of this wire (~17 ms/img) and is
    a pure function of the file — decode once per process, reuse every
    epoch. Capped by TINYFACES_DCT_CACHE_GB (default 32; a 12.9k-image
    WIDER train tree is ~28 GB of int16 coefficients, this host has 125 GB).
    Thread-safe for PrefetchLoader's worker pool."""

    def __init__(self) -> None:
        self.cap = int(float(os.environ.get("TINYFACES_DCT_CACHE_GB", "32"))
                       * (1 << 30))
        self._store: dict = {}
        self._bytes = 0
        self._lock = threading.Lock()

    def get(self, key, loader) -> DCTImage:
        with self._lock:
            hit = self._store.get(key)
        if hit is not None:
            return hit
        dct = loader()
        nbytes = dct.y.nbytes + sum(
            p.nbytes for p in (dct.cb, dct.cr) if p is not None)
        with self._lock:
            if self._bytes + nbytes <= self.cap and key not in self._store:
                self._store[key] = dct
                self._bytes += nbytes
        return dct


def decode_dct(data: bytes) -> DCTImage:
    """Raw JPEG bytes -> coefficient planes (native entropy decoder, with
    PIL-transcode fallback for exotic streams — data/jpegdct.py)."""
    return parse_jpeg_dct(data)
