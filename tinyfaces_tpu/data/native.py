"""ctypes bindings for the native C++ augmentation engine (native/).

`native_augment_batch` is a drop-in producer of the same per-sample dict
the Python path builds (wider_face.augment_sample), but runs the whole
augmentation chain in C++ threads outside the GIL. The library is built
on demand with `make -C native`; callers fall back to the Python path when
the toolchain or library is unavailable (`is_available()`).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from tinyfaces_tpu.data import overflow

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libtinyfaces_native.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


_ABI_VERSION = 7


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        lib = None
        if _LIB_PATH.exists():
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.tf_version.restype = ctypes.c_int
            if lib.tf_version() != _ABI_VERSION:
                # Stale build from an older source revision: rebuild. (The
                # old handle stays mapped this process, so load the fresh
                # build under an unambiguous dlopen of the new inode.)
                lib = None
                _LIB_PATH.unlink()
        if lib is None:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.tf_version.restype = ctypes.c_int
            assert lib.tf_version() == _ABI_VERSION
        lib.tf_augment_sample.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,  # img, h, w
            ctypes.c_void_p, ctypes.c_int,  # boxes, n_boxes
            ctypes.c_int, ctypes.c_int,  # input_h, input_w
            ctypes.c_float,  # neg_thresh
            ctypes.c_int,  # max_gt
            ctypes.c_uint64,  # seed
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # outputs
        ]
        lib.tf_augment_batch.argtypes = [
            ctypes.c_int,  # batch
            ctypes.POINTER(ctypes.c_void_p),  # imgs
            ctypes.POINTER(ctypes.c_int),  # hs
            ctypes.POINTER(ctypes.c_int),  # ws
            ctypes.POINTER(ctypes.c_void_p),  # boxes
            ctypes.POINTER(ctypes.c_int),  # n_boxes
            ctypes.c_int, ctypes.c_int,  # input_h, input_w
            ctypes.c_float,  # neg_thresh
            ctypes.c_int,  # max_gt
            ctypes.c_uint64,  # seed
            ctypes.c_int,  # n_threads
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # outputs
        ]
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def is_available() -> bool:
    return _load() is not None


def native_augment_sample(
    image: np.ndarray,  # (H, W, 3) uint8
    boxes: np.ndarray,  # (N, 4) float32
    input_size: tuple[int, int],
    neg_thresh: float,
    max_gt: int,
    seed: int,
) -> dict:
    """Augment ONE sample in C++ (GIL released for the call's duration —
    callers run this from worker threads so decode and augment pipeline)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native augmentation library unavailable")

    image = np.ascontiguousarray(image, np.uint8)
    boxes = np.ascontiguousarray(boxes, np.float32).reshape(-1, 4)
    ih, iw = input_size

    out_canvas = np.empty((ih, iw, 3), np.uint8)
    out_gt = np.empty((max_gt, 4), np.float32)
    out_valid = np.empty((max_gt,), np.uint8)
    out_paste = np.empty((4,), np.float32)
    out_flip = np.empty((1,), np.uint8)
    out_n_kept = np.empty((1,), np.int32)

    lib.tf_augment_sample(
        image.ctypes.data_as(ctypes.c_void_p), image.shape[0], image.shape[1],
        boxes.ctypes.data_as(ctypes.c_void_p), boxes.shape[0],
        ih, iw, ctypes.c_float(neg_thresh), max_gt, ctypes.c_uint64(seed),
        out_canvas.ctypes.data_as(ctypes.c_void_p),
        out_gt.ctypes.data_as(ctypes.c_void_p),
        out_valid.ctypes.data_as(ctypes.c_void_p),
        out_paste.ctypes.data_as(ctypes.c_void_p),
        out_flip.ctypes.data_as(ctypes.c_void_p),
        out_n_kept.ctypes.data_as(ctypes.c_void_p),
    )
    overflow.record(int(out_n_kept[0]), max_gt)
    return {
        "image": out_canvas,
        "gt_boxes": out_gt,
        "gt_valid": out_valid.astype(bool),
        "paste_box": out_paste,
        "flip": bool(out_flip[0]),
    }


def native_augment_batch(
    images: Sequence[np.ndarray],  # list of (H, W, 3) uint8, C-contiguous
    boxes: Sequence[np.ndarray],  # list of (N, 4) float32 corner boxes
    input_size: tuple[int, int],
    neg_thresh: float,
    max_gt: int,
    seed: int,
    n_threads: int = 8,
) -> dict:
    """Augment a batch in C++; returns the standard training batch dict."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native augmentation library unavailable")

    b = len(images)
    ih, iw = input_size

    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    boxes = [np.ascontiguousarray(bx, np.float32).reshape(-1, 4) for bx in boxes]

    img_ptrs = (ctypes.c_void_p * b)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images]
    )
    box_ptrs = (ctypes.c_void_p * b)(
        *[bx.ctypes.data_as(ctypes.c_void_p).value for bx in boxes]
    )
    hs = (ctypes.c_int * b)(*[im.shape[0] for im in images])
    ws = (ctypes.c_int * b)(*[im.shape[1] for im in images])
    nb = (ctypes.c_int * b)(*[bx.shape[0] for bx in boxes])

    out_canvas = np.empty((b, ih, iw, 3), np.uint8)
    out_gt = np.empty((b, max_gt, 4), np.float32)
    out_valid = np.empty((b, max_gt), np.uint8)
    out_paste = np.empty((b, 4), np.float32)
    out_flip = np.empty((b,), np.uint8)
    out_n_kept = np.empty((b,), np.int32)

    lib.tf_augment_batch(
        b, img_ptrs, hs, ws, box_ptrs, nb,
        ih, iw, ctypes.c_float(neg_thresh), max_gt,
        ctypes.c_uint64(seed), n_threads,
        out_canvas.ctypes.data_as(ctypes.c_void_p),
        out_gt.ctypes.data_as(ctypes.c_void_p),
        out_valid.ctypes.data_as(ctypes.c_void_p),
        out_paste.ctypes.data_as(ctypes.c_void_p),
        out_flip.ctypes.data_as(ctypes.c_void_p),
        out_n_kept.ctypes.data_as(ctypes.c_void_p),
    )

    for n in out_n_kept:
        overflow.record(int(n), max_gt)
    return {
        "image": out_canvas,
        "gt_boxes": out_gt,
        "gt_valid": out_valid.astype(bool),
        "paste_box": out_paste,
        "flip": out_flip.astype(bool),
    }
