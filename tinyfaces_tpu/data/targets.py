"""Device-side batch preparation: normalization + GT target heatmaps.

This replaces the per-sample Python work the reference performs inside its
8 DataLoader worker processes (wider_face.py:167-192 -> processor.py
get_padding/get_heatmaps) with ONE jitted, vmapped XLA program per batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tinyfaces_tpu.config import IMAGENET_MEAN, IMAGENET_STD, DetectorConfig
from tinyfaces_tpu.ops.assignment import assign_targets, compute_pad_mask


def normalize_images(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (B, H, W, 3) -> normalized float (ToTensor + ImageNet Normalize,
    reference main.py:44-46)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    x = images_u8.astype(dtype) / 255.0
    return (x - mean) / std


def rgb_to_yuv420(images_u8) -> tuple:
    """Host-side pack: (B, H, W, 3) uint8 RGB -> planar JPEG-style YCbCr
    4:2:0 — (B, H, W) Y, (B, H/2, W/2) U, V, all uint8. H and W must be
    even (shape buckets are multiples of 64).

    This is the TPU-native input wire format: JPEG already stores YCbCr
    with subsampled chroma, so shipping Y + quarter-size U/V (1.5 B/px
    instead of 3) halves H2D bytes while the device performs the colorspace
    conversion fused into the pyramid program (docs/PERF.md round-2: the
    remote link, not compute, bounds e2e throughput). Uses PIL's C-speed
    BT.601 full-range converter; chroma is 2x2 box-averaged.
    """
    import numpy as np
    from PIL import Image

    b, h, w, _ = images_u8.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    y = np.empty((b, h, w), np.uint8)
    u = np.empty((b, h // 2, w // 2), np.uint8)
    v = np.empty((b, h // 2, w // 2), np.uint8)
    for i in range(b):
        ycc = np.asarray(Image.fromarray(images_u8[i]).convert("YCbCr"))
        y[i] = ycc[..., 0]
        u[i] = (ycc[..., 1].reshape(h // 2, 2, w // 2, 2).mean((1, 3)) + 0.5).astype(np.uint8)
        v[i] = (ycc[..., 2].reshape(h // 2, 2, w // 2, 2).mean((1, 3)) + 0.5).astype(np.uint8)
    return y, u, v


def yuv420_to_normalized(y, u, v, dtype=jnp.float32) -> jnp.ndarray:
    """Device-side unpack: planar 4:2:0 uint8 -> normalized float RGB
    (B, H, W, 3), numerically equivalent to normalize_images(rgb) up to the
    chroma subsampling loss (~<=2/255 per channel on natural images).

    Inverse BT.601 full-range (JPEG/JFIF), nearest chroma upsample, clamped
    to [0, 1] like an RGB decode would be, then ImageNet normalization —
    all elementwise, fused by XLA into the consuming program.
    """
    yf = y.astype(dtype)
    uf = jnp.repeat(jnp.repeat(u.astype(dtype), 2, axis=-2), 2, axis=-1) - 128.0
    vf = jnp.repeat(jnp.repeat(v.astype(dtype), 2, axis=-2), 2, axis=-1) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    x = jnp.clip(jnp.stack([r, g, b], axis=-1) / 255.0, 0.0, 1.0)
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    return (x - mean) / std


@partial(jax.jit, static_argnames=("cfg",))
def build_targets(
    batch: dict,
    templates: jnp.ndarray,
    key: jax.Array,
    cfg: DetectorConfig,
):
    """Returns (images, class_maps (B,Y,X,T), regress_maps (B,Y,X,4T))."""
    vsy, vsx = cfg.heatmap_size
    ofy, ofx = cfg.rf.offset
    sty, stx = cfg.rf.stride

    if "image_y" in batch:
        # YUV420-packed wire format (PrefetchLoader pack="yuv420"): halve
        # the train-input H2D bytes; colorspace conversion fuses here.
        images = yuv420_to_normalized(
            batch["image_y"], batch["image_u"], batch["image_v"]
        )
    else:
        images = normalize_images(batch["image"])

    pad_masks = jax.vmap(
        lambda pb, fl: compute_pad_mask(
            pb, templates, ofx=ofx, ofy=ofy, stx=stx, sty=sty,
            vsx=vsx, vsy=vsy, flip=fl,
        )
    )(batch["paste_box"], batch["flip"])

    keys = jax.random.split(key, images.shape[0])
    if jax.default_backend() == "tpu":
        # Fused Pallas reductions: no (Y,X,T,G) HBM tensor, ~40x faster
        # compiles and ~1.4x faster steps than the XLA broadcast path.
        from tinyfaces_tpu.ops.pallas_assignment import assign_targets_fused

        cls_maps, reg_maps = jax.vmap(
            lambda gt, gv, pm, k: assign_targets_fused(
                gt, gv, pm, templates, k,
                ofx=ofx, ofy=ofy, stx=stx, sty=sty,
                pos_thresh=cfg.pos_thresh, neg_thresh=cfg.neg_thresh,
            )
        )(batch["gt_boxes"], batch["gt_valid"], pad_masks, keys)
    else:
        cls_maps, reg_maps, _ = jax.vmap(
            lambda gt, gv, pm, k: assign_targets(
                gt, gv, pm, templates, k,
                ofx=ofx, ofy=ofy, stx=stx, sty=sty,
                pos_thresh=cfg.pos_thresh, neg_thresh=cfg.neg_thresh,
            )
        )(batch["gt_boxes"], batch["gt_valid"], pad_masks, keys)

    return images, cls_maps, reg_maps
