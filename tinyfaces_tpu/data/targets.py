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

    images = normalize_images(batch["image"])

    pad_masks = jax.vmap(
        lambda pb, fl: compute_pad_mask(
            pb, templates, ofx=ofx, ofy=ofy, stx=stx, sty=sty,
            vsx=vsx, vsy=vsy, flip=fl,
        )
    )(batch["paste_box"], batch["flip"])

    keys = jax.random.split(key, batch["image"].shape[0])
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
