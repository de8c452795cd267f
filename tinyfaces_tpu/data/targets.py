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


def _pil_downscale2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact PIL BILINEAR x0.5 (reference _resize_uint8 -> Image.resize):
    separable triangle filter, support 2 source px -> taps [2i-1 .. 2i+2]
    with weights [1/8, 3/8, 3/8, 1/8], edges clamped. (H, W, C) -> (H/2,
    W/2, C), float pipeline (no uint8 re-quantization — bounded deviation,
    see data/dct_train.py)."""
    w = jnp.asarray([0.125, 0.375, 0.375, 0.125], x.dtype)

    def ds_rows(a):
        n = a.shape[0]
        ap = jnp.concatenate([a[:1], a, a[-1:], a[-1:]], axis=0)
        out = (w[0] * ap[0:n:2] + w[1] * ap[1:n + 1:2]
               + w[2] * ap[2:n + 2:2] + w[3] * ap[3:n + 3:2])
        # PIL drops out-of-image taps and RENORMALIZES the rest (it does
        # not clamp): out[0] = (.75a0 + .75a1 + .25a2)/1.75. Region row 0
        # is only ever consumed when it IS the true image edge (crop at 0
        # => anchor at 0 — data/dct_train.region_anchor), so the fixup is
        # exact; the last row is never consumed (offset bounds).
        first = (0.75 * a[0] + 0.75 * a[1] + 0.25 * a[2]) / 1.75
        return out.at[0].set(first)

    x = ds_rows(x)
    return ds_rows(x.swapaxes(0, 1)).swapaxes(0, 1)


def _pil_upscale2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact PIL BILINEAR x2: out[2j] = 0.25*src[j-1] + 0.75*src[j],
    out[2j+1] = 0.75*src[j] + 0.25*src[j+1], edges clamped. (h, w, C) ->
    (2h, 2w, C)."""

    def us_rows(a):
        n = a.shape[0]
        ap = jnp.concatenate([a[:1], a, a[-1:]], axis=0)
        even = 0.25 * ap[0:n] + 0.75 * ap[1:n + 1]
        odd = 0.75 * ap[1:n + 1] + 0.25 * ap[2:n + 2]
        return jnp.stack([even, odd], axis=1).reshape((2 * n,) + a.shape[1:])

    x = us_rows(x)
    return us_rows(x.swapaxes(0, 1)).swapaxes(0, 1)


def device_augment_dct(batch: dict, cfg: DetectorConfig,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Device half of the jpegdct TRAIN wire (host half: data/dct_train.py):
    dequant + IDCT + chroma upsample of the shipped source region, then the
    reference's resize/crop/paste/flip (wider_face.py:133-165) fused into
    the train step. Geometry is driven by host-computed draws (aug_scale,
    aug_off, paste_box, flip) so it matches the host pixel path exactly.

    Returns normalized (B, ih, iw, 3). All three scale branches are
    computed and selected per sample (cheap: slices + separable 4-tap
    filters, negligible vs the ResNet-101 step); data-dependent control
    flow would break XLA's single-trace compilation."""
    from tinyfaces_tpu.data.dct_train import TRAIN_REGION, upsample_src
    from tinyfaces_tpu.ops.jpeg import dct_batch_to_normalized

    ih, iw = cfg.input_size
    s2h, s2w = upsample_src(ih), upsample_src(iw)
    region = dct_batch_to_normalized(
        {"_wire": batch["dct_wire"]}, TRAIN_REGION, TRAIN_REGION, dtype=dtype)
    # The canvas fill, in normalized space: MEAN_PIXEL is the uint8
    # ImageNet mean the host path paints before normalize (int-truncated,
    # wider_face.MEAN_PIXEL — same constant, same rounding).
    from tinyfaces_tpu.data.wider_face import MEAN_PIXEL

    mean_pixel = jnp.asarray(MEAN_PIXEL, dtype) / 255.0
    norm_mean = ((mean_pixel - jnp.asarray(IMAGENET_MEAN, dtype))
                 / jnp.asarray(IMAGENET_STD, dtype))

    def one(xi, sid, off, pb, fl):
        c1 = jax.lax.dynamic_slice(xi, (off[0], off[1], 0), (ih, iw, 3))
        half = _pil_downscale2(xi)
        c0 = jax.lax.dynamic_slice(half, (off[0], off[1], 0), (ih, iw, 3))
        up = _pil_upscale2(xi[:s2h, :s2w])
        c2 = jax.lax.dynamic_slice(up, (off[0], off[1], 0), (ih, iw, 3))
        content = jnp.where(sid == 0, c0, jnp.where(sid == 1, c1, c2))
        # Paste at (px, py): roll + mask == dynamic_update_slice without
        # its start-clamping pitfalls; rolled wrap-around lands outside
        # the paste box where the mask writes the canvas fill.
        px = pb[0].astype(jnp.int32)
        py = pb[1].astype(jnp.int32)
        content = jnp.roll(content, (py, px), axis=(0, 1))
        rows = jnp.arange(ih, dtype=jnp.float32)[:, None]
        cols = jnp.arange(iw, dtype=jnp.float32)[None, :]
        m = ((rows >= pb[1]) & (rows < pb[3])
             & (cols >= pb[0]) & (cols < pb[2]))
        out = jnp.where(m[..., None], content, norm_mean)
        return jnp.where(fl, out[:, ::-1], out)

    return jax.vmap(one)(region, batch["aug_scale"], batch["aug_off"],
                         batch["paste_box"], batch["flip"])


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

    if "dct_wire" in batch:
        # jpegdct train wire: coefficient region + device-side augmentation
        # (resize/crop/paste/flip) fused into this program.
        images = device_augment_dct(batch, cfg)
    elif "image_y" in batch:
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
