"""PIL-bilinear-matched resize on device (the reference's resampling).

The reference resizes every pyramid level with PIL's bilinear filter on
uint8 pixels (reference evaluation.py:40-50 via torchvision F.resize ->
PIL Image.resize(BILINEAR)); the fused pyramid's default device resize is
jax.image.scale_and_translate(linear, antialias) — same triangle filter
family but float-domain and differently windowed, a known, bounded
deviation (tests/test_pipeline_parity.py). This module reproduces PIL's
kernel as dense weight-matrix contractions so the FAST fused path can
run reference resampling (EvalConfig.resample="pil") instead of paying
the one-dispatch-per-scale host_resize fallback.

What PIL (Pillow Resample.c, BILINEAR) does, reproduced here:
  scale       = in_size / out_size
  filterscale = max(scale, 1)          # antialias when downscaling
  support     = 1.0 * filterscale      # bilinear support = 1
  center      = (o + 0.5) * scale
  taps        = i in [int(center - support + 0.5),
                      min(in_size, int(center + support + 0.5)))
  weight(i)   = max(0, 1 - |i + 0.5 - center| / filterscale),
                normalized over included taps (border taps RENORMALIZE —
                PIL does not edge-clamp), then quantized to fixed point
                at PRECISION_BITS = 22 (round away from zero);
  passes      = HORIZONTAL (width) first into an 8-bit temp image, then
                vertical — each pass accumulates ss = sum(pix * kq) and
                emits clip8((ss + 2^21) >> 22), i.e. round half up.

The float64 host oracle below reproduces PIL BYTE-EXACTLY (pinned by
tests/test_pilresize.py against live PIL on randomized shapes). The
device version runs the same quantized weights in f32, where a product
pix * (kq / 2^22) rounds at ~2^-16 absolute — ties at the rounding
boundary can flip by +-1/255 on ~1e-4 of output bytes (also pinned).
Weight matrices are built from iotas with DYNAMIC true sizes masked
inside padded dims (the fused pyramid resizes each image's (h, w)
inside a padded canvas), so they live entirely in the jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PRECISION_BITS = 22  # Pillow: 32 - 8 - 2


def pil_bilinear_matrix_np(out_size: int, in_size: int) -> np.ndarray:
    """Host oracle: PIL's bilinear weight matrix (out_size, in_size),
    fixed-point-quantized exactly as Pillow's normalize_coeffs_8bpc
    (round away from zero at 2^22), returned as float64 multiples of
    2^-22."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = filterscale
    m = np.zeros((out_size, in_size))
    for o in range(out_size):
        center = (o + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        i = np.arange(xmin, xmax)
        w = np.clip(1.0 - np.abs(i + 0.5 - center) / filterscale, 0.0, None)
        s = w.sum()
        if s > 0:
            m[o, xmin:xmax] = w / s
    q = 1 << PRECISION_BITS
    return np.where(m < 0, np.ceil(m * q - 0.5), np.floor(m * q + 0.5)) / q


def resize_pil_bilinear_np(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Host oracle resize: byte-exact vs PIL Image.resize(BILINEAR) on
    uint8 input (width pass first, 8-bit intermediate, half-up
    rounding)."""
    sh = pil_bilinear_matrix_np(oh, img.shape[0])
    sw = pil_bilinear_matrix_np(ow, img.shape[1])
    y = np.einsum("ow,hwc->hoc", sw, img.astype(np.float64))
    y = np.clip(np.floor(y + 0.5), 0, 255)
    y = np.einsum("oh,hwc->owc", sh, y)
    return np.clip(np.floor(y + 0.5), 0, 255).astype(np.uint8)


def _pil_matrix(out_pad: int, in_pad: int, out_v, in_v) -> jnp.ndarray:
    """Device version of pil_bilinear_matrix_np with dynamic true sizes
    inside padded dims: (out_pad, in_pad) f32, rows o >= out_v zero,
    cols i >= in_v masked out before row normalization."""
    out_v = out_v.astype(jnp.float32)
    in_v = in_v.astype(jnp.float32)
    scale = in_v / out_v
    filterscale = jnp.maximum(scale, 1.0)
    support = filterscale
    o = jax.lax.broadcasted_iota(jnp.float32, (out_pad, in_pad), 0)
    i = jax.lax.broadcasted_iota(jnp.float32, (out_pad, in_pad), 1)
    center = (o + 0.5) * scale
    # PIL's tap window [int(center - support + 0.5), int(center +
    # support + 0.5)): within it the triangle is the sole gate except
    # the half-open right edge, where the excluded tap's weight is
    # exactly 0 — the dense triangle + size mask is equivalent.
    w = jnp.maximum(0.0, 1.0 - jnp.abs(i + 0.5 - center) / filterscale)
    w = jnp.where(i + 0.5 >= center + support, 0.0, w)
    w = jnp.where((i < in_v) & (o < out_v), w, 0.0)
    s = w.sum(axis=1, keepdims=True)
    w = w / jnp.where(s > 0, s, 1.0)
    # Pillow's fixed-point weight quantization (round away from zero;
    # bilinear weights are nonnegative, so floor(+0.5) suffices). kq
    # values are integers <= 2^22 — exact in f32.
    q = float(1 << PRECISION_BITS)
    return jnp.floor(w * q + 0.5) / q


def _round8(y: jnp.ndarray) -> jnp.ndarray:
    """clip8((ss + 2^21) >> 22) == clip(floor(y + 0.5)) for y >= 0."""
    return jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)


def resize_pil_bilinear(img: jnp.ndarray, out_hw: tuple[int, int],
                        out_v: tuple, in_v: tuple) -> jnp.ndarray:
    """(H, W, C) f32 PIXEL-domain image -> out_hw, PIL-bilinear matched
    (width pass, 8-bit rounding, height pass, 8-bit rounding). Output
    stays f32 on the uint8 grid — resize in pixel space, THEN normalize:
    PIL's uint8 quantization does not commute with normalization.

    out_v/in_v: dynamic true (h, w) scalars inside the padded dims."""
    hp, wp, _ = img.shape
    sh = _pil_matrix(out_hw[0], hp, out_v[0], in_v[0])
    sw = _pil_matrix(out_hw[1], wp, out_v[1], in_v[1])
    y = _round8(jnp.einsum("ow,hwc->hoc", sw, img,
                           preferred_element_type=jnp.float32))
    y = jnp.einsum("oh,hwc->owc", sh, y,
                   preferred_element_type=jnp.float32)
    return _round8(y)
