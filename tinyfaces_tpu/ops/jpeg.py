"""JPEG DCT-domain wire format — device half.

Consumes the sparse quantized-coefficient arrays packed by
data/jpegdct.pack_dct_batch and reconstructs normalized RGB entirely on
the TPU, fused into the consuming program (the pyramid in evaluation.py):

  scatter sparse coeffs -> dense blocks   (one scatter-add per plane)
  dequantize                              (elementwise, per-image qtable)
  8x8 IDCT                                (two 8x8 matmuls per block — MXU)
  block grid -> plane                     (reshape/transpose)
  chroma fancy upsample (libjpeg h2v2)    (separable 3/4-1/4 triangle)
  BT.601 -> RGB, /255, clip, normalize    (elementwise, fused)

This moves the expensive half of JPEG decoding off the host (the reference
decodes fully on the host, tinyfaces/datasets/wider_face.py:197-199) and
cuts the H2D wire to roughly what the JPEG file itself carries.

Numerics: reconstruction runs in fp32 (bf16 mantissa would corrupt large
DC terms); the plane is cast to the model compute dtype afterwards. The
result matches libjpeg's decode within +-2/255 per channel (integer-IDCT
and rounding differences; see tests/test_jpegdct.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.config import IMAGENET_MEAN, IMAGENET_STD


def _idct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m


_IDCT_M = _idct_matrix()


def reconstruct_plane(
    dc: jnp.ndarray,       # (NB,) int16 quantized DC
    cnt: jnp.ndarray,      # (NB,) uint8 AC count per block
    pos: jnp.ndarray,      # (S,) uint8 row-major in-block position 1..63
    val: jnp.ndarray,      # (S,) int8 quantized AC value (clamped)
    esc_idx: jnp.ndarray,  # (E,) int32 slot index of |AC| > 127, -1 = unused
    esc_val: jnp.ndarray,  # (E,) int16 true value for escaped slots
    qtab: jnp.ndarray,     # (64,) uint16 quant table, ROW-MAJOR order
    nbh: int,
    nbw: int,
) -> jnp.ndarray:
    """Sparse quantized coefficients -> (nbh*8, nbw*8) fp32 plane [0, 255]."""
    nb = nbh * nbw
    s = pos.shape[0]

    vals = val.astype(jnp.float32)
    # Escaped values (|quantized AC| > 127, rare): overwrite the clamped
    # int8 with the true int16. Inactive escapes point past the stream.
    eidx = jnp.where(esc_idx >= 0, esc_idx, s)
    vals = vals.at[eidx].set(esc_val.astype(jnp.float32), mode="drop")

    # Slot -> block: slots are stored grouped by block in block order, so
    # block_id = #blocks whose cumulative count is <= slot index.
    offsets = jnp.cumsum(cnt.astype(jnp.int32))
    slot = jnp.arange(s, dtype=jnp.int32)
    block_id = jnp.searchsorted(offsets, slot, side="right").astype(jnp.int32)
    valid = slot < offsets[-1]

    posi = pos.astype(jnp.int32)
    dq = vals * qtab.astype(jnp.float32)[posi]
    flat = jnp.where(valid, block_id * 64 + posi, nb * 64)
    dense = jnp.zeros((nb * 64,), jnp.float32).at[flat].add(dq, mode="drop")
    dense = dense.reshape(nb, 64)
    dense = dense.at[:, 0].set(dc.astype(jnp.float32) * qtab[0].astype(jnp.float32))

    f = dense.reshape(nb, 8, 8)
    m = jnp.asarray(_IDCT_M, jnp.float32)
    px = jnp.einsum("ux,nuv,vy->nxy", m, f, m,
                    preferred_element_type=jnp.float32)
    plane = px.reshape(nbh, nbw, 8, 8).transpose(0, 2, 1, 3).reshape(
        nbh * 8, nbw * 8)
    return jnp.clip(plane + 128.0, 0.0, 255.0)


def _fancy_upsample_1d(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """libjpeg 'fancy' (triangle) 2x upsample along one axis: out[2i] =
    (3 in[i] + in[i-1]) / 4, out[2i+1] = (3 in[i] + in[i+1]) / 4, edges
    replicated — the filter PIL/libjpeg use on decode (jdsample.c h2v2)."""
    lo = jnp.roll(x, 1, axis)
    hi = jnp.roll(x, -1, axis)
    # edge replication: first/last sample use themselves as the neighbor
    idx_first = [slice(None)] * x.ndim
    idx_first[axis] = slice(0, 1)
    idx_last = [slice(None)] * x.ndim
    idx_last[axis] = slice(-1, None)
    lo = lo.at[tuple(idx_first)].set(x[tuple(idx_first)])
    hi = hi.at[tuple(idx_last)].set(x[tuple(idx_last)])
    even = 0.75 * x + 0.25 * lo
    odd = 0.75 * x + 0.25 * hi
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def fancy_upsample_2x(c: jnp.ndarray) -> jnp.ndarray:
    """(..., H/2, W/2) chroma -> (..., H, W), separable triangle filter."""
    c = _fancy_upsample_1d(c, c.ndim - 2)
    return _fancy_upsample_1d(c, c.ndim - 1)


def ycc_planes_to_normalized(
    y: jnp.ndarray,   # (B, H, W) fp32 [0, 255]
    cb: jnp.ndarray,  # (B, H/2, W/2) fp32 [0, 255]
    cr: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Full-range BT.601 (JFIF) YCbCr -> ImageNet-normalized RGB (B,H,W,3),
    with libjpeg-style fancy chroma upsampling (closer to the reference's
    PIL decode than the yuv420 path's nearest upsample)."""
    uf = fancy_upsample_2x(cb) - 128.0
    vf = fancy_upsample_2x(cr) - 128.0
    yf = y.astype(jnp.float32)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    x = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def dct_batch_to_normalized(wire: dict, h0p: int, w0p: int,
                            dtype=jnp.float32) -> jnp.ndarray:
    """Device-side unpack of pack_dct_batch's arrays -> normalized RGB
    (B, h0p, w0p, 3). Fuses into the consuming jitted program."""
    nbh, nbw = h0p // 8, w0p // 8
    nbch, nbcw = h0p // 16, w0p // 16

    rec_y = jax.vmap(partial(reconstruct_plane, nbh=nbh, nbw=nbw))
    rec_c = jax.vmap(partial(reconstruct_plane, nbh=nbch, nbw=nbcw))

    y = rec_y(wire["y_dc"], wire["y_cnt"], wire["y_pos"], wire["y_val"],
              wire["y_esc_idx"], wire["y_esc_val"], wire["q_y"])
    cb = rec_c(wire["u_dc"], wire["u_cnt"], wire["u_pos"], wire["u_val"],
               wire["u_esc_idx"], wire["u_esc_val"], wire["q_c"])
    cr = rec_c(wire["v_dc"], wire["v_cnt"], wire["v_pos"], wire["v_val"],
               wire["v_esc_idx"], wire["v_esc_val"], wire["q_c"])
    return ycc_planes_to_normalized(y, cb, cr, dtype=dtype)
