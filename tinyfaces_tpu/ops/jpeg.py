"""JPEG DCT-domain wire format — device half.

Consumes the single coalesced byte buffer packed by
data/jpegdct.pack_dct_batch and reconstructs normalized RGB entirely on
the TPU, fused into the consuming program (the pyramid in evaluation.py):

  slice + bitcast fields out of the byte buffer    (free)
  dequantize the zigzag-dense int8 AC tensor       (elementwise)
  dezigzag + 8x8 IDCT as ONE (Z+1, 64) basis matmul (MXU)
  block grid -> plane                              (reshape/transpose)
  chroma fancy upsample (libjpeg h2v2)             (separable 3/4-1/4)
  BT.601 -> RGB, /255, clip, normalize             (elementwise, fused)

Design history (docs/PERF.md round 3): the first wire format shipped
sparse (position, value) coefficient streams — denser on the wire in
theory, but the device-side scatter reconstruction measured 423 ms per
batch-32 on TPU (XLA scatters serialize) and capped e2e throughput. The
zigzag-dense layout removes positions/counts entirely; dezigzag and the
2-D IDCT collapse into one precomputed (64, 64) basis matrix, so
reconstruction is a clean MXU matmul over (blocks, Z+1) coefficients.

This moves the expensive half of JPEG decoding off the host (the
reference decodes fully on the host, tinyfaces/datasets/
wider_face.py:197-199). Numerics: fp32 reconstruction (bf16 mantissa
would corrupt large DC terms); matches libjpeg's decode within +-2/255
per channel (integer-IDCT and rounding differences; tests/test_jpegdct.py).
"""

from __future__ import annotations

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


def _zigzag_basis() -> np.ndarray:
    """(64, 64) matrix: row z = the 8x8 pixel basis (flattened row-major)
    of the z-th ZIGZAG coefficient — dezigzag and the 2-D IDCT in one
    matmul: pixels = coeff_zz @ BASIS."""
    from tinyfaces_tpu.data.jpegdct import ZIGZAG

    m = _idct_matrix()
    basis = np.zeros((64, 64))
    for z in range(64):
        rm = int(ZIGZAG[z])
        u, v = rm // 8, rm % 8
        basis[z] = np.outer(m[u], m[v]).reshape(64)
    return basis


_BASIS_ZZ = _zigzag_basis()


def reconstruct_plane_dense(
    dc: jnp.ndarray,       # (NB,) int16 quantized DC
    ac: jnp.ndarray,       # (NB, Z) int8 quantized zigzag ACs (clamped)
    esc_idx: jnp.ndarray,  # (E,) int32 flat index into NB*Z, -1 = unused
    esc_val: jnp.ndarray,  # (E,) int16 true value for escaped entries
    qtab: jnp.ndarray,     # (64,) uint16 quant table, ZIGZAG order
    nbh: int,
    nbw: int,
) -> jnp.ndarray:
    """Zigzag-dense quantized coefficients -> (nbh*8, nbw*8) fp32 plane
    in [0, 255]: dequant + dezigzag + IDCT as one basis matmul."""
    nb, z = ac.shape

    acf = ac.astype(jnp.float32).reshape(nb * z)
    # Escaped values (|quantized AC| > 127, rare): overwrite the clamped
    # int8 with the true int16. Inactive escapes point out of range.
    eidx = jnp.where(esc_idx >= 0, esc_idx, nb * z)
    acf = acf.at[eidx].set(esc_val.astype(jnp.float32), mode="drop")
    acf = acf.reshape(nb, z)

    qf = qtab.astype(jnp.float32)
    coeff = jnp.concatenate(
        [dc.astype(jnp.float32)[:, None] * qf[0], acf * qf[1:z + 1]], axis=1)
    basis = jnp.asarray(_BASIS_ZZ[: z + 1], jnp.float32)
    px = jnp.dot(coeff, basis, preferred_element_type=jnp.float32)

    plane = px.reshape(nbh, nbw, 8, 8).transpose(0, 2, 1, 3).reshape(
        nbh * 8, nbw * 8)
    return jnp.clip(plane + 128.0, 0.0, 255.0)


def _stream_offsets(pc: jnp.ndarray, nbh: int, nbw: int,
                    order) -> jnp.ndarray:
    """Per-block offsets into the packed value stream from per-block
    popcounts — the offsets never ride the wire. order 0: canvas
    row-major (two-pass pack / grayscale decode). order 1: 4:2:0 MCU
    order — block (by, bx) decodes at MCU-raster position with in-MCU
    order (0,0),(0,1),(1,0),(1,1); canvas blocks outside the image's MCU
    grid have pc == 0, so cumsumming over the STATIC canvas MCU raster
    equals the dynamic image raster. order may be a traced scalar."""
    row = jnp.cumsum(pc) - pc
    if order is None:
        return row
    mh, mw = nbh // 2, nbw // 2
    pcg = pc.reshape(mh, 2, mw, 2)
    mcu_tot = pcg.sum(axis=(1, 3))
    flat = mcu_tot.reshape(-1)
    mcu_pre = (jnp.cumsum(flat) - flat).reshape(mh, mw)
    w00 = jnp.zeros_like(mcu_tot)
    w01 = pcg[:, 0, :, 0]
    w10 = w01 + pcg[:, 0, :, 1]
    w11 = w10 + pcg[:, 1, :, 0]
    within = jnp.stack(
        [jnp.stack([w00, w01], axis=0), jnp.stack([w10, w11], axis=0)],
        axis=0)                                   # (dy, dx, mh, mw)
    mcu = (mcu_pre[None, None] + within).transpose(2, 0, 3, 1).reshape(-1)
    return jnp.where(order > 0, mcu, row)


def reconstruct_plane_sparse(
    dc: jnp.ndarray,       # (NB,) int16 quantized DC
    bitmap: jnp.ndarray,   # (NB,) uint32 nonzero bitmap (bit k-1 = zz pos k)
    vals: jnp.ndarray,     # (V,) int8 packed nonzero values (clamped)
    esc_idx: jnp.ndarray,  # (E,) int32 flat index into NB*Z, -1 = unused
    esc_val: jnp.ndarray,  # (E,) int16 true value for escaped entries
    qtab: jnp.ndarray,     # (64,) uint16 quant table, ZIGZAG order
    nbh: int,
    nbw: int,
    z: int,
    order=None,            # traced scalar stream order (None = row-major)
) -> jnp.ndarray:
    """Bitmap-sparse (wire v4) coefficients -> (nbh*8, nbw*8) fp32 plane.

    Expansion to the dense (NB, Z) tensor is popcount-rank + ONE batched
    gather from the value stream — gathers vectorize on TPU where the v1
    sparse wire's scatter serialized (423 ms/batch32, docs/PERF.md). The
    rest (escape overwrite, dequant + dezigzag + IDCT basis matmul) is
    identical to the dense path."""
    nb = dc.shape[0]
    zz = jnp.arange(z, dtype=jnp.uint32)
    bm = bitmap[:, None]                                   # (NB, 1)
    present = (bm >> zz) & jnp.uint32(1)                   # (NB, Z)
    rank = jax.lax.population_count(
        bm & ((jnp.uint32(1) << zz) - jnp.uint32(1)))      # (NB, Z)
    pc = jax.lax.population_count(bitmap).astype(jnp.int32)
    offs = _stream_offsets(pc, nbh, nbw, order)
    idx = offs[:, None].astype(jnp.int32) + rank.astype(jnp.int32)
    idx = jnp.minimum(idx, jnp.int32(vals.shape[0] - 1))
    acf = jnp.where(present != 0, vals[idx].astype(jnp.float32), 0.0)

    eidx = jnp.where(esc_idx >= 0, esc_idx, nb * z)
    acf = acf.reshape(nb * z).at[eidx].set(
        esc_val.astype(jnp.float32), mode="drop").reshape(nb, z)

    qf = qtab.astype(jnp.float32)
    coeff = jnp.concatenate(
        [dc.astype(jnp.float32)[:, None] * qf[0], acf * qf[1:z + 1]], axis=1)
    basis = jnp.asarray(_BASIS_ZZ[: z + 1], jnp.float32)
    px = jnp.dot(coeff, basis, preferred_element_type=jnp.float32)
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


def wire_fields(wire_u8: jnp.ndarray, h0p: int, w0p: int,
                version: int = 3) -> dict:
    """Slice + bitcast every logical field out of the (B, total_bytes)
    coalesced wire buffer. Free inside the compiled program (static
    offsets); multi-byte fields bitcast from adjacent byte pairs/quads
    (both host and XLA are little-endian — pinned by tests)."""
    from tinyfaces_tpu.data.jpegdct import wire_layout, wire_layout_v4

    layout = (wire_layout_v4 if version == 4 else wire_layout)(h0p, w0p)
    layout.pop("__total__")
    fields = {}
    for name, (off, n, npdtype) in layout.items():
        width = npdtype.itemsize
        raw = wire_u8[:, off:off + n * width]
        if width == 1:
            arr = raw
            if npdtype == np.int8:
                arr = jax.lax.bitcast_convert_type(arr, jnp.int8)
        else:
            arr = jax.lax.bitcast_convert_type(
                raw.reshape(raw.shape[0], n, width),
                getattr(jnp, npdtype.name))
        fields[name] = arr
    return fields


def dct4_batch_to_normalized(wire: dict, h0p: int, w0p: int,
                             dtype=jnp.float32) -> jnp.ndarray:
    """Wire-v4 (bitmap-sparse) analogue of dct_batch_to_normalized."""
    if "_wire" in wire:
        wire = wire_fields(wire["_wire"], h0p, w0p, version=4)
    nbh, nbw = h0p // 8, w0p // 8
    nbch, nbcw = h0p // 16, w0p // 16

    from tinyfaces_tpu.data.jpegdct import Z_KEEP_C, Z_KEEP_Y

    def rec(p, nh, nw, z, order=None):
        args = [wire[f"{p}_dc"], wire[f"{p}_bm"], wire[f"{p}_vals"],
                wire[f"{p}_esc_idx"], wire[f"{p}_esc_val"],
                wire["q_y" if p == "y" else "q_c"]]
        if order is None:
            fn = lambda d, bm, vs, ei, ev, q: reconstruct_plane_sparse(
                d, bm, vs, ei, ev, q, nbh=nh, nbw=nw, z=z)
        else:
            fn = lambda d, bm, vs, ei, ev, q, o: reconstruct_plane_sparse(
                d, bm, vs, ei, ev, q, nbh=nh, nbw=nw, z=z, order=o)
            args.append(order)
        return jax.vmap(fn)(*args)

    # Y's value-stream order is per image (MCU for fused color decode,
    # row for two-pass/grayscale); chroma is always row order.
    y = rec("y", nbh, nbw, Z_KEEP_Y, order=wire["h0w0"][:, 2])
    cb = rec("u", nbch, nbcw, Z_KEEP_C)
    cr = rec("v", nbch, nbcw, Z_KEEP_C)
    return ycc_planes_to_normalized(y, cb, cr, dtype=dtype)


def dct_batch_to_normalized(wire: dict, h0p: int, w0p: int,
                            dtype=jnp.float32) -> jnp.ndarray:
    """Device-side unpack of pack_dct_batch's wire -> normalized RGB
    (B, h0p, w0p, 3). Fuses into the consuming jitted program. Accepts
    {"_wire": bytes} (production: ONE H2D put) or the per-field dict
    (tests)."""
    if "_wire" in wire:
        wire = wire_fields(wire["_wire"], h0p, w0p)
    nbh, nbw = h0p // 8, w0p // 8
    nbch, nbcw = h0p // 16, w0p // 16

    def rec(p, nh, nw, z):
        ac = wire[f"{p}_ac"]
        b = ac.shape[0]
        return jax.vmap(
            lambda d, a, ei, ev, q: reconstruct_plane_dense(
                d, a, ei, ev, q, nbh=nh, nbw=nw)
        )(wire[f"{p}_dc"], ac.reshape(b, nh * nw, z),
          wire[f"{p}_esc_idx"], wire[f"{p}_esc_val"],
          wire["q_y" if p == "y" else "q_c"])

    from tinyfaces_tpu.data.jpegdct import Z_KEEP_C, Z_KEEP_Y

    y = rec("y", nbh, nbw, Z_KEEP_Y)
    cb = rec("u", nbch, nbcw, Z_KEEP_C)
    cr = rec("v", nbch, nbcw, Z_KEEP_C)
    return ycc_planes_to_normalized(y, cb, cr, dtype=dtype)
