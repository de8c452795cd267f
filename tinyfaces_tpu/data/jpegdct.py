"""JPEG DCT-domain wire format — host half.

Replaces the host-side full JPEG decode the reference performs per image
(tinyfaces/datasets/wider_face.py:197-199) with entropy (Huffman) decode
only: the C++ parser (native/jpeg_dct.cpp) emits quantized DCT
coefficients, which `pack_dct_batch` packs into fixed-shape sparse arrays
(~0.5-0.9 B/px on natural images vs 1.5 B/px YUV420 and 3 B/px RGB).
The TPU does dequantization, the 8x8 IDCT, chroma upsampling, colorspace
conversion and normalization fused into the pyramid program
(tinyfaces_tpu/ops/jpeg.py) — the expensive half of JPEG decoding becomes
MXU work and the wire carries what the file carried.

Unsupported files (progressive JPEG, 4:2:2/4:4:4 chroma, CMYK, PNG...)
are transparently transcoded through PIL to baseline 4:2:0 quality-95 and
re-parsed; `transcode_count()` reports how often. Quality impact of the
detour is the q95 requantization (small vs the detector's own tolerance;
see tests/test_jpegdct.py).
"""

from __future__ import annotations

import ctypes
import dataclasses
import io
import threading
from typing import Optional, Sequence

import numpy as np

from tinyfaces_tpu.data import native as _native

# JPEG zigzag order: ZIGZAG[i] = row-major index of the i-th zigzag entry.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int32)

_lock = threading.Lock()
_transcodes = 0
_bound = False


@dataclasses.dataclass
class DCTImage:
    """Entropy-decoded JPEG: quantized coefficients at component resolution.

    y/cb/cr: (nblocks_y, nblocks_x, 64) int16, ZIGZAG coefficient order.
    qy/qc: (64,) uint16 quant tables, zigzag order. Grayscale: cb/cr None.
    """

    h: int
    w: int
    y: np.ndarray
    cb: Optional[np.ndarray]
    cr: Optional[np.ndarray]
    qy: np.ndarray
    qc: Optional[np.ndarray]


def _bind(lib) -> None:
    global _bound
    if _bound:
        return
    lib.tf_jpeg_info.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p]
    lib.tf_jpeg_info.restype = ctypes.c_int
    lib.tf_jpeg_dct.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.tf_jpeg_dct.restype = ctypes.c_int
    lib.tf_dct_pack_dense.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_int16,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.tf_dct_pack_dense.restype = None
    lib.tf_jpeg_dct_pack.argtypes = (
        [ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
         ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_long,
         ctypes.c_float, ctypes.c_float, ctypes.c_float]
        + [ctypes.c_void_p] * 16
    )
    lib.tf_jpeg_dct_pack.restype = ctypes.c_int
    lib.tf_dct_pack_sparse.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_long,
        ctypes.c_int16,
    ] + [ctypes.c_void_p] * 6
    lib.tf_dct_pack_sparse.restype = None
    lib.tf_jpeg_dct_pack_sparse.argtypes = (
        [ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
         ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_long,
         ctypes.c_long, ctypes.c_long,
         ctypes.c_float, ctypes.c_float, ctypes.c_float]
        + [ctypes.c_void_p] * 19
    )
    lib.tf_jpeg_dct_pack_sparse.restype = ctypes.c_int
    _bound = True


def is_available() -> bool:
    lib = _native._load()
    if lib is None:
        return False
    _bind(lib)
    return True


def transcode_count() -> int:
    """How many images needed the PIL transcode fallback (non-baseline /
    non-4:2:0 / non-JPEG inputs)."""
    return _transcodes


def _transcode(data: bytes) -> bytes:
    """PIL fallback: decode anything PIL can read, re-encode as baseline
    4:2:0 quality-95 JPEG for the native parser."""
    global _transcodes
    from PIL import Image

    with _lock:
        _transcodes += 1
    img = Image.open(io.BytesIO(data))
    if img.mode not in ("RGB", "L"):
        img = img.convert("RGB")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=95, subsampling=2)
    return buf.getvalue()


def parse_jpeg_dct(data: bytes) -> DCTImage:
    """JPEG bytes -> quantized DCT coefficients (C++ entropy decode only).

    Natively handles baseline/extended-sequential Huffman JPEGs with 4:2:0
    or grayscale sampling; everything else takes the PIL transcode detour.
    """
    lib = _native._load()
    if lib is None:
        raise RuntimeError("native library unavailable for jpegdct transfer")
    _bind(lib)

    try:
        return _parse_native(lib, data)
    except ValueError:
        # Not a baseline-4:2:0 JPEG (or a corrupt/unsupported stream): take
        # the PIL transcode detour. Any residual failure raises from here.
        return _parse_native(lib, _transcode(data))


def _parse_native(lib, data: bytes) -> DCTImage:
    buf = np.frombuffer(data, np.uint8)
    info = np.zeros(8, np.int32)
    rc = lib.tf_jpeg_info(buf.ctypes.data_as(ctypes.c_void_p), len(buf),
                          info.ctypes.data_as(ctypes.c_void_p))
    h, w, ncomp, hs, vs = (int(v) for v in info[:5])
    if rc != 0 or not (ncomp == 1 or (hs == 2 and vs == 2)):
        raise ValueError(f"not a native-path JPEG (rc={rc}, "
                         f"ncomp={ncomp}, sampling={hs}x{vs})")

    if ncomp == 1:
        nby, nbx = -(-h // 8), -(-w // 8)
        nbcy = nbcx = 0
    else:
        mcy, mcx = -(-h // (8 * vs)), -(-w // (8 * hs))
        nby, nbx = mcy * vs, mcx * hs
        nbcy, nbcx = mcy, mcx

    y = np.zeros((nby * nbx, 64), np.int16)
    cb = np.zeros((max(1, nbcy * nbcx), 64), np.int16)
    cr = np.zeros_like(cb)
    qt = np.zeros((3, 64), np.uint16)
    grid = np.zeros(8, np.int32)
    rc = lib.tf_jpeg_dct(
        buf.ctypes.data_as(ctypes.c_void_p), len(buf),
        y.ctypes.data_as(ctypes.c_void_p), y.shape[0],
        cb.ctypes.data_as(ctypes.c_void_p), cb.shape[0],
        cr.ctypes.data_as(ctypes.c_void_p), cr.shape[0],
        qt.ctypes.data_as(ctypes.c_void_p),
        grid.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError(f"jpeg entropy decode failed (rc={rc})")
    assert (int(grid[0]), int(grid[1])) == (nby, nbx), (grid, nby, nbx)

    if ncomp == 1:
        return DCTImage(h, w, y.reshape(nby, nbx, 64), None, None,
                        qt[0].copy(), None)
    return DCTImage(h, w, y.reshape(nby, nbx, 64),
                    cb.reshape(nbcy, nbcx, 64), cr.reshape(nbcy, nbcx, 64),
                    qt[0].copy(), qt[1].copy())


def jpeg_dims(data: bytes) -> Optional[tuple]:
    """(h, w) if `data` is a JPEG the fused native path decodes directly
    (baseline Huffman, 4:2:0 or grayscale), else None. Header parse only
    — callers use this to size the batch canvas without entropy-decoding,
    keeping raw bytes on the fast path through pack_dct_batch."""
    lib = _native._load()
    if lib is None:
        return None
    _bind(lib)
    buf = np.frombuffer(data, np.uint8)
    info = np.zeros(8, np.int32)
    rc = lib.tf_jpeg_info(buf.ctypes.data_as(ctypes.c_void_p), len(buf),
                          info.ctypes.data_as(ctypes.c_void_p))
    h, w, ncomp, hs, vs = (int(v) for v in info[:5])
    if rc != 0 or not (ncomp == 1 or (hs == 2 and vs == 2)):
        return None
    return h, w


def as_dct_image(im) -> DCTImage:
    """Coerce detector inputs to DCTImage: passthrough for DCTImage, entropy
    decode for JPEG bytes, PIL-encode (q95 4:2:0 — a transcode) for uint8
    RGB arrays so array-based callers keep working under transfer="jpegdct".
    """
    if isinstance(im, DCTImage):
        return im
    if isinstance(im, (bytes, bytearray, memoryview)):
        return parse_jpeg_dct(bytes(im))
    arr = np.asarray(im)
    if arr.dtype == np.uint8 and arr.ndim in (2, 3):
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=95, subsampling=2)
        return parse_jpeg_dct(buf.getvalue())
    raise TypeError(
        f"jpegdct transfer takes JPEG bytes, DCTImage or uint8 arrays, "
        f"got {type(im).__name__}")


# --- NumPy reference reconstruction (tests / offline use) ----------------

def _idct_matrix() -> np.ndarray:
    """M[u, x] = c(u)/2 * cos((2x+1) u pi / 16); pixels = M^T F M."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m


def reconstruct_plane_np(coef_zz: np.ndarray, qtab_zz: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) zigzag quantized -> (nby*8, nbx*8) float pixels in
    [0, 255]. Reference implementation for the device kernel's tests."""
    nby, nbx, _ = coef_zz.shape
    dense = np.zeros((nby * nbx, 64), np.float64)
    dense[:, ZIGZAG] = coef_zz.reshape(-1, 64) * qtab_zz.astype(np.float64)
    f = dense.reshape(nby, nbx, 8, 8)
    m = _idct_matrix()
    px = np.einsum("ux,bcuv,vy->bcxy", m, f, m)
    plane = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
    return np.clip(plane, 0.0, 255.0)


# --- Batch packing for the device program --------------------------------

_truncated_coeffs = 0
_clamped_escapes = 0


def truncation_stats() -> dict:
    """Spectral-truncation accounting: nonzero AC coefficients past the
    zigzag cutoff (Z_KEEP_*), and escape values clamped to +-127 when the
    escape budget overflowed (both rare at the defaults; never silent)."""
    return {"truncated_coeffs": _truncated_coeffs,
            "clamped_escapes": _clamped_escapes}


# Zigzag cutoff per plane: each block ships its DC (int16) plus the first
# Z quantized AC coefficients as dense int8 (JPEG's own progressive-scan
# ordering: dropping the tail is a spectral low-pass). The wire size IS
# the cutoff (static shapes): Y at Z=28 is 0.4375 B/px, chroma at Z=24
# adds 0.1875, DC+escapes+qtables ~0.07 -> ~0.70 B/px total. Natural
# photos at JPEG quality <=95 carry almost no energy past these cutoffs
# (measured: zero luma tail past zigzag 24 even at q95 on textured
# inputs; chroma tails only on synthetic full-amplitude color noise) —
# any drop is counted in truncation_stats(). A dense layout needs NO
# per-slot positions or counts, so the device reconstruction is one
# (coeff @ basis) MXU matmul — the sparse scatter formulation it
# replaces measured 423 ms/batch32 on TPU (docs/PERF.md round 3).
Z_KEEP_Y = 28
Z_KEEP_C = 24
ESC_PER_BLOCK = 1 / 16

# Wire v4 (bitmap-sparse): per block a uint32 nonzero bitmap (bit k-1 =
# zigzag position k, within the same Z_KEEP_* cutoffs) and a uint32
# offset into a shared per-plane int8 value stream; only nonzero values
# ride the wire. The stream budget is VALS_PER_BLOCK_* x blocks,
# image-wide — smooth blocks subsidize textured ones (per-block nonzero
# counts in the first 28 zigzag slots measured ~2 on smooth natural
# photos and ~22 on per-pixel-noise worst cases; real photos sit around
# 6-14). Overflow drops the highest-zigzag values (spectral low-pass,
# counted in truncation_stats). 0.376 B/px vs v3's 0.68 at these
# budgets (no per-block offsets on the wire: the device rebuilds
# stream offsets from popcount cumsums, ops/jpeg.py:_stream_offsets).
# Offsets ship on the wire so the device never reconstructs stream
# order: expansion is popcount-rank + ONE batched gather (ops/jpeg.py) —
# no scatter (the v1 sparse wire's scatter measured 423 ms/batch32).
VALS_PER_BLOCK_Y = 12
VALS_PER_BLOCK_C = 5


def _neutral_ycc() -> tuple[float, float, float]:
    """MEAN_PIXEL (ImageNet mean, the canvas fill everywhere else in the
    pipeline) in full-range BT.601 YCbCr."""
    from tinyfaces_tpu.data.wider_face import MEAN_PIXEL

    r, g, b = MEAN_PIXEL
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return yy, cb, cr


def _pack_plane_dense(coef_zz, nbx_img, w_grid, z_keep, out_dc, out_ac,
                      out_esc_idx, out_esc_val):
    """NumPy oracle of tf_dct_pack_dense: zigzag-dense pack of one plane.

    coef_zz: (nb_img, 64) int16 zigzag. Image blocks land at canvas block
    id by*w_grid + bx; out_ac is (canvas_blocks, z_keep) int8."""
    global _truncated_coeffs, _clamped_escapes
    nb_img = coef_zz.shape[0]
    img_cids = (np.arange(nb_img) // nbx_img) * w_grid + (
        np.arange(nb_img) % nbx_img)

    out_dc[img_cids] = coef_zz[:, 0]
    ac = coef_zz[:, 1:z_keep + 1].astype(np.int16)
    small = np.clip(ac, -127, 127)
    out_ac[img_cids] = small.astype(np.int8)

    rows, ks = np.nonzero(ac != small)
    ne = min(rows.shape[0], out_esc_idx.shape[0])
    if rows.shape[0] > ne:
        with _lock:
            _clamped_escapes += rows.shape[0] - ne
    out_esc_idx[:ne] = img_cids[rows[:ne]] * z_keep + ks[:ne]
    out_esc_val[:ne] = ac[rows[:ne], ks[:ne]]

    dropped = int(np.count_nonzero(coef_zz[:, z_keep + 1:]))
    if dropped:
        with _lock:
            _truncated_coeffs += dropped


def _pack_plane_dense_native(lib, coef_zz, nbx_img, grid_h, grid_w, z_keep,
                             neutral_dc, out_dc, out_ac, out_esc_idx,
                             out_esc_val) -> None:
    """C++ fast path (tf_dct_pack_dense), oracle-pinned by tests."""
    global _truncated_coeffs, _clamped_escapes
    stats = np.zeros(2, np.int32)
    coef_zz = np.ascontiguousarray(coef_zz, np.int16)
    lib.tf_dct_pack_dense(
        coef_zz.ctypes.data_as(ctypes.c_void_p),
        coef_zz.shape[0] // nbx_img, nbx_img, grid_h, grid_w,
        z_keep, out_esc_idx.shape[0],
        ctypes.c_int16(int(neutral_dc)),
        out_dc.ctypes.data_as(ctypes.c_void_p),
        out_ac.ctypes.data_as(ctypes.c_void_p),
        out_esc_idx.ctypes.data_as(ctypes.c_void_p),
        out_esc_val.ctypes.data_as(ctypes.c_void_p),
        stats.ctypes.data_as(ctypes.c_void_p),
    )
    if stats[0] or stats[1]:
        with _lock:
            _truncated_coeffs += int(stats[0])
            _clamped_escapes += int(stats[1])


def _pack_fused_native(lib, data: bytes, wire: dict, i: int, h8: int,
                       w8: int) -> Optional[tuple]:
    """Fused C++ entropy-decode + pack (tf_jpeg_dct_pack): JPEG bytes ->
    this image's wire fields directly, no intermediate coefficient
    buffers. Returns (h, w) on success, None if the stream needs the
    transcode + two-pass fallback. Escape-list ordering follows MCU
    decode order (vs row-major in the two-pass path) — semantically
    identical, the device scatter is order-independent."""
    global _truncated_coeffs, _clamped_escapes
    buf = np.frombuffer(data, np.uint8)
    stats = np.zeros(2, np.int32)
    hw = np.zeros(2, np.int32)
    yn, cbn, crn = _neutral_ycc()
    p = ctypes.c_void_p
    ac_y = wire["y_ac"][i]
    ac_u = wire["u_ac"][i]
    ac_v = wire["v_ac"][i]
    rc = lib.tf_jpeg_dct_pack(
        buf.ctypes.data_as(p), len(buf), h8, w8, Z_KEEP_Y, Z_KEEP_C,
        wire["y_esc_idx"].shape[1], wire["u_esc_idx"].shape[1],
        float(yn), float(cbn), float(crn),
        wire["y_dc"][i].ctypes.data_as(p), ac_y.ctypes.data_as(p),
        wire["y_esc_idx"][i].ctypes.data_as(p),
        wire["y_esc_val"][i].ctypes.data_as(p),
        wire["u_dc"][i].ctypes.data_as(p), ac_u.ctypes.data_as(p),
        wire["u_esc_idx"][i].ctypes.data_as(p),
        wire["u_esc_val"][i].ctypes.data_as(p),
        wire["v_dc"][i].ctypes.data_as(p), ac_v.ctypes.data_as(p),
        wire["v_esc_idx"][i].ctypes.data_as(p),
        wire["v_esc_val"][i].ctypes.data_as(p),
        wire["q_y"][i].ctypes.data_as(p), wire["q_c"][i].ctypes.data_as(p),
        hw.ctypes.data_as(p), stats.ctypes.data_as(p),
    )
    if rc != 0:
        return None
    if stats[0] or stats[1]:
        with _lock:
            _truncated_coeffs += int(stats[0])
            _clamped_escapes += int(stats[1])
    return int(hw[0]), int(hw[1])


def _pack_plane_sparse(coef_zz, nbx_img, w_grid, z_keep, vcap, out_dc,
                       out_bm, out_vals, out_esc_idx, out_esc_val):
    """NumPy oracle of tf_dct_pack_sparse: bitmap-sparse pack of one
    plane, canvas-order value stream (stream offsets are NOT on the
    wire — the device reconstructs them from popcount cumsums).

    coef_zz: (nb_img, 64) int16 zigzag. Image blocks land at canvas
    block id by*w_grid + bx (row-major image order IS canvas order);
    out_bm is (canvas_blocks,) uint32, out_vals (vcap,) int8."""
    global _truncated_coeffs, _clamped_escapes
    nb_img = coef_zz.shape[0]
    img_cids = (np.arange(nb_img) // nbx_img) * w_grid + (
        np.arange(nb_img) % nbx_img)

    out_dc[img_cids] = coef_zz[:, 0]
    ac = coef_zz[:, 1:z_keep + 1].astype(np.int16)

    rows, ks = np.nonzero(ac)          # row-major == stream order
    pos = np.arange(rows.shape[0])
    keep = pos < vcap
    dropped_overflow = int(rows.shape[0] - keep.sum())

    bm = np.zeros(nb_img, np.uint32)
    np.add.at(bm, rows[keep], (np.uint32(1) << ks[keep].astype(np.uint32)))
    out_bm[img_cids] = bm

    v = ac[rows[keep], ks[keep]]
    clipped = np.clip(v, -127, 127)
    out_vals[:clipped.shape[0]] = clipped.astype(np.int8)

    esc = np.nonzero(v != clipped)[0]
    ne = min(esc.shape[0], out_esc_idx.shape[0])
    if esc.shape[0] > ne:
        with _lock:
            _clamped_escapes += esc.shape[0] - ne
    out_esc_idx[:ne] = (img_cids[rows[keep][esc[:ne]]] * z_keep
                        + ks[keep][esc[:ne]])
    out_esc_val[:ne] = v[esc[:ne]]

    dropped = dropped_overflow + int(np.count_nonzero(coef_zz[:, z_keep + 1:]))
    if dropped:
        with _lock:
            _truncated_coeffs += dropped


def _pack_plane_sparse_native(lib, coef_zz, nbx_img, grid_h, grid_w, z_keep,
                              neutral_dc, out_dc, out_bm, out_vals,
                              out_esc_idx, out_esc_val) -> None:
    """C++ fast path (tf_dct_pack_sparse), oracle-pinned by tests."""
    global _truncated_coeffs, _clamped_escapes
    stats = np.zeros(2, np.int32)
    coef_zz = np.ascontiguousarray(coef_zz, np.int16)
    p = ctypes.c_void_p
    lib.tf_dct_pack_sparse(
        coef_zz.ctypes.data_as(p),
        coef_zz.shape[0] // nbx_img, nbx_img, grid_h, grid_w,
        z_keep, out_esc_idx.shape[0], out_vals.shape[0],
        ctypes.c_int16(int(neutral_dc)),
        out_dc.ctypes.data_as(p), out_bm.ctypes.data_as(p),
        out_vals.ctypes.data_as(p),
        out_esc_idx.ctypes.data_as(p), out_esc_val.ctypes.data_as(p),
        stats.ctypes.data_as(p),
    )
    if stats[0] or stats[1]:
        with _lock:
            _truncated_coeffs += int(stats[0])
            _clamped_escapes += int(stats[1])


def _pack_fused_native_v4(lib, data: bytes, wire: dict, i: int, h8: int,
                          w8: int) -> Optional[tuple]:
    """Fused C++ entropy-decode + bitmap-sparse pack (wire v4). Returns
    (h, w, stream_order) on success, None if the stream needs the
    transcode + two-pass fallback. Color scans emit the Y value stream
    in MCU order (stream_order=1); grayscale in row order (0) — the
    device reconstructs offsets for either from popcount cumsums."""
    global _truncated_coeffs, _clamped_escapes
    buf = np.frombuffer(data, np.uint8)
    stats = np.zeros(2, np.int32)
    hw = np.zeros(3, np.int32)
    yn, cbn, crn = _neutral_ycc()
    p = ctypes.c_void_p
    rc = lib.tf_jpeg_dct_pack_sparse(
        buf.ctypes.data_as(p), len(buf), h8, w8, Z_KEEP_Y, Z_KEEP_C,
        wire["y_esc_idx"].shape[1], wire["u_esc_idx"].shape[1],
        wire["y_vals"].shape[1], wire["u_vals"].shape[1],
        float(yn), float(cbn), float(crn),
        wire["y_dc"][i].ctypes.data_as(p), wire["y_bm"][i].ctypes.data_as(p),
        wire["y_vals"][i].ctypes.data_as(p),
        wire["y_esc_idx"][i].ctypes.data_as(p),
        wire["y_esc_val"][i].ctypes.data_as(p),
        wire["u_dc"][i].ctypes.data_as(p), wire["u_bm"][i].ctypes.data_as(p),
        wire["u_vals"][i].ctypes.data_as(p),
        wire["u_esc_idx"][i].ctypes.data_as(p),
        wire["u_esc_val"][i].ctypes.data_as(p),
        wire["v_dc"][i].ctypes.data_as(p), wire["v_bm"][i].ctypes.data_as(p),
        wire["v_vals"][i].ctypes.data_as(p),
        wire["v_esc_idx"][i].ctypes.data_as(p),
        wire["v_esc_val"][i].ctypes.data_as(p),
        wire["q_y"][i].ctypes.data_as(p), wire["q_c"][i].ctypes.data_as(p),
        hw.ctypes.data_as(p), stats.ctypes.data_as(p),
    )
    if rc != 0:
        return None
    if stats[0] or stats[1]:
        with _lock:
            _truncated_coeffs += int(stats[0])
            _clamped_escapes += int(stats[1])
    return int(hw[0]), int(hw[1]), 1 if int(hw[2]) == 3 else 0


def wire_layout_v4(h0p: int, w0p: int) -> dict:
    """Wire-v4 (bitmap-sparse) field layout; same contract as
    wire_layout. ~0.34 B/px at the default budgets vs v3's 0.68 (stream
    offsets are reconstructed on device from popcount cumsums, so only
    dc + bitmap + values + escapes ride the wire)."""
    assert h0p % 16 == 0 and w0p % 16 == 0, (h0p, w0p)
    nb = (h0p // 8) * (w0p // 8)
    nbc = (h0p // 16) * (w0p // 16)
    ey = max(16, int(nb * ESC_PER_BLOCK))
    ec = max(16, int(nbc * ESC_PER_BLOCK))
    vy = nb * VALS_PER_BLOCK_Y
    vc = nbc * VALS_PER_BLOCK_C

    layout = {}
    off = 0

    def add(name, n, dtype):
        nonlocal off
        item = np.dtype(dtype).itemsize
        off = (off + item - 1) // item * item
        layout[name] = (off, n, np.dtype(dtype))
        off += n * item

    # h0w0 = [h, w, y_stream_order, 0]: order 1 = 4:2:0 MCU order
    # (fused color decode), 0 = canvas row-major (two-pass / grayscale).
    add("h0w0", 4, np.int32)
    add("y_bm", nb, np.uint32)
    add("u_bm", nbc, np.uint32)
    add("v_bm", nbc, np.uint32)
    add("y_esc_idx", ey, np.int32)
    add("u_esc_idx", ec, np.int32)
    add("v_esc_idx", ec, np.int32)
    add("y_dc", nb, np.int16)
    add("u_dc", nbc, np.int16)
    add("v_dc", nbc, np.int16)
    add("y_esc_val", ey, np.int16)
    add("u_esc_val", ec, np.int16)
    add("v_esc_val", ec, np.int16)
    add("q_y", 64, np.uint16)
    add("q_c", 64, np.uint16)
    add("y_vals", vy, np.int8)
    add("u_vals", vc, np.int8)
    add("v_vals", vc, np.int8)
    layout["__total__"] = (off + 3) // 4 * 4
    return layout


def wire_layout(h0p: int, w0p: int) -> dict:
    """Field -> (byte_offset, n_elements, dtype) layout of the coalesced
    wire, plus "__total__" -> total bytes.

    ALL wire fields — per-plane DC planes, zigzag-dense AC tensors,
    escape lists, qtables, and the per-image [h, w] meta — ride in ONE
    byte buffer per batch: every H2D put pays the tunnel's per-transfer
    latency (docs/PERF.md round 3), so the batch makes exactly one.
    Offsets are pure functions of the canvas; the device slices and
    bitcasts fields out for free (ops/jpeg.wire_fields). Regions are
    naturally aligned.
    """
    assert h0p % 16 == 0 and w0p % 16 == 0, (h0p, w0p)
    nb = (h0p // 8) * (w0p // 8)
    nbc = (h0p // 16) * (w0p // 16)
    ey = max(16, int(nb * ESC_PER_BLOCK))
    ec = max(16, int(nbc * ESC_PER_BLOCK))

    layout = {}
    off = 0

    def add(name, n, dtype):
        nonlocal off
        item = np.dtype(dtype).itemsize
        off = (off + item - 1) // item * item  # natural alignment
        layout[name] = (off, n, np.dtype(dtype))
        off += n * item

    add("h0w0", 2, np.int32)
    add("y_esc_idx", ey, np.int32)
    add("u_esc_idx", ec, np.int32)
    add("v_esc_idx", ec, np.int32)
    add("y_dc", nb, np.int16)
    add("u_dc", nbc, np.int16)
    add("v_dc", nbc, np.int16)
    add("y_esc_val", ey, np.int16)
    add("u_esc_val", ec, np.int16)
    add("v_esc_val", ec, np.int16)
    add("q_y", 64, np.uint16)
    add("q_c", 64, np.uint16)
    add("y_ac", nb * Z_KEEP_Y, np.int8)
    add("u_ac", nbc * Z_KEEP_C, np.int8)
    add("v_ac", nbc * Z_KEEP_C, np.int8)
    layout["__total__"] = (off + 3) // 4 * 4
    return layout


def pack_dct_batch(dcts: Sequence, h0p: int, w0p: int,
                   use_native: bool = True, wire_version: int = 3) -> dict:
    """Pack entropy-decoded images into the fixed-shape device wire.

    Entries may be DCTImage, raw JPEG bytes, or uint8 arrays. Raw bytes
    of a baseline-4:2:0/grayscale JPEG take the fused C++ path
    (entropy decode + pack in one pass, no intermediate coefficient
    buffers — the host hot path); everything else goes through
    as_dct_image + the two-pass per-plane pack.

    h0p/w0p: padded canvas (multiples of 16; evaluation buckets are x64).
    Padding blocks decode to the MEAN_PIXEL canvas fill used everywhere
    else. Returns {"_wire": (B, total_bytes) uint8} — the single H2D
    payload — plus zero-copy per-field views for inspection/tests.
    `use_native=False` forces the NumPy pack (the tested oracle).
    `wire_version`: 3 = zigzag-dense, 4 = bitmap-sparse (~2/3 the bytes).
    """
    if wire_version == 4:
        return _pack_dct_batch_v4(dcts, h0p, w0p, use_native)
    b = len(dcts)
    w8 = w0p // 8
    w16 = w0p // 16
    h8, h16 = h0p // 8, h0p // 16

    layout = wire_layout(h0p, w0p)
    total = layout.pop("__total__")
    data_end = max(off + n * dt.itemsize for off, n, dt in layout.values())
    # np.empty, not zeros: a raw-bytes entry takes the fused C++ path
    # (tf_jpeg_dct_pack), which initializes every field region itself —
    # zeroing 0.7 B/px up front costs ~16 ms/batch32 on the 1-core host.
    # Fallback (DCTImage / transcode) rows are zeroed in pack_image.
    wire = {"_wire": np.empty((b, total), np.uint8)}
    wire["_wire"][:, data_end:] = 0  # tail alignment pad
    for name, (off, n, dtype) in layout.items():
        wire[name] = wire["_wire"][:, off:off + n * dtype.itemsize].view(dtype)

    yn, cbn, crn = _neutral_ycc()
    lib = _native._load() if use_native else None
    if lib is not None:
        _bind(lib)

    def pack_one(coef, nbx_img, grid_h, grid_w, z_keep, neutral_dc, p, i):
        ac = wire[f"{p}_ac"][i].reshape(grid_h * grid_w, z_keep)
        if lib is not None:
            _pack_plane_dense_native(
                lib, coef, nbx_img, grid_h, grid_w, z_keep, neutral_dc,
                wire[f"{p}_dc"][i], ac,
                wire[f"{p}_esc_idx"][i], wire[f"{p}_esc_val"][i])
        else:
            wire[f"{p}_dc"][i] = neutral_dc
            _pack_plane_dense(coef, nbx_img, grid_w, z_keep,
                              wire[f"{p}_dc"][i], ac,
                              wire[f"{p}_esc_idx"][i],
                              wire[f"{p}_esc_val"][i])

    def pack_image(i: int) -> None:
        d = dcts[i]
        if lib is not None and isinstance(d, (bytes, bytearray, memoryview)):
            hw = _pack_fused_native(lib, bytes(d), wire, i, h8, w8)
            if hw is not None:
                wire["h0w0"][i] = hw
                return
        if not isinstance(d, DCTImage):
            d = as_dct_image(d)  # bytes fallback (transcode) / uint8 arrays
        # Two-pass path writes sparsely into pre-zeroed fields.
        wire["_wire"][i, :data_end].fill(0)
        for p in ("y", "u", "v"):
            wire[f"{p}_esc_idx"][i].fill(-1)
        wire["h0w0"][i] = (d.h, d.w)
        # qtables ship in ZIGZAG order — the AC tensors are zigzag-dense
        # and the device basis matrix is zigzag-indexed (ops/jpeg.py).
        wire["q_y"][i] = d.qy
        wire["q_c"][i] = d.qc if d.qc is not None else d.qy

        # Neutral (canvas-fill) DC for blocks no image content covers. The
        # quantized DC of a flat block of value v is 8*(v-128)/q.
        ndc_y = np.round(8.0 * (yn - 128.0) / float(d.qy[0]))
        qc0 = float((d.qc if d.qc is not None else d.qy)[0])
        ndc_u = np.round(8.0 * (cbn - 128.0) / qc0)
        ndc_v = np.round(8.0 * (crn - 128.0) / qc0)

        pack_one(d.y.reshape(-1, 64), d.y.shape[1], h8, w8, Z_KEEP_Y,
                 ndc_y, "y", i)
        if d.cb is not None:
            pack_one(d.cb.reshape(-1, 64), d.cb.shape[1], h16, w16,
                     Z_KEEP_C, ndc_u, "u", i)
            pack_one(d.cr.reshape(-1, 64), d.cr.shape[1], h16, w16,
                     Z_KEEP_C, ndc_v, "v", i)
        else:
            # Grayscale: flat neutral-gray chroma (Cb = Cr = 128 -> DC 0).
            wire["u_dc"][i] = 0
            wire["v_dc"][i] = 0

    if lib is not None and b > 1:
        # images write disjoint batch rows; the C++ packer drops the GIL
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(4, b)) as pool:
            list(pool.map(pack_image, range(b)))
    else:
        for i in range(b):
            pack_image(i)

    return wire


def _pack_dct_batch_v4(dcts: Sequence, h0p: int, w0p: int,
                       use_native: bool = True) -> dict:
    """Wire-v4 (bitmap-sparse) batch pack; see pack_dct_batch."""
    b = len(dcts)
    w8, w16 = w0p // 8, w0p // 16
    h8, h16 = h0p // 8, h0p // 16

    layout = wire_layout_v4(h0p, w0p)
    total = layout.pop("__total__")
    data_end = max(off + n * dt.itemsize for off, n, dt in layout.values())
    wire = {"_wire": np.empty((b, total), np.uint8)}
    wire["_wire"][:, data_end:] = 0
    for name, (off, n, dtype) in layout.items():
        wire[name] = wire["_wire"][:, off:off + n * dtype.itemsize].view(dtype)

    yn, cbn, crn = _neutral_ycc()
    lib = _native._load() if use_native else None
    if lib is not None:
        _bind(lib)

    def pack_one(coef, nbx_img, grid_h, grid_w, z_keep, neutral_dc, p, i):
        if lib is not None:
            _pack_plane_sparse_native(
                lib, coef, nbx_img, grid_h, grid_w, z_keep, neutral_dc,
                wire[f"{p}_dc"][i], wire[f"{p}_bm"][i],
                wire[f"{p}_vals"][i],
                wire[f"{p}_esc_idx"][i], wire[f"{p}_esc_val"][i])
        else:
            wire[f"{p}_dc"][i] = neutral_dc
            _pack_plane_sparse(coef, nbx_img, grid_w, z_keep,
                               wire[f"{p}_vals"].shape[1],
                               wire[f"{p}_dc"][i], wire[f"{p}_bm"][i],
                               wire[f"{p}_vals"][i],
                               wire[f"{p}_esc_idx"][i],
                               wire[f"{p}_esc_val"][i])

    def pack_image(i: int) -> None:
        d = dcts[i]
        if lib is not None and isinstance(d, (bytes, bytearray, memoryview)):
            hwo = _pack_fused_native_v4(lib, bytes(d), wire, i, h8, w8)
            if hwo is not None:
                wire["h0w0"][i] = (*hwo, 0)
                return
        if not isinstance(d, DCTImage):
            d = as_dct_image(d)
        wire["_wire"][i, :data_end].fill(0)
        for p in ("y", "u", "v"):
            wire[f"{p}_esc_idx"][i].fill(-1)
        # two-pass path packs in canvas row-major order (stream_order 0)
        wire["h0w0"][i] = (d.h, d.w, 0, 0)
        wire["q_y"][i] = d.qy
        wire["q_c"][i] = d.qc if d.qc is not None else d.qy

        ndc_y = np.round(8.0 * (yn - 128.0) / float(d.qy[0]))
        qc0 = float((d.qc if d.qc is not None else d.qy)[0])
        ndc_u = np.round(8.0 * (cbn - 128.0) / qc0)
        ndc_v = np.round(8.0 * (crn - 128.0) / qc0)

        pack_one(d.y.reshape(-1, 64), d.y.shape[1], h8, w8, Z_KEEP_Y,
                 ndc_y, "y", i)
        if d.cb is not None:
            pack_one(d.cb.reshape(-1, 64), d.cb.shape[1], h16, w16,
                     Z_KEEP_C, ndc_u, "u", i)
            pack_one(d.cr.reshape(-1, 64), d.cr.shape[1], h16, w16,
                     Z_KEEP_C, ndc_v, "v", i)
        else:
            wire["u_dc"][i] = 0
            wire["v_dc"][i] = 0

    if lib is not None and b > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(4, b)) as pool:
            list(pool.map(pack_image, range(b)))
    else:
        for i in range(b):
            pack_image(i)

    return wire


def wire_bytes(wire: dict) -> int:
    """Total H2D payload of a packed batch (the single coalesced array)."""
    return wire["_wire"].nbytes
