"""Wire v4 (bitmap-sparse JPEG DCT wire) tests.

v4 replaces the zigzag-dense int8 AC tensor of wire v3 with a per-block
uint32 nonzero bitmap + uint32 stream offset and an image-wide packed
int8 value stream (data/jpegdct.py, native/jpeg_dct.cpp), reconstructed
on device by popcount-rank + one batched gather (ops/jpeg.py) — ~2/3 the
H2D bytes of v3. Within the same Z_KEEP cutoffs and value-stream budget,
reconstruction must be BIT-IDENTICAL to v3's.
"""

import io

import numpy as np
import pytest

from tinyfaces_tpu.data import jpegdct

from .test_jpegdct import encode, natural_image

pytestmark = pytest.mark.skipif(
    not jpegdct.is_available(), reason="native library unavailable"
)


def _recon(wire, h0p, w0p, version):
    import jax.numpy as jnp

    from tinyfaces_tpu.ops.jpeg import (
        dct4_batch_to_normalized,
        dct_batch_to_normalized,
    )

    fn = dct4_batch_to_normalized if version == 4 else dct_batch_to_normalized
    return np.asarray(fn({"_wire": jnp.asarray(wire["_wire"])}, h0p, w0p))


def test_v4_reconstruction_bit_identical_to_v3():
    """Same JPEGs through both wires -> identical normalized RGB (the
    packed values and escapes are the same numbers, only the wire
    encoding differs)."""
    h, w = 128, 192
    jpegs = [encode(natural_image(h, w, seed=s), quality=92)
             for s in range(3)]
    w3 = jpegdct.pack_dct_batch(jpegs, h, w)
    w4 = jpegdct.pack_dct_batch(jpegs, h, w, wire_version=4)
    assert w4["_wire"].nbytes < 0.8 * w3["_wire"].nbytes
    np.testing.assert_array_equal(
        _recon(w3, h, w, 3), _recon(w4, h, w, 4))


def test_v4_pack_paths_agree():
    """Fused C++ (MCU-order stream), two-pass C++ and NumPy oracle
    (canvas-order stream) reconstruct identically; the canvas-order
    paths agree byte-for-byte."""
    h, w = 128, 128
    jpegs = [encode(natural_image(h, w, seed=7), quality=90)]
    dcts = [jpegdct.parse_jpeg_dct(j) for j in jpegs]
    fused = jpegdct.pack_dct_batch(jpegs, h, w, wire_version=4)
    twopass = jpegdct.pack_dct_batch(dcts, h, w, wire_version=4)
    oracle = jpegdct.pack_dct_batch(dcts, h, w, wire_version=4,
                                    use_native=False)
    np.testing.assert_array_equal(twopass["_wire"], oracle["_wire"])
    np.testing.assert_array_equal(
        _recon(fused, h, w, 4), _recon(twopass, h, w, 4))


def test_v4_grayscale_and_padding():
    """Grayscale JPEG + canvas padding: padded region reconstructs to the
    MEAN_PIXEL canvas fill, like v3."""
    h, w = 64, 64
    data = encode(natural_image(h, w, seed=3, color=False)[..., 0],
                  quality=90)
    w4 = jpegdct.pack_dct_batch([data], 128, 128, wire_version=4)
    w3 = jpegdct.pack_dct_batch([data], 128, 128)
    np.testing.assert_array_equal(
        _recon(w3, 128, 128, 3), _recon(w4, 128, 128, 4))


def test_v4_stream_overflow_truncates_and_counts():
    """A pure-noise image overflows the per-plane value budget: the tail
    is dropped (never garbage) and counted in truncation_stats."""
    img = (np.random.default_rng(1).integers(0, 255, (64, 64, 3))
           .astype(np.uint8))
    d = jpegdct.parse_jpeg_dct(encode(img, quality=95))
    before = jpegdct.truncation_stats()["truncated_coeffs"]
    w4 = jpegdct.pack_dct_batch([d], 64, 64, wire_version=4)
    assert jpegdct.truncation_stats()["truncated_coeffs"] > before
    # every shipped bitmap bit has a value inside the stream budget
    # (offsets are device-derived cumsums of these popcounts)
    for p in ("y", "u", "v"):
        pc = np.bitwise_count(w4[f"{p}_bm"][0].astype(np.uint64)).astype(
            np.int64)
        assert int(pc.sum()) <= w4[f"{p}_vals"].shape[1]
    # reconstruction stays finite / in range
    r = _recon(w4, 64, 64, 4)
    assert np.isfinite(r).all()


def test_v4_escape_values_roundtrip():
    """|quantized AC| > 127 rides the escape list and lands exactly, as
    in v3 (synthetic coefficients, two-pass path)."""
    coef = np.zeros((8, 8, 64), np.int16)
    coef[0, 0, 0] = 40
    coef[0, 0, 1] = 300       # escape
    coef[2, 3, 5] = -200      # escape
    coef[2, 3, 2] = 7
    qt = np.ones(64, np.uint16)
    d = jpegdct.DCTImage(64, 64, coef, None, None, qt, None)
    w4 = jpegdct.pack_dct_batch([d], 64, 64, wire_version=4)
    w3 = jpegdct.pack_dct_batch([d], 64, 64)
    np.testing.assert_array_equal(
        _recon(w3, 64, 64, 3), _recon(w4, 64, 64, 4))
    assert (w4["y_esc_val"][0] != 0).sum() == 2


def test_v4_detector_transfer_matches_v3():
    """transfer="jpegdct4" end-to-end through PyramidDetector produces
    identical detections to transfer="jpegdct"."""
    import jax

    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model

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
    det3 = PyramidDetector(model, variables, templates,
                           cfg=DetectorConfig(), ec=ec, transfer="jpegdct")
    det4 = PyramidDetector(model, variables, templates,
                           cfg=DetectorConfig(), ec=ec, transfer="jpegdct4")

    data = encode(natural_image(128, 128, seed=9, color=False), quality=92)
    a = det3.detect_batch([data], prob_thresh=0.4, scales=(0,))[0]
    b = det4.detect_batch([data], prob_thresh=0.4, scales=(0,))[0]
    np.testing.assert_allclose(a, b)


def test_v4_wire_layout_budget():
    """Layout invariants: disjoint naturally-aligned fields, total under
    0.5 B/px at the 768x1024 bench canvas (v3 is 0.70)."""
    h0p, w0p = 768, 1024
    layout = jpegdct.wire_layout_v4(h0p, w0p)
    total = layout.pop("__total__")
    spans = []
    for name, (off, n, dt) in layout.items():
        assert off % dt.itemsize == 0, name
        spans.append((off, off + n * dt.itemsize))
    spans.sort()
    for (_, e0), (s1, _) in zip(spans, spans[1:]):
        assert e0 <= s1
    assert spans[-1][1] <= total
    assert total / (h0p * w0p) < 0.5


def test_v4_color_padding_mcu_order_offsets():
    """Color image smaller than the canvas: the fused decoder's Y stream
    is MCU-ordered over the IMAGE grid while the device cumsums over the
    STATIC canvas MCU raster — equal because uncovered canvas MCUs have
    popcount 0. Must stay bit-identical to v3."""
    h, w = 80, 112  # 5x7 MCUs inside a 128x128 (8x8-MCU) canvas
    data = encode(natural_image(h, w, seed=21), quality=90)
    w4 = jpegdct.pack_dct_batch([data], 128, 128, wire_version=4)
    assert int(w4["h0w0"][0, 2]) == 1  # fused color path: MCU order
    w3 = jpegdct.pack_dct_batch([data], 128, 128)
    np.testing.assert_array_equal(
        _recon(w3, 128, 128, 3), _recon(w4, 128, 128, 4))
