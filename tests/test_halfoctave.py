"""Arbitrary (non-integer-octave) pyramid scales in the FUSED path.

The reference evaluates integer octaves only (evaluation.py:27,
scales=(-2,-1,0,1)), but its sizing formula — torchvision
F.resize(int(min_side * factor)) — is defined for any float factor, and
half-octave pyramids are a standard eval-time densification. The fused
single-dispatch program supports them by shipping exact host-computed
(float64-truncated) per-level sizes (pyramid_level_sizes_np) instead of
the in-program integer-octave arithmetic.
"""

import numpy as np
import pytest

from tinyfaces_tpu.evaluation import pyramid_level_sizes_np


def _ref_sizes(h, w, factor):
    """Loop-level transcription of the reference sizing
    (reference evaluation.py:44-47 + _detect_host_resize): Python float64
    truncation for the short side, torchvision's int(size * long / short)
    for the long side."""
    min_side = min(h, w)
    target_short = max(1, int(min_side * factor))
    if w < h:
        return max(1, int(target_short * h / w)), target_short
    return target_short, max(1, int(target_short * w / h))


@pytest.mark.parametrize("factor", [
    2.0 ** -1.5, 2.0 ** -0.5, 2.0 ** 0.5, 0.75, 1.25, 1.0 / 3.0,
])
def test_level_sizes_match_reference_formula(factor):
    rng = np.random.default_rng(int(factor * 1e6))
    hs = rng.integers(1, 4097, 200)
    ws = rng.integers(1, 4097, 200)
    got = pyramid_level_sizes_np(hs, ws, factor)
    for i in range(len(hs)):
        th, tw = _ref_sizes(int(hs[i]), int(ws[i]), factor)
        assert (got[i, 0], got[i, 1]) == (th, tw), (hs[i], ws[i], factor)


def test_level_sizes_truncation_boundaries():
    """Products that land exactly on / just below integers — where f32
    in-program arithmetic could flip the floor (the reason sizes are
    host-computed in float64)."""
    # 0.75 * 512 = 384.0 exactly; 0.75 * 511 = 383.25
    got = pyramid_level_sizes_np([512, 511], [512, 511], 0.75)
    assert got[0].tolist() == [384, 384]
    assert got[1].tolist() == [383, 383]
    # sqrt(2)/2 * 1024 = 724.077...; truncates to 724
    got = pyramid_level_sizes_np([1024], [2048], 2.0 ** -0.5)
    th, tw = _ref_sizes(1024, 2048, 2.0 ** -0.5)
    assert got[0].tolist() == [th, tw]


def test_fused_halfoctave_matches_host_resize_path():
    """Fused half-octave pyramid vs the per-scale host-resize path with
    the SAME resampling kernel (resample="pil") — detections must agree
    to the same tolerance the integer-octave test pins
    (tests/test_pilresize.py)."""
    from tests.test_pilresize import _tiny_detector

    det = _tiny_detector("pil")
    yy, xx = np.mgrid[0:100, 0:140]
    plane = np.clip(128 + 60 * np.sin(xx / 19.0) + 50 * np.cos(yy / 13.0),
                    0, 255).astype(np.uint8)
    img = np.stack([plane, plane, plane], axis=-1)

    scales = (-1.5, -0.5, 0.5)
    ref = det._detect_host_resize(img, prob_thresh=0.3, nms_thresh=0.3,
                                  scales=scales)
    got = det.detect_batch([img], prob_thresh=0.3, nms_thresh=0.3,
                           scales=scales)[0]
    assert got.shape == ref.shape
    if ref.shape[0]:
        order_r = np.lexsort(ref[:, :4].T)
        order_g = np.lexsort(got[:, :4].T)
        np.testing.assert_allclose(got[order_g, :4], ref[order_r, :4],
                                   atol=2e-2)
        np.testing.assert_allclose(got[order_g, 4], ref[order_r, 4],
                                   atol=5e-3)


def test_fused_halfoctave_jpegdct_smoke():
    """Half-octave scales over the jpegdct wire: raw JPEG bytes in, fused
    decode + arbitrary-scale pyramid, detections out — and the batch
    path agrees with itself across batch sizes (padding invariance)."""
    import io

    from PIL import Image

    from tests.test_pilresize import _tiny_detector

    det = _tiny_detector("linear", transfer="jpegdct")
    rng = np.random.default_rng(3)
    imgs = []
    for h, w in ((96, 128), (80, 112)):
        yy, xx = np.mgrid[0:h, 0:w]
        plane = np.clip(128 + 50 * np.sin(xx / 17.0) + 40 * np.cos(yy / 11.0)
                        + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(np.stack([plane] * 3, -1)).save(
            buf, "JPEG", quality=92, subsampling=2)
        imgs.append(buf.getvalue())

    scales = (-0.5, 0.0, 0.5)
    both = det.detect_batch(imgs, prob_thresh=0.3, nms_thresh=0.3,
                            scales=scales)
    solo = det.detect_batch([imgs[0]], prob_thresh=0.3, nms_thresh=0.3,
                            scales=scales)[0]
    assert len(both) == 2
    for d in both:
        assert d.ndim == 2 and d.shape[1] == 5
    # same image, same bucket canvas: batch-of-2 vs batch-of-1 must agree
    np.testing.assert_allclose(
        np.sort(both[0], axis=0), np.sort(solo, axis=0), atol=1e-4)
