"""PIL-bilinear-matched device resize (ops/pilresize.py) and the
EvalConfig.resample="pil" fused-pyramid mode.

The reference resamples every pyramid level with PIL bilinear on uint8
(reference evaluation.py:40-50); these tests pin our reproduction
byte-exactly against LIVE PIL (the host oracle) and within +-1/255 on
<0.1% of bytes for the on-device f32 version, then pin the fused
resample="pil" path against the host_resize reference path end-to-end.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from tinyfaces_tpu.ops.pilresize import (
    resize_pil_bilinear,
    resize_pil_bilinear_np,
)


@pytest.mark.parametrize("h,w,oh,ow", [
    (100, 140, 50, 70),     # 2x down
    (97, 131, 194, 262),    # 2x up, odd sizes
    (250, 250, 125, 125),
    (33, 47, 66, 94),
    (60, 80, 33, 44),       # non-integer ratio down
    (75, 75, 150, 150),
    (64, 64, 64, 64),       # identity
    (50, 70, 37, 52),       # non-integer ratio
])
def test_host_oracle_byte_exact_vs_pil(h, w, oh, ow):
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
    got = resize_pil_bilinear_np(img, oh, ow)
    np.testing.assert_array_equal(got, ref)


def test_device_f32_within_one_lsb():
    rng = np.random.default_rng(7)
    tot = bad = 0
    for (h, w, oh, ow) in [(100, 140, 50, 70), (97, 131, 194, 262),
                           (33, 47, 66, 94), (60, 80, 33, 44)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        ref = np.asarray(
            Image.fromarray(img).resize((ow, oh), Image.BILINEAR)
        ).astype(np.int32)
        got = np.asarray(resize_pil_bilinear(
            jnp.asarray(img, jnp.float32), (oh, ow),
            (jnp.int32(oh), jnp.int32(ow)),
            (jnp.int32(h), jnp.int32(w)))).astype(np.int32)
        d = np.abs(got - ref)
        assert d.max() <= 1
        tot += d.size
        bad += int((d > 0).sum())
    assert bad / tot < 1e-3, (bad, tot)


def test_device_dynamic_sizes_inside_padded_canvas():
    """True (h, w) smaller than the padded dims — the fused pyramid's
    per-image case. Valid region matches PIL; scale comes from the
    dynamic sizes, not the padded dims."""
    rng = np.random.default_rng(9)
    h, w, oh, ow = 90, 120, 45, 60
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    pad = np.zeros((128, 128, 3), np.float32)
    pad[:h, :w] = img
    got = np.asarray(resize_pil_bilinear(
        jnp.asarray(pad), (64, 64),
        (jnp.int32(oh), jnp.int32(ow)),
        (jnp.int32(h), jnp.int32(w))))[:oh, :ow].astype(np.int32)
    ref = np.asarray(
        Image.fromarray(img).resize((ow, oh), Image.BILINEAR)).astype(np.int32)
    assert np.abs(got - ref).max() <= 1


def _tiny_detector(resample, transfer="rgb"):
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
    ec = EvalConfig(max_dets_per_scale=64, max_total_dets=64,
                    resample=resample)
    return PyramidDetector(
        model, {"params": params, "batch_stats": batch_stats},
        templates, cfg=DetectorConfig(), ec=ec, transfer=transfer)


def test_fused_pil_resample_matches_host_resize_path():
    """resample="pil" fused path vs detect(host_resize=True) — the SAME
    resampling kernel (host PIL vs on-device match), same model: the
    multi-scale detections must agree tightly. The default linear
    resample only agrees within a documented looser tolerance
    (tests/test_pipeline_parity.py)."""
    det = _tiny_detector("pil")
    yy, xx = np.mgrid[0:100, 0:140]
    plane = np.clip(128 + 60 * np.sin(xx / 19.0) + 50 * np.cos(yy / 13.0),
                    0, 255).astype(np.uint8)
    img = np.stack([plane, plane, plane], axis=-1)

    ref = det._detect_host_resize(img, prob_thresh=0.3, nms_thresh=0.3,
                                  scales=(-1, 0, 1))
    got = det.detect_batch([img], prob_thresh=0.3, nms_thresh=0.3,
                           scales=(-1, 0, 1))[0]
    assert got.shape == ref.shape
    if ref.shape[0]:
        order_r = np.lexsort(ref[:, :4].T)
        order_g = np.lexsort(got[:, :4].T)
        np.testing.assert_allclose(got[order_g, :4], ref[order_r, :4],
                                   atol=2e-2)
        np.testing.assert_allclose(got[order_g, 4], ref[order_r, 4],
                                   atol=5e-3)


def test_pil_resample_requires_rgb_transfer():
    with pytest.raises(ValueError, match="transfer='rgb'"):
        _tiny_detector("pil", transfer="jpegdct")
    with pytest.raises(ValueError, match="resample"):
        _tiny_detector("nearest")
