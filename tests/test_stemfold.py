"""Folded 2x stem (ops/stemfold.py): the exact-2.0 bilinear upsample
composed with the 7x7/2 stem conv equals one 5x5/1 conv at 1x resolution.

Pinned against the unfolded ops the fused pyramid otherwise runs
(jax.image.scale_and_translate + lax conv, evaluation.py): borders at
fp32-rounding level (identical linear operator via band recomputation;
only the band resize's matmul contraction size differs), interior within
summation-order rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyfaces_tpu.ops.stemfold import PHASE_G, fold_stem_kernel, folded_stem_2x

DN = ("NHWC", "HWIO", "NHWC")


def reference_stem(x, w7):
    """The unfolded path: exact-2x scale_and_translate + 7x7/2 conv, the op
    sequence the fused pyramid uses for the scale-2 level."""
    b, h, w, c = x.shape

    def one(img):
        return jax.image.scale_and_translate(
            img, (2 * h, 2 * w, c), (0, 1),
            jnp.asarray([2.0, 2.0], jnp.float32), jnp.zeros(2, jnp.float32),
            method="linear", antialias=True,
        )

    u = jax.vmap(one)(x)
    return jax.lax.conv_general_dilated(
        u, w7, (2, 2), ((3, 3), (3, 3)), dimension_numbers=DN)


def test_phase_matrix_matches_scale_and_translate():
    """PHASE_G's closed form reproduces jax's polyphase weights: probe delta
    signals through scale_and_translate and read off the coefficients."""
    n = 16
    eye = jnp.eye(n, dtype=jnp.float64)
    # U[m, j]: contribution of x[j] to u[m] (1-D, length n -> 2n).
    up = jax.vmap(
        lambda col: jax.image.scale_and_translate(
            col[:, None], (2 * n, 1), (0, 1),
            jnp.asarray([2.0, 1.0], jnp.float32), jnp.zeros(2, jnp.float32),
            method="linear", antialias=True,
        )[:, 0],
        out_axes=1,
    )(eye)
    u_mat = np.asarray(up)
    n0 = n // 2  # interior output row
    for k in range(7):
        m = 2 * n0 + k - 3  # the u row conv tap k reads for output n0
        row = u_mat[m]
        for d in range(-2, 3):
            assert row[n0 + d] == pytest.approx(PHASE_G[k, d + 2], abs=1e-12)
        assert np.sum(row) == pytest.approx(1.0, abs=1e-12)


def test_fold_kernel_shape():
    w7 = jnp.asarray(np.random.default_rng(0).standard_normal((7, 7, 3, 8)),
                     jnp.float32)
    k5 = fold_stem_kernel(w7)
    assert k5.shape == (5, 5, 3, 8)
    # Mass conservation: each output tap's total weight is preserved
    # (both G columns sum to 1 per tap).
    np.testing.assert_allclose(np.asarray(k5.sum((0, 1))),
                               np.asarray(w7.sum((0, 1))), rtol=1e-5)


@pytest.mark.parametrize("hw", [(32, 32), (64, 96), (48, 160)])
def test_folded_equals_unfolded_fp32(hw):
    h, w = hw
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 16)) * 0.1, jnp.float32)

    ref = np.asarray(reference_stem(x, w7))
    got = np.asarray(folded_stem_2x(x, w7))
    assert got.shape == ref.shape == (2, h, w, 16)

    # Border strips apply the identical linear operator via the original op
    # sequence on 6-px bands; only the resize matmul's contraction size
    # differs, so agreement must be at fp32-rounding level (~1e-6) — orders
    # of magnitude below what a mishandled edge renormalization would show
    # (~0.25 * |activation|).
    np.testing.assert_allclose(got[:, :2], ref[:, :2], atol=2e-6)
    np.testing.assert_allclose(got[:, -2:], ref[:, -2:], atol=2e-6)
    np.testing.assert_allclose(got[:, :, :2], ref[:, :, :2], atol=2e-6)
    np.testing.assert_allclose(got[:, :, -2:], ref[:, :, -2:], atol=2e-6)

    # Interior: same linear map, different fp summation order.
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_folded_equals_unfolded_bf16_tolerance():
    """In the model compute dtype the two paths agree to bf16 resolution."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.bfloat16)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 8)) * 0.1, jnp.bfloat16)
    ref = np.asarray(reference_stem(x, w7), np.float32)
    got = np.asarray(folded_stem_2x(x, w7), np.float32)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.03 * scale)


def test_fused_pyramid_detections_match_with_fold():
    """End-to-end: the fused pyramid with fold_stem on/off produces the same
    detection set (fp32, CPU)."""
    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector, get_model

    templates = load_templates()
    model, variables = get_model(num_templates=25)
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)

    dets = {}
    for fold in (False, True):
        det = PyramidDetector(
            model, variables, templates, cfg=DetectorConfig(),
            ec=EvalConfig(prob_thresh=-2.0, fold_stem=fold),
        )
        dets[fold] = det.detect(img)

    a, b = dets[False], dets[True]
    assert a.shape == b.shape
    # Same survivors, near-identical geometry/scores. Random-init weights +
    # prob_thresh=-2 produce arbitrarily large regressed boxes, so compare
    # relatively (fold-vs-unfold differs only in fp summation order).
    np.testing.assert_allclose(a[:, :4], b[:, :4], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(a[:, 4], b[:, 4], rtol=1e-4, atol=1e-3)


def test_fused_pyramid_fold_ragged_image():
    """Fold equivalence for an image that does NOT fill its padded canvas
    (h0 < h0p): the per-image resize factor is still exactly 2.0 (integer
    short side), and the image/padding seam is interior to the canvas, so
    the folded path must match there too."""
    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector, get_model

    templates = load_templates()
    model, variables = get_model(num_templates=25)
    rng = np.random.default_rng(23)
    img = rng.integers(0, 255, (95, 117, 3), dtype=np.uint8)  # odd, < canvas

    dets = {}
    for fold in (False, True):
        det = PyramidDetector(
            model, variables, templates, cfg=DetectorConfig(),
            ec=EvalConfig(prob_thresh=-2.0, fold_stem=fold),
        )
        dets[fold] = det.detect(img)

    a, b = dets[False], dets[True]
    assert a.shape == b.shape
    np.testing.assert_allclose(a[:, :4], b[:, :4], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(a[:, 4], b[:, 4], rtol=1e-4, atol=1e-3)
