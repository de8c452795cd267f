"""Width-packed layer1 equivalence (ops/packedconv.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
from tinyfaces_tpu.ops import packedconv


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 4 * 8 * 3, dtype=jnp.float32).reshape(2, 4, 8, 3)
    np.testing.assert_array_equal(
        np.asarray(packedconv.unpack_x(packedconv.pack_x(x))), np.asarray(x))


def test_packed_kernels_reproduce_convs():
    """Packed 1x1 and 3x3 convs equal the originals after unpacking."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)).astype(np.float32))

    w1 = jnp.asarray(rng.normal(size=(1, 1, 64, 96)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w1, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = packedconv.unpack_x(packedconv._conv(
        packedconv.pack_x(x), packedconv.pack_kernel_1x1(w1), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    w3 = jnp.asarray(rng.normal(size=(3, 3, 64, 96)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = packedconv.unpack_x(packedconv._conv(
        packedconv.pack_x(x), packedconv.pack_kernel_3x3(w3), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_full_model_packed_layer1_equivalence():
    """conv1_stem + stem_tail_packed_layer1 + apply(layer1_precomputed=True)
    equals the plain module forward."""
    model = TinyFacesDetector(stage_sizes=(2, 1, 1))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (64, 64))
    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    ref = model.apply(variables, x, train=False)

    stem = packedconv.conv1_stem(variables, x, jnp.float32)
    l1 = packedconv.stem_tail_packed_layer1(variables, stem, n_blocks=2,
                                            dtype=jnp.float32)
    got = model.apply(variables, l1, train=False, layer1_precomputed=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_packed_detector_path_matches_default():
    """PyramidDetector(ec.packed_layer1=True) produces the same detections
    as the default fused path."""
    from tinyfaces_tpu.config import DetectorConfig, EvalConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector

    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=(1, 1, 1))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (128, 128))
    variables = {"params": params, "batch_stats": batch_stats}

    ecs = [EvalConfig(max_dets_per_scale=50, max_total_dets=50,
                      packed_layer1=p) for p in (False, True)]
    dets = []
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (128, 192, 3), dtype=np.uint8)
    for ec in ecs:
        det = PyramidDetector(model, variables, templates,
                              cfg=DetectorConfig(), ec=ec)
        dets.append(det.detect(img, prob_thresh=0.2, scales=(0, 1)))
    a, b = dets
    assert a.shape == b.shape
    if a.shape[0]:
        np.testing.assert_allclose(a[:, :4], b[:, :4], atol=1e-2)
        np.testing.assert_allclose(a[:, 4], b[:, 4], atol=1e-3)
