import numpy as np
import jax.numpy as jnp

from tinyfaces_tpu.ops.boxes import jaccard_index, pairwise_iou, rect_dist
from tests.oracle import rect_dist_oracle


def random_boxes(n, rng, scale=100.0):
    x1 = rng.uniform(0, scale, n)
    y1 = rng.uniform(0, scale, n)
    w = rng.uniform(1, scale / 2, n)
    h = rng.uniform(1, scale / 2, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1)


def test_rect_dist_matches_oracle():
    rng = np.random.default_rng(0)
    a = random_boxes(64, rng)
    b = random_boxes(64, rng)
    got = np.asarray(rect_dist(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    want = rect_dist_oracle(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rect_dist_identical_boxes():
    rng = np.random.default_rng(1)
    a = random_boxes(16, rng)
    got = np.asarray(rect_dist(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_rect_dist_disjoint_boxes():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[100.0, 100.0, 110.0, 110.0]])
    got = np.asarray(rect_dist(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, 1.0)


def test_jaccard_index_basic():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    assert float(jaccard_index(a, a)) == 1.0
    b = jnp.array([5.0, 0.0, 15.0, 10.0])
    np.testing.assert_allclose(float(jaccard_index(a, b)), 50.0 / 150.0, rtol=1e-6)


def test_pairwise_iou_symmetry_and_diag():
    rng = np.random.default_rng(2)
    boxes = jnp.asarray(random_boxes(32, rng), jnp.float32)
    m = np.asarray(pairwise_iou(boxes, boxes))
    np.testing.assert_allclose(m, m.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-6)
    assert (m >= 0).all() and (m <= 1 + 1e-6).all()
