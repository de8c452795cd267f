import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.ops.dense_overlap import compute_dense_overlap
from tests.oracle import dense_overlap_oracle


def make_templates(rng, nt):
    w = rng.uniform(4, 80, nt)
    h = rng.uniform(4, 80, nt)
    return np.stack([-w / 2, -h / 2, w / 2, h / 2, np.ones(nt)], axis=1)


def test_matches_oracle_small_grid():
    rng = np.random.default_rng(0)
    templates = make_templates(rng, 5)
    gt = np.array(
        [
            [3.0, 7.0, 45.0, 60.0],
            [100.0, 120.0, 140.0, 190.0],
            [-10.0, -5.0, 20.0, 18.0],
        ]
    )
    got = compute_dense_overlap(
        -1.0, -1.0, 8.0, 8.0, 16, 12, jnp.asarray(templates, jnp.float32), jnp.asarray(gt, jnp.float32)
    )
    want = dense_overlap_oracle(-1, -1, 8, 8, 16, 12, templates, gt)
    assert got.shape == (12, 16, 5, 3)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_gt_mask_zeroes_invalid_rows():
    rng = np.random.default_rng(1)
    templates = make_templates(rng, 3)
    gt = np.array([[0.0, 0.0, 30.0, 30.0], [5.0, 5.0, 25.0, 25.0]])
    mask = jnp.array([True, False])
    got = compute_dense_overlap(
        -1.0, -1.0, 8.0, 8.0, 8, 8, jnp.asarray(templates, jnp.float32),
        jnp.asarray(gt, jnp.float32), mask,
    )
    assert float(jnp.max(got[..., 1])) == 0.0
    assert float(jnp.max(got[..., 0])) > 0.0


def test_jittable_and_range():
    rng = np.random.default_rng(2)
    templates = jnp.asarray(make_templates(rng, 25), jnp.float32)
    gt = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 400, 50),
                rng.uniform(0, 400, 50),
                rng.uniform(400, 500, 50),
                rng.uniform(400, 500, 50),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    fn = jax.jit(
        lambda t, g: compute_dense_overlap(-1.0, -1.0, 8.0, 8.0, 63, 63, t, g)
    )
    out = fn(templates, gt)
    assert out.shape == (63, 63, 25, 50)
    assert float(jnp.min(out)) >= 0.0
    assert float(jnp.max(out)) <= 1.0 + 1e-6
