import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyfaces_tpu.models.detection import (
    DepthwiseConvTranspose2x,
    TinyFacesDetector,
    bilinear_kernel_1d,
)

# Small backbone config so CPU tests stay fast; the real model uses (3, 4, 23).
TINY_STAGES = (1, 1, 1)


def test_bilinear_kernel_values():
    np.testing.assert_allclose(bilinear_kernel_1d(4), [0.25, 0.75, 0.75, 0.25])
    np.testing.assert_allclose(bilinear_kernel_1d(3), [0.5, 1.0, 0.5])


def test_depthwise_upsample_matches_torch_convtranspose():
    """Our depthwise form must equal torch's dense ConvTranspose2d(k4,s2,p1)
    with the reference's diagonal bilinear weights."""
    import torch

    c, h, w = 5, 7, 9
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, h, w, c)).astype(np.float32)

    mod = DepthwiseConvTranspose2x()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    vec = bilinear_kernel_1d(4)
    dense = np.zeros((c, c, 4, 4), dtype=np.float32)
    for i in range(c):
        dense[i, i] = np.outer(vec, vec)
    tconv = torch.nn.ConvTranspose2d(c, c, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(dense))
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    assert got.shape == want.shape == (1, 2 * h, 2 * w, c)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    model = TinyFacesDetector(num_templates=25, stage_sizes=TINY_STAGES)
    dummy = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    return model, variables


def test_output_shape_and_channels(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = jnp.ones((2, 128, 96, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    # stride 8 score map, 125 channels
    assert out.shape == (2, 16, 12, 125)
    assert out.dtype == jnp.float32


def test_odd_input_sizes_crop_correctly(tiny_model_and_vars):
    """500x500 -> 63x63 score grid (the reference's train geometry), and odd
    res3/res4 rounding must be handled by the top-left crop."""
    model, variables = tiny_model_and_vars
    x = jnp.ones((1, 500, 500, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 63, 63, 125)


def test_train_mode_updates_batch_stats(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_gradients_flow(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))

    def f(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )[0]
        return jnp.sum(out**2)

    g = jax.grad(f)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_bf16_compute_fp32_params():
    model = TinyFacesDetector(stage_sizes=TINY_STAGES, dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    out = model.apply(variables, dummy, train=False)
    assert out.dtype == jnp.float32  # cast back at the head


def test_remat_matches_no_remat():
    """jax.checkpoint'd backbone must give identical outputs and gradients."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    m1 = TinyFacesDetector(stage_sizes=TINY_STAGES, remat=False)
    m2 = TinyFacesDetector(stage_sizes=TINY_STAGES, remat=True)
    v = m1.init(jax.random.PRNGKey(0), x, train=False)

    o1 = m1.apply(v, x, train=False)
    o2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    def loss(m, params):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    g2 = jax.grad(lambda p: loss(m2, p))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3)
