import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.loss import AvgMeter, detection_loss, smooth_l1


def test_smooth_l1_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    a = rng.normal(0, 2, (3, 9)).astype(np.float32)
    b = rng.normal(0, 2, (3, 9)).astype(np.float32)
    got = np.asarray(smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    want = F.smooth_l1_loss(
        torch.from_numpy(a), torch.from_numpy(b), reduction="none"
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def _toy_batch(rng, b=2, h=8, w=8, nt=4):
    output = rng.normal(0, 1, (b, h, w, 5 * nt)).astype(np.float32)
    cls = rng.choice([-1.0, 0.0, 1.0], (b, h, w, nt), p=[0.7, 0.2, 0.1]).astype(np.float32)
    reg = rng.normal(0, 1, (b, h, w, 4 * nt)).astype(np.float32)
    return output, cls, reg


def test_loss_is_finite_and_positive():
    rng = np.random.default_rng(1)
    output, cls, reg = _toy_batch(rng)
    out = detection_loss(
        jnp.asarray(output), jnp.asarray(cls), jnp.asarray(reg),
        jax.random.PRNGKey(0), num_templates=4,
    )
    assert np.isfinite(float(out.total))
    assert float(out.total) > 0
    np.testing.assert_allclose(
        float(out.total), float(out.class_loss) + float(out.reg_loss), rtol=1e-6
    )


def test_reg_loss_only_from_positives():
    rng = np.random.default_rng(2)
    output, cls, reg = _toy_batch(rng)
    cls[:] = -1.0  # no positives anywhere
    out = detection_loss(
        jnp.asarray(output), jnp.asarray(cls), jnp.asarray(reg),
        jax.random.PRNGKey(0), num_templates=4,
    )
    assert float(out.reg_loss) == 0.0


def test_loss_differentiable():
    rng = np.random.default_rng(3)
    output, cls, reg = _toy_batch(rng)

    def f(o):
        return detection_loss(
            o, jnp.asarray(cls), jnp.asarray(reg), jax.random.PRNGKey(1), num_templates=4
        ).total

    g = jax.grad(f)(jnp.asarray(output))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_perfect_predictions_give_small_loss():
    """With logits strongly matching labels and exact regression, hard-negative
    mining ignores everything -> near-zero loss."""
    rng = np.random.default_rng(4)
    nt = 4
    cls = rng.choice([-1.0, 1.0], (1, 8, 8, nt)).astype(np.float32)
    reg = rng.normal(0, 1, (1, 8, 8, 4 * nt)).astype(np.float32)
    output = np.concatenate([cls * 20.0, reg], axis=3)
    out = detection_loss(
        jnp.asarray(output), jnp.asarray(cls), jnp.asarray(reg),
        jax.random.PRNGKey(0), num_templates=nt,
    )
    assert float(out.total) < 1e-6


def test_avg_meter_running_average():
    m = AvgMeter()
    m.update(10.0, 2)
    m.update(20.0, 2)
    assert m.average == (10.0 + 20.0) / 4
    m.reset()
    assert m.average == 0.0 and m.num_averaged == 0
