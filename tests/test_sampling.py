import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.ops.sampling import (
    balance_sample,
    balance_sample_batch,
    hard_negative_mining,
    soft_margin_loss,
)


def test_soft_margin_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(0, 3, (4, 7)).astype(np.float32)
    y = rng.choice([-1.0, 0.0, 1.0], (4, 7)).astype(np.float32)
    got = np.asarray(soft_margin_loss(jnp.asarray(x), jnp.asarray(y)))
    want = F.soft_margin_loss(
        torch.from_numpy(x), torch.from_numpy(y), reduction="none"
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_mining_zeroes_easy_examples():
    logits = jnp.array([[10.0, -10.0, 0.0, -10.0]])
    labels = jnp.array([[1.0, -1.0, 1.0, 1.0]])
    out = np.asarray(hard_negative_mining(logits, labels, 0.03))
    # confident correct predictions (low loss) -> ignored
    np.testing.assert_array_equal(out, [[0.0, 0.0, 1.0, 1.0]])


def test_balance_caps_positives_and_negatives():
    rng = np.random.default_rng(1)
    labels = rng.choice([-1.0, 1.0], size=(63, 63, 25), p=[0.9, 0.1]).astype(np.float32)
    out = np.asarray(balance_sample(jnp.asarray(labels), jax.random.PRNGKey(0)))
    assert (out == 1).sum() == 128
    assert (out == -1).sum() == 128
    # only zeroing happened; no label flipped sign
    flipped = (labels == 1) & (out == -1) | (labels == -1) & (out == 1)
    assert not flipped.any()


def test_balance_keeps_scarce_positives():
    labels = np.zeros((63, 63, 25), dtype=np.float32) - 1.0  # all negative
    labels[0, 0, :5] = 1.0
    out = np.asarray(balance_sample(jnp.asarray(labels), jax.random.PRNGKey(1)))
    assert (out == 1).sum() == 5
    assert (out == -1).sum() == 128


def test_batch_uses_independent_keys():
    labels = np.full((2, 40, 40, 4), -1.0, dtype=np.float32)
    out = np.asarray(balance_sample_batch(jnp.asarray(labels), jax.random.PRNGKey(2)))
    sel0 = out[0] == -1
    sel1 = out[1] == -1
    assert sel0.sum() == 128 and sel1.sum() == 128
    assert (sel0 != sel1).any()


def test_selection_is_uniformly_random():
    labels = np.full((1000,), 1.0, dtype=np.float32)
    counts = np.zeros(1000)
    for i in range(40):
        out = np.asarray(balance_sample(jnp.asarray(labels), jax.random.PRNGKey(i)))
        counts += out == 1
    # each element selected with p = 128/1000; 40 trials -> mean 5.12
    assert counts.mean() == 40 * 128 / 1000
    assert counts.std() < 4.0
