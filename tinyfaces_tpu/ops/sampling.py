"""On-device hard-negative mining and pos/neg balance sampling.

The reference does this with a device->host->device round trip per batch
(loss.py:47-57 `.cpu().numpy()` + models/utils.py:103-139 NumPy shuffles).
Here both stages are jitted XLA with explicit PRNG keys, eliminating the
host crossing entirely.

Semantics reproduced:
* hard_negative_mining (loss.py:59-63): recompute the elementwise
  soft-margin loss on detached logits and set the label to 0 (ignore)
  wherever loss < thresh — i.e. keep only "hard" examples (note this also
  drops easy positives, as in the reference).
* balance_sampling (models/utils.py:103-139): cap positives at
  sample_size*pos_fraction (=128) by random subset, then cap negatives at
  pos_maxnum*(1-f)/f (=128, computed from the *constant* cap, not the
  surviving positive count — reference quirk at utils.py:126, reproduced).

Exact-K uniform subset selection is done by ranking i.i.d. uniform keys:
keep a candidate iff its key is among the K smallest candidate keys. This
matches np.random.permutation-based selection in distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_margin_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise log(1 + exp(-y*x)), numerically stable (== softplus(-y*x))."""
    return jax.nn.softplus(-targets * logits)


def hard_negative_mining(
    logits: jnp.ndarray, class_map: jnp.ndarray, loss_thresh: float = 0.03
) -> jnp.ndarray:
    """Zero (ignore) labels whose detached soft-margin loss is below thresh."""
    loss = soft_margin_loss(jax.lax.stop_gradient(logits), class_map)
    return jnp.where(loss < loss_thresh, 0.0, class_map)


def _keep_random_k(
    candidates: jnp.ndarray, k: int, key: jax.Array
) -> jnp.ndarray:
    """Bool mask keeping a uniformly-random exact-K subset of `candidates`.

    If fewer than K candidates exist, all are kept. `candidates` is a flat
    bool array; K must be static.
    """
    if k >= candidates.shape[0]:
        return candidates
    u = jax.random.uniform(key, candidates.shape)
    ranked = jnp.where(candidates, u, jnp.inf)
    # K-th smallest candidate key (kth_val == +inf when #candidates < K).
    kth_val = -jax.lax.top_k(-ranked, k)[0][-1]
    return candidates & (ranked <= kth_val)


def balance_sample(
    class_map: jnp.ndarray,  # (..., ) any shape, labels in {-1, 0, +1}
    key: jax.Array,
    sample_size: int = 256,
    pos_fraction: float = 0.5,
) -> jnp.ndarray:
    """Randomly zero out excess positives/negatives for one sample."""
    pos_max = int(sample_size * pos_fraction)
    neg_max = int(pos_max * (1 - pos_fraction) / pos_fraction)

    flat = class_map.reshape(-1)
    kp, kn = jax.random.split(key)

    pos_keep = _keep_random_k(flat == 1.0, pos_max, kp)
    neg_keep = _keep_random_k(flat == -1.0, neg_max, kn)

    out = jnp.where((flat == 1.0) & ~pos_keep, 0.0, flat)
    out = jnp.where((flat == -1.0) & ~neg_keep, 0.0, out)
    return out.reshape(class_map.shape)


def balance_sample_batch(
    class_map: jnp.ndarray,  # (B, ...)
    key: jax.Array,
    sample_size: int = 256,
    pos_fraction: float = 0.5,
) -> jnp.ndarray:
    keys = jax.random.split(key, class_map.shape[0])
    return jax.vmap(
        lambda c, k: balance_sample(c, k, sample_size, pos_fraction)
    )(class_map, keys)
