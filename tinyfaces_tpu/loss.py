"""Detection loss: masked soft-margin classification + smooth-L1 regression.

Capability parity with DetectionCriterion (tinyfaces/models/loss.py:24-97):
  total = sum(mask_cls * softmargin(cls_logits, labels))
        + reg_weight * sum(mask_reg * smooth_l1(reg_pred, reg_targets))
with mask_cls = (label != 0), mask_reg = (label > 0) tiled over the four
tx/ty/tw/th blocks, after online hard-negative mining and balance sampling
(both on-device here — the reference round-trips labels through NumPy).

Layout note: the reference is NCHW with channels [0:T) classification and
[T:5T) regression; this framework is NHWC with the same channel ordering in
the last axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tinyfaces_tpu.ops.sampling import (
    balance_sample_batch,
    hard_negative_mining,
    soft_margin_loss,
)


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    class_loss: jnp.ndarray
    reg_loss: jnp.ndarray


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise SmoothL1 with beta=1 (PyTorch default, loss.py:34)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def detection_loss(
    output: jnp.ndarray,  # (B, H, W, 5T) NHWC model output
    class_map: jnp.ndarray,  # (B, H, W, T) labels in {-1, 0, +1}
    regress_map: jnp.ndarray,  # (B, H, W, 4T) regression targets
    key: jax.Array,
    *,
    num_templates: int = 25,
    reg_weight: float = 1.0,
    pos_fraction: float = 0.5,
    sample_size: int = 256,
    hard_neg_thresh: float = 0.03,
) -> LossBreakdown:
    nt = num_templates
    cls_logits = output[..., :nt]
    reg_pred = output[..., nt:]

    # Label refinement (no gradient flows through either stage).
    labels = hard_negative_mining(cls_logits, class_map, hard_neg_thresh)
    labels = balance_sample_batch(labels, key, sample_size, pos_fraction)
    labels = jax.lax.stop_gradient(labels)

    cls_mask = (labels != 0.0).astype(output.dtype)
    cls_loss = jnp.sum(cls_mask * soft_margin_loss(cls_logits, labels))

    reg_mask = jnp.tile((labels > 0.0).astype(output.dtype), (1, 1, 1, 4))
    reg_loss = jnp.sum(reg_mask * smooth_l1(reg_pred, regress_map))

    total = cls_loss + reg_weight * reg_loss
    return LossBreakdown(total=total, class_loss=cls_loss, reg_loss=reg_loss)


class AvgMeter:
    """Host-side running average over sample count (reference loss.py:7-21)."""

    def __init__(self):
        self.average = 0.0
        self.num_averaged = 0

    def update(self, loss: float, size: int) -> None:
        n = self.num_averaged
        m = n + size
        self.average = ((n * self.average) + float(loss)) / m
        self.num_averaged = m

    def reset(self) -> None:
        self.average = 0.0
        self.num_averaged = 0
