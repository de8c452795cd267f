"""Fused Pallas assignment vs the XLA reference path (interpret mode on CPU).

The two paths use different tie-break noise streams, so comparisons allow
mismatches only where the underlying IoU has near-ties (within the 1e-6
noise amplitude); on random continuous scenes those are rare to absent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyfaces_tpu.ops.assignment import assign_targets, compute_pad_mask
from tinyfaces_tpu.ops.pallas_assignment import (
    assign_targets_fused,
    dense_assignment_reductions,
)
from tinyfaces_tpu.ops.dense_overlap import compute_dense_overlap

RF = dict(ofx=-1.0, ofy=-1.0, stx=8.0, sty=8.0)


def make_scene(seed, vsy=20, vsx=24, nt=6, g=8, n_valid=5):
    rng = np.random.default_rng(seed)
    w = rng.uniform(8, 120, nt)
    h = rng.uniform(8, 120, nt)
    templates = np.stack([-w / 2, -h / 2, w / 2, h / 2, np.ones(nt)], axis=1)
    gt = np.zeros((g, 4), np.float32)
    for i in range(n_valid):
        x1, y1 = rng.uniform(0, 120, 2)
        gt[i] = [x1, y1, x1 + rng.uniform(10, 70), y1 + rng.uniform(10, 70)]
    valid = np.arange(g) < n_valid
    return templates, gt, valid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_reductions_match_xla(seed):
    vsy, vsx = 20, 24
    templates, gt, valid = make_scene(seed, vsy, vsx)

    best_iou, best_gt, pgt_max, pgt_idx = dense_assignment_reductions(
        jnp.asarray(gt), jnp.asarray(valid), jnp.asarray(templates, jnp.float32),
        jnp.int32(seed), vsx=vsx, vsy=vsy, interpret=True, **RF,
    )

    iou = compute_dense_overlap(
        RF["ofx"], RF["ofy"], RF["stx"], RF["sty"], vsx, vsy,
        jnp.asarray(templates, jnp.float32), jnp.asarray(gt), jnp.asarray(valid),
    )
    iou_np = np.asarray(iou)
    iou_masked = np.where(valid[None, None, None, :], iou_np, -1.0)

    # best-iou within noise amplitude of the unperturbed max
    want_best = iou_masked.max(axis=3)
    np.testing.assert_allclose(np.asarray(best_iou), want_best, atol=2e-6)

    # best_gt agrees wherever the top-2 gap exceeds the noise amplitude
    part = np.sort(iou_masked, axis=3)
    gap = part[..., -1] - part[..., -2] if iou_masked.shape[3] > 1 else np.ones_like(want_best)
    decisive = gap > 3e-6
    got_gt = np.asarray(best_gt)
    want_gt = iou_masked.argmax(axis=3)
    assert (got_gt[decisive] == want_gt[decisive]).all()

    # per-GT reductions
    flat = iou_masked.reshape(-1, gt.shape[0])
    np.testing.assert_allclose(np.asarray(pgt_max), flat.max(axis=0), atol=2e-6)
    fgap = np.sort(flat, axis=0)[-1] - np.sort(flat, axis=0)[-2]
    fdecisive = fgap > 3e-6
    assert (np.asarray(pgt_idx)[fdecisive] == flat.argmax(axis=0)[fdecisive]).all()


@pytest.mark.parametrize("seed", [3, 4])
def test_fused_assignment_matches_xla_labels(seed):
    vsy, vsx = 20, 24
    templates, gt, valid = make_scene(seed, vsy, vsx)
    tj = jnp.asarray(templates, jnp.float32)
    pad_mask = compute_pad_mask(
        jnp.asarray([0, 0, 170, 150], jnp.float32), tj, vsx=vsx, vsy=vsy, **RF
    )
    key = jax.random.PRNGKey(seed)

    cls_x, reg_x, _ = assign_targets(
        jnp.asarray(gt), jnp.asarray(valid), pad_mask, tj, key,
        pos_thresh=0.7, neg_thresh=0.3, **RF,
    )
    cls_p, reg_p = assign_targets_fused(
        jnp.asarray(gt), jnp.asarray(valid), pad_mask, tj, key,
        pos_thresh=0.7, neg_thresh=0.3, interpret=True, **RF,
    )

    cls_x, cls_p = np.asarray(cls_x), np.asarray(cls_p)
    # labels agree except at noise-level ties/threshold boundaries (rare)
    mismatch = (cls_x != cls_p).mean()
    assert mismatch < 0.002, f"label mismatch rate {mismatch}"

    # regression targets agree wherever the best-GT choice agrees
    agree = np.concatenate([(cls_x == cls_p) & (cls_x > 0)] * 4, axis=2)
    np.testing.assert_allclose(
        np.asarray(reg_p)[agree], np.asarray(reg_x)[agree], atol=1e-4
    )


def test_fused_no_valid_gt():
    vsy, vsx = 12, 12
    templates, gt, _ = make_scene(7, vsy, vsx)
    tj = jnp.asarray(templates, jnp.float32)
    pad_mask = compute_pad_mask(
        jnp.asarray([0, 0, 96, 96], jnp.float32), tj, vsx=vsx, vsy=vsy, **RF
    )
    cls, reg = assign_targets_fused(
        jnp.asarray(gt), jnp.zeros(gt.shape[0], bool), pad_mask, tj,
        jax.random.PRNGKey(0), pos_thresh=0.7, neg_thresh=0.3, interpret=True, **RF,
    )
    assert (np.asarray(cls) == -1).all()
    assert (np.asarray(reg) == 0).all()
