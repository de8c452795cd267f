import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.ops.assignment import assign_targets, compute_pad_mask
from tests.oracle import assign_oracle

RF = dict(ofx=-1.0, ofy=-1.0, stx=8.0, sty=8.0)
POS, NEG = 0.7, 0.3


def make_templates(rng, nt):
    w = rng.uniform(8, 120, nt)
    h = rng.uniform(8, 120, nt)
    return np.stack([-w / 2, -h / 2, w / 2, h / 2, np.ones(nt)], axis=1)


def run_both(gt, gt_valid, templates, vsy=20, vsx=20, paste=(0, 0, 160, 160), seed=0):
    key = jax.random.PRNGKey(seed)
    tj = jnp.asarray(templates, jnp.float32)
    pad_mask = compute_pad_mask(
        jnp.asarray(paste, jnp.float32), tj, vsx=vsx, vsy=vsy, **RF
    )
    cls, reg, iou = assign_targets(
        jnp.asarray(gt, jnp.float32),
        jnp.asarray(gt_valid),
        pad_mask,
        tj,
        key,
        pos_thresh=POS,
        neg_thresh=NEG,
        **RF,
    )

    # Oracle consumes the exact same perturbation the device op drew.
    noise_shape = (vsy, vsx, templates.shape[0], gt.shape[0])
    noise = np.asarray(jax.random.uniform(key, noise_shape, dtype=jnp.float32), np.float64)
    valid_rows = np.asarray(gt_valid)
    cls_o, reg_o = assign_oracle(
        np.asarray(gt, np.float64)[valid_rows],
        np.asarray(pad_mask),
        templates.astype(np.float64),
        noise[..., valid_rows],
        pos_thresh=POS,
        neg_thresh=NEG,
        **RF,
    )
    return np.asarray(cls), np.asarray(reg), cls_o, reg_o


def test_matches_oracle_random_scene():
    rng = np.random.default_rng(0)
    templates = make_templates(rng, 6)
    gt = np.array(
        [
            [10.0, 10.0, 60.0, 70.0],
            [80.0, 20.0, 130.0, 90.0],
            [40.0, 90.0, 150.0, 158.0],
            [0.0, 0.0, 0.0, 0.0],  # padding row
        ]
    )
    gt_valid = np.array([True, True, True, False])
    cls, reg, cls_o, reg_o = run_both(gt, gt_valid, templates)
    np.testing.assert_array_equal(cls, cls_o)
    # Regression compared only where it matters (positives drive the loss),
    # since float32-vs-float64 argmax ties can differ on irrelevant anchors.
    pos = cls_o > 0
    pos4 = np.concatenate([pos] * 4, axis=2)
    np.testing.assert_allclose(reg[pos4], reg_o[pos4], atol=1e-4)


def test_degenerate_boxes_are_dropped():
    rng = np.random.default_rng(1)
    templates = make_templates(rng, 4)
    gt = np.array([[50.0, 50.0, 40.0, 90.0], [20.0, 20.0, 70.0, 80.0]])  # first is degenerate
    gt_valid = np.array([True, True])
    cls, reg, cls_o, reg_o = run_both(gt, gt_valid, templates, seed=3)
    np.testing.assert_array_equal(cls, cls_o)


def test_no_gt_all_negative_zero_regression():
    rng = np.random.default_rng(2)
    templates = make_templates(rng, 4)
    gt = np.zeros((3, 4))
    gt_valid = np.zeros(3, dtype=bool)
    cls, reg, cls_o, reg_o = run_both(gt, gt_valid, templates, seed=4)
    np.testing.assert_array_equal(cls, cls_o)  # all -1
    assert (cls == -1).all()
    np.testing.assert_array_equal(reg, np.zeros_like(reg))


def test_every_valid_gt_gets_an_anchor():
    """Rule 1: each GT whose best IoU clears neg_thresh owns a positive anchor."""
    rng = np.random.default_rng(3)
    templates = make_templates(rng, 8)
    gt = np.array([[30.0, 30.0, 80.0, 90.0], [100.0, 100.0, 140.0, 150.0]])
    gt_valid = np.array([True, True])
    cls, _, _, _ = run_both(gt, gt_valid, templates, seed=5)
    assert (cls == 1).sum() >= 2


def test_border_anchors_ignored():
    rng = np.random.default_rng(4)
    templates = make_templates(rng, 4)
    vsy = vsx = 20
    # paste box covering a small interior window -> most anchors are border
    paste = (60, 60, 100, 100)
    gt = np.array([[62.0, 62.0, 98.0, 98.0]])
    gt_valid = np.array([True])
    key = jax.random.PRNGKey(7)
    tj = jnp.asarray(templates, jnp.float32)
    pad_mask = compute_pad_mask(jnp.asarray(paste, jnp.float32), tj, vsx=vsx, vsy=vsy, **RF)
    cls, reg, _ = assign_targets(
        jnp.asarray(gt, jnp.float32), jnp.asarray(gt_valid), pad_mask, tj, key,
        pos_thresh=POS, neg_thresh=NEG, **RF,
    )
    cls = np.asarray(cls)
    pm = np.asarray(pad_mask)
    # border anchors are never positive
    assert not (cls[pm] == 1).any()


def test_pad_mask_flip_mirrors_x():
    rng = np.random.default_rng(5)
    templates = jnp.asarray(make_templates(rng, 4), jnp.float32)
    paste = jnp.asarray((0, 0, 100, 160), jnp.float32)
    m = compute_pad_mask(paste, templates, vsx=20, vsy=20, flip=False, **RF)
    mf = compute_pad_mask(paste, templates, vsx=20, vsy=20, flip=True, **RF)
    np.testing.assert_array_equal(np.asarray(mf), np.asarray(m)[:, ::-1, :])
