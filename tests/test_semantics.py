"""Cross-cutting semantic properties: jit-vs-eager equality and the
flip-mirror symmetry of GT assignment."""

import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.config import DetectorConfig
from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.loss import detection_loss
from tinyfaces_tpu.ops.assignment import assign_targets, compute_pad_mask

RF = dict(ofx=-1.0, ofy=-1.0, stx=8.0, sty=8.0)


def _scene(seed=0, g=6, n_valid=4):
    rng = np.random.default_rng(seed)
    gt = np.zeros((g, 4), np.float32)
    for i in range(n_valid):
        x1, y1 = rng.uniform(5, 90, 2)
        gt[i] = [x1, y1, x1 + rng.uniform(10, 50), y1 + rng.uniform(10, 50)]
    valid = np.arange(g) < n_valid
    return gt, valid


def test_assignment_jit_matches_eager():
    templates = load_templates()
    tj = jnp.asarray(templates, jnp.float32)
    gt, valid = _scene()
    pad = compute_pad_mask(jnp.asarray([0, 0, 160, 160], jnp.float32), tj,
                           vsx=20, vsy=20, **RF)
    key = jax.random.PRNGKey(0)

    def f(gt_, v_, p_, k_):
        return assign_targets(gt_, v_, p_, tj, k_,
                              pos_thresh=0.7, neg_thresh=0.3, **RF)[:2]

    eager = f(jnp.asarray(gt), jnp.asarray(valid), pad, key)
    jitted = jax.jit(f)(jnp.asarray(gt), jnp.asarray(valid), pad, key)
    for a, b in zip(eager, jitted):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_loss_jit_matches_eager():
    rng = np.random.default_rng(1)
    out = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 125)).astype(np.float32))
    cls = jnp.asarray(rng.choice([-1.0, 0.0, 1.0], (2, 8, 8, 25)).astype(np.float32))
    reg = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 100)).astype(np.float32))
    key = jax.random.PRNGKey(2)

    eager = detection_loss(out, cls, reg, key)
    jitted = jax.jit(lambda o, c, r, k: detection_loss(o, c, r, k))(out, cls, reg, key)
    np.testing.assert_allclose(float(eager.total), float(jitted.total), rtol=1e-6)


def test_assignment_flip_mirror_symmetry():
    """Mirroring the scene (boxes + pad mask) mirrors the class map.

    Uses symmetric templates and a mirror-symmetric grid (anchors at x and
    W-1-x coincide), so labels must be exactly mirrored up to tie-break
    noise; we use well-separated boxes so noise cannot flip labels."""
    templates = load_templates()
    tj = jnp.asarray(templates, jnp.float32)
    vsx = vsy = 20
    width = (vsx - 1) * 8.0  # grid span so mirrored anchors align: x' = span - x

    gt, valid = _scene(seed=3, n_valid=3)
    # mirror boxes around the anchor-grid center (anchor_x = -1 + 8k)
    gtm = gt.copy()
    gtm[:, 0] = (width - 2.0) - gt[:, 2]
    gtm[:, 2] = (width - 2.0) - gt[:, 0]

    pad = jnp.zeros((vsy, vsx, templates.shape[0]), bool)
    key = jax.random.PRNGKey(4)

    cls_a, _, _ = assign_targets(
        jnp.asarray(gt), jnp.asarray(valid), pad, tj, key,
        pos_thresh=0.7, neg_thresh=0.3, **RF,
    )
    cls_b, _, _ = assign_targets(
        jnp.asarray(gtm), jnp.asarray(valid), pad, tj, jax.random.PRNGKey(5),
        pos_thresh=0.7, neg_thresh=0.3, **RF,
    )
    a = np.asarray(cls_a)
    b = np.asarray(cls_b)[:, ::-1, :]
    # allow disagreement only at noise-level ties: require > 99.9% equality
    assert (a == b).mean() > 0.999
