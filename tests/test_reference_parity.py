"""Direct parity tests against the reference implementation's NumPy modules.

When the upstream checkout is present (read-only at /root/reference), its
torch-free modules are imported as live oracles: dense_overlap, metrics,
and models/utils (decode + balance sampling). Skipped cleanly when absent.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
if not (REF / "tinyfaces").exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)


def _load_ref(name: str, rel: str):
    """Import a torch-free reference module by path (the package __init__s
    pull in unavailable deps like pyclust/torchvision)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_dense_overlap_mod = _load_ref("ref_dense_overlap", "tinyfaces/datasets/dense_overlap.py")
ref_metrics_mod = _load_ref("ref_metrics", "tinyfaces/metrics.py")
ref_utils_mod = _load_ref("ref_model_utils", "tinyfaces/models/utils.py")

import jax
import jax.numpy as jnp

from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.ops.boxes import rect_dist as our_rect_dist
from tinyfaces_tpu.ops.decode import decode_scores, valid_template_mask
from tinyfaces_tpu.ops.dense_overlap import compute_dense_overlap as our_overlap


def _random_templates(rng, nt=25):
    w = rng.uniform(6, 150, nt)
    h = rng.uniform(6, 150, nt)
    return np.stack([-w / 2, -h / 2, w / 2, h / 2, np.ones(nt)], axis=1)


def test_dense_overlap_parity():
    ref_overlap = ref_dense_overlap_mod.compute_dense_overlap

    rng = np.random.default_rng(0)
    tpl = _random_templates(rng, 7)
    g = 5
    x1 = rng.uniform(-20, 400, g)
    y1 = rng.uniform(-20, 400, g)
    gt = np.stack([x1, y1, x1 + rng.uniform(5, 120, g), y1 + rng.uniform(5, 120, g)], 1)

    want = ref_overlap(
        -1, -1, 8, 8, 21, 17,
        tpl[:, 0], tpl[:, 1], tpl[:, 2], tpl[:, 3],
        gt[:, 0], gt[:, 1], gt[:, 2], gt[:, 3], 1, 1,
    )
    got = np.asarray(
        our_overlap(-1.0, -1.0, 8.0, 8.0, 21, 17,
                    jnp.asarray(tpl, jnp.float32), jnp.asarray(gt, jnp.float32))
    )
    assert want.shape == got.shape == (17, 21, 7, 5)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rect_dist_parity():
    ref_rect_dist = ref_metrics_mod.rect_dist

    rng = np.random.default_rng(1)
    n = 100
    a = np.stack([rng.uniform(0, 200, n), rng.uniform(0, 200, n),
                  rng.uniform(200, 400, n), rng.uniform(200, 400, n)], 1)
    b = np.stack([rng.uniform(0, 300, n), rng.uniform(0, 300, n),
                  rng.uniform(100, 500, n), rng.uniform(100, 500, n)], 1)
    want = ref_rect_dist(a.copy(), b.copy())
    got = np.asarray(our_rect_dist(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voc_ap_parity():
    ref_voc_ap = ref_metrics_mod.voc_ap
    from tinyfaces_tpu.metrics import voc_ap as our_voc_ap

    rng = np.random.default_rng(2)
    for _ in range(10):
        rec = np.sort(rng.uniform(0, 1, 50))
        prec = rng.uniform(0, 1, 50)
        np.testing.assert_allclose(our_voc_ap(rec, prec), ref_voc_ap(rec, prec),
                                   rtol=1e-10)


def test_decode_parity_with_reference_get_bboxes():
    """Our static top-K device decode against the reference's dynamic NumPy
    get_bboxes (models/utils.py:4-100) on identical score maps.

    Upstream bug note: utils.py:44 writes `prob_cls[:, :, invalid] = 0` on a
    (B, H, W, T) array — that indexes the WIDTH axis, not templates (and
    IndexErrors outright for maps narrower than 25 columns). We implement
    the documented intent (template-axis pruning, SURVEY.md §2.5). To
    compare the shared geometry/refinement/threshold semantics here, the
    test suppresses scores in the reference-affected width columns for both
    sides and disables our template mask (the reference's never engages)."""
    ref_get_bboxes = ref_utils_mod.get_bboxes

    templates = load_templates()
    nt = templates.shape[0]
    rng = np.random.default_rng(3)
    h, w = 14, 30  # w >= 25 or the reference decode crashes
    rf = {"stride": [8, 8], "offset": [-1, -1]}
    bad_cols = np.concatenate([np.arange(0, 4), np.arange(12, 25)])

    for scale in (0.5, 1.0, 2.0):
        score_cls = rng.normal(-4, 2, (1, h, w, nt)).astype(np.float32)
        score_cls[:, :, bad_cols, :] = -40.0  # below threshold everywhere
        score_reg = rng.normal(0, 0.4, (1, h, w, 4 * nt)).astype(np.float32)
        prob_cls = 1 / (1 + np.exp(-score_cls))

        ref_boxes, ref_scores = ref_get_bboxes(
            score_cls.copy(), score_reg.copy(), prob_cls.copy(),
            templates, 0.2, rf, scale,
        )

        # our decode consumes the (H, W, 5T) fused layout
        output = np.concatenate([score_cls[0], score_reg[0]], axis=2)
        dets = decode_scores(
            jnp.asarray(output), jnp.asarray(templates, jnp.float32),
            jnp.ones(nt, dtype=bool),
            prob_thresh=0.2, stride=8.0, offset=-1.0, scale=scale, k=512,
        )
        n = int(dets.valid.sum())
        assert n == ref_boxes.shape[0], (n, ref_boxes.shape[0], scale)

        got = np.asarray(dets.boxes[:n])
        got_scores = np.asarray(dets.scores[:n])
        # match rows by sorting both sets identically
        o1 = np.lexsort(got.T)
        o2 = np.lexsort(ref_boxes.T)
        np.testing.assert_allclose(got[o1], ref_boxes[o2], rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(
            np.sort(got_scores), np.sort(ref_scores[:, 0]), atol=1e-4
        )


def test_balance_sampling_parity_counts():
    ref_balance = ref_utils_mod.balance_sampling
    from tinyfaces_tpu.ops.sampling import balance_sample

    rng = np.random.default_rng(4)
    labels = rng.choice([-1.0, 0.0, 1.0], (40, 40, 25), p=[0.75, 0.05, 0.2])

    ref_out = ref_balance(labels.copy(), pos_fraction=0.5)
    our_out = np.asarray(
        balance_sample(jnp.asarray(labels, jnp.float32), jax.random.PRNGKey(0))
    )
    # identical cap semantics: same surviving counts per class
    assert (ref_out == 1).sum() == (our_out == 1).sum() == 128
    assert (ref_out == -1).sum() == (our_out == -1).sum() == 128
    # zeroing only (no sign flips) in both
    assert not (((labels == 1) & (our_out == -1)) | ((labels == -1) & (our_out == 1))).any()
