import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.ops.decode import decode_scores, valid_template_mask


def test_template_pruning_reproduces_reference_dead_branch():
    """Only type-A ids 4..11 are ever valid (SURVEY.md §2.5: the reference's
    scale checks always zero the scale-2.0 type-B templates)."""
    templates = load_templates()
    for scale in (0.25, 0.5, 1.0, 2.0):
        mask = valid_template_mask(templates, scale)
        np.testing.assert_array_equal(np.where(mask)[0], np.arange(4, 12))


def test_template_pruning_natural_enables_type_b_at_upsampled_scales():
    """pruning="natural" (the reference branch's intent / Hu's MATLAB):
    the type-B tiny templates (18..24, natural scale 2.0) fire at pyramid
    scales > 1 only; downsampled/identity levels match the reference mask.
    The default remains the reference dead-branch behavior."""
    templates = load_templates()
    for scale in (0.25, 0.5, 1.0):
        np.testing.assert_array_equal(
            valid_template_mask(templates, scale, pruning="natural"),
            valid_template_mask(templates, scale))
    mask2 = valid_template_mask(templates, 2.0, pruning="natural")
    np.testing.assert_array_equal(
        np.where(mask2)[0],
        np.concatenate([np.arange(4, 12), np.arange(18, 25)]))
    # default arg is the reference behavior
    np.testing.assert_array_equal(
        valid_template_mask(templates, 2.0),
        valid_template_mask(templates, 2.0, pruning="reference"))


def test_decode_emits_type_b_under_natural_pruning():
    """A peak on a type-B channel is decoded under natural pruning at an
    upsampled scale, and suppressed under reference pruning."""
    import jax

    templates = load_templates()
    nt = templates.shape[0]
    out = _make_output(10, 12, nt, [(4, 6, 20, 3.0)])  # type-B id 20

    def run(pruning):
        vids = tuple(int(i) for i in np.nonzero(
            valid_template_mask(templates, 2.0, pruning=pruning))[0])
        return decode_scores(
            jnp.asarray(out), jnp.asarray(templates, jnp.float32), None,
            prob_thresh=0.5, stride=8.0, offset=-1.0, scale=2.0, k=5,
            valid_ids=vids,
        )

    assert int(run("natural").valid.sum()) == 1
    assert int(run("reference").valid.sum()) == 0


def _make_output(h, w, nt, peaks):
    """Score map with logit peaks at given (y, x, t) and -10 elsewhere."""
    out = np.full((h, w, 5 * nt), 0.0, np.float32)
    out[:, :, :nt] = -10.0
    for (y, x, t, logit) in peaks:
        out[y, x, t] = logit
    return out


def test_decode_recovers_anchor_boxes():
    templates = load_templates()
    nt = templates.shape[0]
    out = _make_output(10, 12, nt, [(3, 5, 6, 2.0), (7, 2, 8, 1.0)])

    dets = decode_scores(
        jnp.asarray(out), jnp.asarray(templates, jnp.float32),
        jnp.asarray(valid_template_mask(templates, 1.0)),
        prob_thresh=0.5, stride=8.0, offset=-1.0, scale=1.0, k=5,
    )
    assert int(dets.valid.sum()) == 2
    # top hit: (3, 5, template 6), zero regression -> anchor box itself
    cx, cy = 5 * 8 - 1, 3 * 8 - 1
    cw = templates[6, 2] - templates[6, 0] + 1
    ch = templates[6, 3] - templates[6, 1] + 1
    want = [cx - cw / 2, cy - ch / 2, cx + cw / 2, cy + ch / 2]
    np.testing.assert_allclose(np.asarray(dets.boxes[0]), want, atol=1e-4)
    np.testing.assert_allclose(float(dets.scores[0]), 2.0, atol=1e-6)


def test_decode_applies_regression_and_scale():
    templates = load_templates()
    nt = templates.shape[0]
    out = _make_output(8, 8, nt, [(4, 4, 5, 3.0)])
    # tx=1, tw=log(2): center shifts +w, width doubles
    out[4, 4, nt + 5] = 1.0
    out[4, 4, 3 * nt + 5] = np.log(2.0)

    scale = 2.0
    dets = decode_scores(
        jnp.asarray(out), jnp.asarray(templates, jnp.float32),
        jnp.asarray(valid_template_mask(templates, scale)),
        prob_thresh=0.5, stride=8.0, offset=-1.0, scale=scale, k=3,
    )
    cw = templates[5, 2] - templates[5, 0] + 1
    ch = templates[5, 3] - templates[5, 1] + 1
    cx, cy = 4 * 8 - 1 + cw, 4 * 8 - 1  # shifted by cw * tx
    want = np.array([cx - cw, cy - ch / 2, cx + cw, cy + ch / 2]) / scale
    np.testing.assert_allclose(np.asarray(dets.boxes[0]), want, rtol=1e-5)


def test_decode_masks_invalid_templates_and_padding():
    templates = load_templates()
    nt = templates.shape[0]
    # peak on an always-invalid template id 0, and one outside valid region
    out = _make_output(8, 8, nt, [(2, 2, 0, 5.0), (6, 6, 7, 5.0), (1, 1, 7, 4.0)])
    dets = decode_scores(
        jnp.asarray(out), jnp.asarray(templates, jnp.float32),
        jnp.asarray(valid_template_mask(templates, 1.0)),
        prob_thresh=0.5, stride=8.0, offset=-1.0, scale=1.0, k=5,
        valid_hw=(jnp.int32(5), jnp.int32(5)),  # (6,6) outside
    )
    assert int(dets.valid.sum()) == 1
    np.testing.assert_allclose(float(dets.scores[0]), 4.0)


def test_exact_top_k_matches_monolithic():
    """Two-stage exact_top_k must reproduce lax.top_k exactly — values AND
    indices, including lowest-index tie-breaking across group boundaries."""
    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.ops.decode import exact_top_k

    rng = np.random.default_rng(0)
    n, k = 8192, 100
    # heavy ties: quantized values force cross-group tie-breaks
    x = jnp.asarray(np.round(rng.standard_normal(n), 1).astype(np.float32))

    rv, ri = jax.lax.top_k(x, k)
    tv, ti = exact_top_k(x, k)
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(tv))
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(ti))

    # fallback + odd shapes: small input, prime length, k ~ n
    for n2, k2 in ((512, 64), (997, 64), (4096, 4000)):
        x2 = jnp.asarray(rng.standard_normal(n2).astype(np.float32))
        rv2, ri2 = jax.lax.top_k(x2, k2)
        tv2, ti2 = exact_top_k(x2, k2)
        np.testing.assert_array_equal(np.asarray(rv2), np.asarray(tv2))
        np.testing.assert_array_equal(np.asarray(ri2), np.asarray(ti2))
