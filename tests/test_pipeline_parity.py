"""Full detection-pipeline A/B parity: reference composition vs ours.

Round 1 pinned every stage separately (model logits atol 2e-4 in
test_convert, decode geometry, dense overlap, NMS); this module closes the
remaining gap by A/B'ing the COMPOSED pipeline end-to-end:

  side A (reference semantics, /root/reference/tinyfaces/evaluation.py:20-87):
      PIL per-scale resize with torchvision's truncating shorter-side sizing
      -> model forward on the EXACT unpadded resized shape
      -> the reference's own NumPy `get_bboxes` (models/utils.py:4-100),
         imported live with its one documented indexing bug repaired (see
         below) -> float64 greedy NMS oracle (torchvision semantics; the
         env has no torchvision) -> (N, 5) survivors.

  side B (ours): PyramidDetector.detect(host_resize=True) — bucketed padded
      static shapes, on-device top-K decode, fixpoint NMS, one fused fetch.
      Plus the fully fused device-resize path with a documented looser
      tolerance (different resampling kernel).

Both sides share one Flax model + weights: torch-model parity is already
established independently (tests/test_convert.py full-depth atol 5e-4), so
the Flax forward stands in for the torch forward and the test isolates
composition differences (resize arithmetic, padding, masking, top-K caps,
NMS) — exactly the risk VERDICT.md round 1 flagged.

Upstream-bug note (CLAUDE.md "known upstream bugs"): reference
models/utils.py:44 writes `prob_cls[:, :, invalid_template_id] = 0` on a
(B, H, W, T) array — zeroing WIDTH columns instead of template channels
(and crashing for maps narrower than 25 px). The published protocol (and
our decode) prunes template CHANNELS. Side A repairs that single line at
import time (textual patch, asserted present) so both sides implement the
documented intent; everything else in `get_bboxes` runs verbatim.

Robustness: random-init score logits cluster near 0 (prob ~0.5), so the
classification channels of the head are rescaled to spread probabilities,
and prob_thresh is picked at the WIDEST gap in side A's sorted probability
distribution (asserted > GAP_MIN) — the host-resize comparison can never
hinge on a borderline threshold flip, because both sides' forward numerics
agree to far better than the gap.
"""

from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
if not (REF / "tinyfaces").exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    pytest.skip("Pillow required", allow_module_level=True)

import jax
import jax.numpy as jnp

from tests.oracle import greedy_nms_oracle
from tinyfaces_tpu.config import DetectorConfig, EvalConfig
from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.data.targets import normalize_images
from tinyfaces_tpu.evaluation import PyramidDetector
from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model

TINY_STAGES = (1, 1, 1)
NMS_THRESH = 0.3
GAP_MIN = 3e-4  # required width of the probability gap around prob_thresh
# (the two sides' forward numerics agree to ~1e-6 in prob space, so even
# the minimum acceptable gap has ~100x headroom against threshold flips)

BUGGED_LINE = "prob_cls[:, :, invalid_template_id] = 0.0"
FIXED_LINE = "prob_cls[:, :, :, invalid_template_id] = 0.0"


def _load_ref_get_bboxes():
    """Import the reference's live get_bboxes with utils.py:44 repaired."""
    src = (REF / "tinyfaces/models/utils.py").read_text()
    assert BUGGED_LINE in src, "upstream bug line moved — revisit this patch"
    ns: dict = {}
    exec(compile(src.replace(BUGGED_LINE, FIXED_LINE), "ref_utils_fixed", "exec"), ns)
    return ns["get_bboxes"]


ref_get_bboxes = _load_ref_get_bboxes()


@pytest.fixture(scope="module")
def shared_model():
    """One Flax model + weights for both sides. Only the 25 classification
    channels of the final 1x1 conv are rescaled (spreads sigmoid probs over
    (0,1)); regression channels stay at init scale so exp(tw) stays sane."""
    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(
        model, jax.random.PRNGKey(42), input_size=(128, 128)
    )
    params = jax.device_get(params)

    def _boost(tree):
        # Shape the random-init cls response like a trained detector's:
        # raw logits already spread (std ~1.9); bias them to mean ~-4.5 so
        # most positions score near 0 with a sparse high-probability tail —
        # realistic candidate counts, and the O(N^2) float64 oracle NMS
        # stays tractable.
        for k, v in tree.items():
            if isinstance(v, dict):
                _boost(v)
            elif k == "bias" and v.ndim == 1 and v.shape[0] == 125:
                v = np.array(v)
                v[:25] -= 5.0
                tree[k] = v
        return tree

    params = _boost(params)
    variables = {"params": params, "batch_stats": batch_stats}
    return model, variables, templates


def _side_a_maps(model, variables, templates, image_u8, scales):
    """Reference per-scale resize + forward: list of (cls, reg, prob, scale),
    each on the EXACT unpadded resized shape."""
    pil = Image.fromarray(image_u8)
    w, h = pil.size
    min_side = min(w, h)
    nt = templates.shape[0]

    maps = []
    for s in scales:
        scale = 2.0**s
        size = int(min_side * scale)
        # torchvision F.resize(int) PIL sizing (truncating)
        if w < h:
            tw, th = size, int(size * h / w)
        else:
            th, tw = size, int(size * w / h)
        if (tw, th) == (w, h):
            resized = np.asarray(pil)
        else:
            resized = np.asarray(pil.resize((tw, th), Image.BILINEAR))

        x = normalize_images(jnp.asarray(resized[None]))
        out = np.asarray(model.apply(variables, x, train=False), np.float32)
        score_cls = out[..., :nt]
        score_reg = out[..., nt:]
        prob_cls = (1.0 / (1.0 + np.exp(-score_cls.astype(np.float64)))).astype(
            np.float32
        )
        maps.append((score_cls, score_reg, prob_cls, scale))
    return maps


def _pick_thresh(maps, templates, lo=0.25, hi=0.75):
    """prob_thresh at the widest gap of the valid-template probability
    distribution within [lo, hi]; returns (thresh, gap_width)."""
    from tinyfaces_tpu.ops.decode import valid_template_mask

    vals = []
    for _, _, prob, scale in maps:
        mask = valid_template_mask(templates, scale)
        p = prob[0][..., mask].ravel()
        vals.append(p[(p > lo) & (p < hi)])
    vals = np.sort(np.concatenate(vals + [np.array([lo, hi])]))
    gaps = np.diff(vals)
    i = int(np.argmax(gaps))
    return float((vals[i] + vals[i + 1]) / 2), float(gaps[i])


def _reference_decode_nms(maps, templates, prob_thresh, nms_thresh):
    """get_bboxes (live, bug-repaired) per scale + float64 oracle NMS."""
    rf = {"stride": (8, 8), "offset": (-1, -1)}
    dets = np.empty((0, 5))
    for score_cls, score_reg, prob_cls, scale in maps:
        boxes, scores = ref_get_bboxes(
            score_cls.copy(), score_reg.copy(), prob_cls.copy(),
            templates, prob_thresh, rf, scale,
        )
        dets = np.vstack([dets, np.hstack([boxes, scores])])
    keep = greedy_nms_oracle(dets[:, :4], dets[:, 4], nms_thresh)
    survivors = dets[keep]
    return survivors[np.argsort(-survivors[:, 4], kind="stable")]


def _reference_pipeline(model, variables, templates, image_u8,
                        prob_thresh, nms_thresh=NMS_THRESH,
                        scales=(-1, 0, 1)):
    maps = _side_a_maps(model, variables, templates, image_u8, scales)
    return _reference_decode_nms(maps, templates, prob_thresh, nms_thresh)


def _sorted_by_score(d):
    return d[np.argsort(-d[:, 4], kind="stable")]


@pytest.mark.parametrize("hw", [(256, 256), (250, 335), (199, 173)])
def test_full_pipeline_parity_host_resize(shared_model, hw):
    """Composed pipeline A/B at multiple image sizes (square = zero padding
    at every scale; the others exercise bucket padding + valid_hw masks)."""
    model, variables, templates = shared_model
    rng = np.random.default_rng(hash(hw) % 2**32)
    img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)

    maps = _side_a_maps(model, variables, templates, img, (-1, 0, 1))
    prob_thresh, gap = _pick_thresh(maps, templates)
    assert gap > GAP_MIN, f"fixture too dense near every threshold: {gap}"
    want = _reference_decode_nms(maps, templates, prob_thresh, NMS_THRESH)

    det = PyramidDetector(
        model, variables, templates, cfg=DetectorConfig(),
        ec=EvalConfig(max_dets_per_scale=1024, max_total_dets=512),
    )
    got = _sorted_by_score(
        det.detect(img, prob_thresh, NMS_THRESH, scales=(-1, 0, 1),
                   host_resize=True)
    )

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got[:, :4], want[:, :4], atol=1e-2)
    np.testing.assert_allclose(got[:, 4], want[:, 4], atol=1e-3)


def test_full_pipeline_parity_multiple_thresholds(shared_model):
    """Same A/B at several operating points: thresholds picked at the three
    widest distribution gaps (low/mid/high) x two NMS thresholds."""
    model, variables, templates = shared_model
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    det = PyramidDetector(
        model, variables, templates, cfg=DetectorConfig(),
        ec=EvalConfig(max_dets_per_scale=1024, max_total_dets=512),
    )
    maps = _side_a_maps(model, variables, templates, img, (-1, 0, 1))
    bands = [(0.3, 0.45), (0.45, 0.6), (0.6, 0.9)]
    for (lo, hi) in bands:
        pt, gap = _pick_thresh(maps, templates, lo, hi)
        assert gap > GAP_MIN
        for nt_ in (0.1, 0.3, 0.6):
            want = _reference_decode_nms(maps, templates, pt, nt_)
            got = _sorted_by_score(
                det.detect(img, pt, nt_, scales=(-1, 0, 1), host_resize=True)
            )
            assert got.shape == want.shape, (pt, nt_, got.shape, want.shape)
            np.testing.assert_allclose(got[:, :4], want[:, :4], atol=1e-2)
            np.testing.assert_allclose(got[:, 4], want[:, 4], atol=1e-3)


def test_full_pipeline_fused_device_resize(shared_model):
    """The fully fused path (device resize inside the single program)
    against the reference composition.

    Documented tolerance: the fused path resizes NORMALIZED floats with
    jax's half-pixel scale_and_translate, PIL resizes uint8 with fixed-point
    filter coefficients, so per-pixel deltas of ~1/255 shift boosted logits
    by up to a few tenths — near-threshold candidates can legitimately flip.
    The contract asserted here: every side-A survivor whose score clears the
    threshold by LOGIT_SLACK must have a fused counterpart at IoU >= 0.6
    with score within 0.5 logits, and vice versa."""
    model, variables, templates = shared_model
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)

    maps = _side_a_maps(model, variables, templates, img, (-1, 0, 1))
    prob_thresh, gap = _pick_thresh(maps, templates)
    assert gap > GAP_MIN
    want = _reference_decode_nms(maps, templates, prob_thresh, NMS_THRESH)

    det = PyramidDetector(
        model, variables, templates, cfg=DetectorConfig(),
        ec=EvalConfig(max_dets_per_scale=1024, max_total_dets=512),
    )
    got = det.detect(img, prob_thresh, NMS_THRESH, scales=(-1, 0, 1))

    from tests.oracle import iou_plus1

    LOGIT_SLACK = 0.5
    thresh_logit = float(np.log(prob_thresh / (1 - prob_thresh)))

    def check_covered(src, dst, name):
        for row in src:
            if row[4] < thresh_logit + LOGIT_SLACK:
                continue  # near-threshold: legitimately unstable
            best = max((iou_plus1(row[:4], d[:4]), d[4]) for d in dst) if len(dst) else (0, 0)
            assert best[0] >= 0.6, (name, row, best)
            assert abs(best[1] - row[4]) < 0.5, (name, row, best)

    check_covered(want, got, "ref->fused")
    check_covered(got, want, "fused->ref")
    # and the overall detection counts stay in the same ballpark
    assert abs(got.shape[0] - want.shape[0]) <= max(3, 0.1 * want.shape[0])
