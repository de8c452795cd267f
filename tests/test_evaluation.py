import numpy as np
import jax
import pytest

from tinyfaces_tpu.config import DetectorConfig, EvalConfig
from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.evaluation import PyramidDetector, write_results
from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model

TINY_STAGES = (1, 1, 1)


@pytest.fixture(scope="module")
def detector():
    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), input_size=(128, 128))
    ec = EvalConfig(max_dets_per_scale=50, max_total_dets=50)
    return PyramidDetector(
        model, {"params": params, "batch_stats": batch_stats},
        templates, cfg=DetectorConfig(), ec=ec,
    )


def test_single_scale_detect_shapes(detector):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    dets = detector.detect(img, prob_thresh=0.05, scales=(0,))
    assert dets.ndim == 2 and dets.shape[1] == 5
    if dets.shape[0] > 1:  # scores descending
        assert (np.diff(dets[:, 4]) <= 1e-6).all()


def test_pyramid_detect_runs_all_scales(detector):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (160, 200, 3), dtype=np.uint8)
    dets = detector.detect(img, prob_thresh=0.01, scales=(-1, 0, 1))
    assert dets.shape[1] == 5


def test_high_threshold_gives_no_dets(detector):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    dets = detector.detect(img, prob_thresh=0.999999, scales=(0,))
    assert dets.shape[0] == 0


def test_degenerate_image_shapes_do_not_crash(detector):
    """Regression: _round_up used to raise ValueError (negative shift) for
    dims 2-4, killing detect() on degenerate inputs. Tiny dims must bucket
    to 64 and extreme aspect ratios must still return (N, 5)."""
    from tinyfaces_tpu.evaluation import _round_up

    assert [_round_up(x) for x in (1, 2, 3, 4, 5, 63, 64, 65)] == [
        64, 64, 64, 64, 64, 64, 64, 128]
    assert _round_up(2000) == 2048

    rng = np.random.default_rng(3)
    tiny = rng.integers(0, 255, (3, 5, 3), dtype=np.uint8)
    dets = detector.detect(tiny, prob_thresh=0.5, scales=(0,))
    assert dets.ndim == 2 and dets.shape[1] == 5

    skinny = rng.integers(0, 255, (500, 16, 3), dtype=np.uint8)
    dets = detector.detect(skinny, prob_thresh=0.5, scales=(-2, 0))
    assert dets.ndim == 2 and dets.shape[1] == 5


def test_write_results_format(tmp_path):
    dets = np.array(
        [
            [10.2, 20.7, 50.4, 80.1, 0.93],
            [5.0, 5.0, 15.0, 25.0, 0.12],
        ]
    )
    path = write_results(
        dets, "0--Parade/0_Parade_marchingband_1_465.jpg", "val",
        results_dir=tmp_path / "val_results",
    )
    assert path == tmp_path / "val_results/0--Parade/0_Parade_marchingband_1_465.txt"
    lines = path.read_text().splitlines()
    assert lines[0] == "0_Parade_marchingband_1_465.jpg"
    assert lines[1] == "2"
    # left top width height score, +1 width convention
    f = lines[2].split()
    assert f[:4] == ["10", "21", "41", "60"]
    assert float(f[4]) == 0.93


def test_write_results_drops_nonfinite_rows(tmp_path):
    """exp-overflowed regressions (reference models/utils.py:87-88 with
    degenerate weights) produce inf boxes that cannot serialize as ints;
    write_results must drop them and keep the finite rows."""
    dets = np.array(
        [
            [10.0, 20.0, 50.0, 80.0, 0.9],
            [5.0, 5.0, np.inf, 25.0, 0.5],
            [1.0, np.nan, 9.0, 9.0, 0.4],
        ]
    )
    path = write_results(dets, "2--Demo/y.jpg", "val",
                         results_dir=tmp_path / "r")
    lines = path.read_text().splitlines()
    assert lines[1] == "1"
    assert lines[2].split()[:4] == ["10", "20", "41", "61"]


def test_write_results_empty(tmp_path):
    path = write_results(
        np.zeros((0, 5)), "1--Handshaking/x.jpg", "val", results_dir=tmp_path / "r"
    )
    lines = path.read_text().splitlines()
    assert lines == ["x.jpg", "0"]


def test_fused_matches_host_resize_path(detector):
    """The fused device-resize path and the PIL-resize path must produce
    closely matching detections (resampling differs slightly, so compare
    box sets loosely)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (160, 224, 3), dtype=np.uint8)
    fused = detector.detect(img, prob_thresh=0.05, scales=(0,))
    hostr = detector.detect(img, prob_thresh=0.05, scales=(0,), host_resize=True)
    # at scale 1.0 there is no resampling at all -> results should agree
    assert fused.shape == hostr.shape
    if fused.shape[0]:
        np.testing.assert_allclose(fused[:, :4], hostr[:, :4], atol=1e-2)
        np.testing.assert_allclose(fused[:, 4], hostr[:, 4], atol=1e-3)


def test_detect_batch_consistent_with_single(detector):
    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 255, (128, 128, 3), dtype=np.uint8) for _ in range(3)]
    batch_out = detector.detect_batch(imgs, prob_thresh=0.05, scales=(0,))
    for im, want in zip(imgs, batch_out):
        got = detector.detect(im, prob_thresh=0.05, scales=(0,))
        assert got.shape == want.shape
        if got.shape[0]:
            np.testing.assert_allclose(got, want, atol=1e-3)


def test_detect_batch_sharded_over_mesh():
    """Fused pyramid eval data-parallel over an 8-device CPU mesh."""
    import jax

    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
    from tinyfaces_tpu.parallel.mesh import make_mesh

    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), input_size=(128, 128))
    det = PyramidDetector(
        model, {"params": params, "batch_stats": batch_stats}, templates,
        cfg=DetectorConfig(), ec=EvalConfig(max_dets_per_scale=50, max_total_dets=50),
        mesh=make_mesh(jax.devices()[:8]),
    )
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 255, (96, 128, 3), dtype=np.uint8) for _ in range(8)]
    outs = det.detect_batch(imgs, prob_thresh=0.05, scales=(0,))
    assert len(outs) == 8
    for o in outs:
        assert o.ndim == 2 and o.shape[1] == 5

    # matches the unsharded detector
    det1 = PyramidDetector(
        model, {"params": params, "batch_stats": batch_stats}, templates,
        cfg=DetectorConfig(), ec=EvalConfig(max_dets_per_scale=50, max_total_dets=50),
    )
    want = det1.detect_batch(imgs, prob_thresh=0.05, scales=(0,))
    for a, b in zip(outs, want):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_yuv420_transfer_matches_rgb_detections():
    """The yuv420 wire format must reproduce the RGB path's detections on
    chroma-neutral content exactly (same candidates, boxes atol ~1e-2) and
    the full pipeline must run on color content."""
    import jax

    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model

    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (128, 128))
    # sparse, well-separated candidates (see tests/test_pipeline_parity.py):
    # random-init probs cluster at 0.5 where a 1-LSB luminance delta flips
    # candidates; bias the cls head negative so the comparison is stable
    params = jax.device_get(params)

    def _bias(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                _bias(v)
            elif k == "bias" and getattr(v, "ndim", 0) == 1 and v.shape[0] == 125:
                v = np.array(v)
                v[:25] -= 4.0
                tree[k] = v

    _bias(params)
    variables = {"params": params, "batch_stats": batch_stats}
    ec = EvalConfig(max_dets_per_scale=50, max_total_dets=50)
    det_rgb = PyramidDetector(model, variables, templates,
                              cfg=DetectorConfig(), ec=ec, transfer="rgb")
    det_yuv = PyramidDetector(model, variables, templates,
                              cfg=DetectorConfig(), ec=ec, transfer="yuv420")

    rng = np.random.default_rng(5)
    gray = np.repeat(rng.integers(0, 255, (128, 128, 1), dtype=np.uint8), 3, -1)
    a = det_rgb.detect(gray, prob_thresh=0.4, scales=(0,))
    b = det_yuv.detect(gray, prob_thresh=0.4, scales=(0,))
    assert a.shape == b.shape
    if a.shape[0]:
        np.testing.assert_allclose(a[:, :4], b[:, :4], atol=5e-2)
        np.testing.assert_allclose(a[:, 4], b[:, 4], atol=2e-2)

    color = rng.integers(0, 255, (96, 160, 3), dtype=np.uint8)
    out = det_yuv.detect(color, prob_thresh=0.05, scales=(0,))
    assert out.ndim == 2 and out.shape[1] == 5


def test_pyramid_level_sizes_exact_for_large_images():
    """Per-level resize targets are computed in exact integer arithmetic.

    The reference computes them in Python float64 (evaluation.py:42-47 +
    torchvision F.resize truncation); an fp32 version loses integrality
    above 2^24 — e.g. 8105*2073*2 gave 16209 instead of 16210 — which would
    silently break the fused pyramid's exact-scale fast paths (identity
    skip at f=1, folded stem at f=2)."""
    import jax.numpy as jnp

    from tinyfaces_tpu.evaluation import pyramid_level_sizes

    cases = [(95, 117), (768, 1024), (2073, 8105), (8105, 2073),
             (4999, 9973), (1, 7), (31, 31)]
    for sexp in (-2, -1, 0, 1):
        f = 2.0 ** sexp
        for h, w in cases:
            # float64 reference semantics (torchvision F.resize(int))
            tshort = int(min(h, w) * f)
            if h <= w:
                want = (tshort, int(tshort * w / h) if h else 0)
            else:
                want = (int(tshort * h / w), tshort)
            th, tw = pyramid_level_sizes(
                jnp.int32(h), jnp.int32(w), sexp)
            assert (int(th), int(tw)) == want, (h, w, sexp)
            if sexp == 1:
                # the folded stem's exact-2.0 precondition
                assert (int(th), int(tw)) == (2 * h, 2 * w)
            if sexp == 0:
                assert (int(th), int(tw)) == (h, w)


def test_get_model_arch_resnet50():
    """--arch resnet50 wiring: get_model builds the (3,4,6)-stage backbone
    and the detector produces the same output grid as resnet101 (the head
    geometry is stage-count independent)."""
    import jax.numpy as jnp

    from tinyfaces_tpu.evaluation import get_model

    model, variables = get_model(num_templates=25, arch="resnet50")
    assert tuple(model.stage_sizes) == (3, 4, 6)
    x = jnp.zeros((1, 96, 128, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 12, 16, 125)


def test_non_integer_octave_scales_fall_back(detector):
    """detect()/detect_batch() accept arbitrary float scales (e.g.
    half-octaves) by routing through the host-resize path — the fused
    program requires integer octaves (ADVICE r2: the fused-only ValueError
    silently narrowed the public detect(scales=...) API)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    dets = detector.detect(img, prob_thresh=0.05, scales=(-0.5, 0.5))
    assert dets.ndim == 2 and dets.shape[1] == 5
    batch = detector.detect_batch([img, img], prob_thresh=0.05,
                                  scales=(0.5,))
    assert len(batch) == 2
    np.testing.assert_allclose(batch[0], batch[1])


def test_wider_val_bucket_ladder_is_small():
    """Compile-count audit (VERDICT r2 #5): over a WIDER-val-like size
    distribution (1024-max-dimension convention, aspect ratios 0.56-1.0),
    the adaptive bucketing yields a handful of (bucket, batch) programs,
    all covered by tools/prewarm_cache.VAL_LADDER — a full val sweep
    compiles nothing beyond the prewarmed ladder."""
    from evaluate_model import bucket_plan
    from tools.prewarm_cache import VAL_LADDER

    rng = np.random.default_rng(0)
    sizes = []
    for _ in range(500):  # landscape: width pinned at 1024
        sizes.append((int(rng.integers(576, 1025)), 1024))
    for _ in range(60):  # portrait: height pinned at 1024
        sizes.append((1024, int(rng.integers(680, 1025))))

    plan = bucket_plan(sizes, eval_batch=8)
    assert len(plan) <= len(VAL_LADDER), plan
    ladder = {(h, w) for h, w in VAL_LADDER}
    assert set(plan) <= ladder, (set(plan) - ladder)
    # and the ladder's batch policy is what the sweep will use
    from evaluate_model import bucket_batch_for

    for bucket, batch in plan.items():
        assert batch == bucket_batch_for(bucket, 8)


def test_pack_inputs_roundtrip_all_transfers():
    """pack_inputs -> detect_batch_async(PackedBatch) matches the fused
    pack-at-dispatch path for every wire format (bench.py pipelines the
    two host stages separately on a 1-core host)."""
    import io

    from PIL import Image

    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(
        model, jax.random.PRNGKey(0), input_size=(128, 128))
    variables = {"params": params, "batch_stats": batch_stats}
    ec = EvalConfig(max_dets_per_scale=50, max_total_dets=50)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92, subsampling=2)
    jpeg = buf.getvalue()

    for transfer in ("rgb", "yuv420", "jpegdct", "jpegdct4"):
        det = PyramidDetector(model, variables, templates,
                              cfg=DetectorConfig(), ec=ec, transfer=transfer)
        inp = [jpeg] if transfer.startswith("jpegdct") else [img]
        a = det._fetch(det.detect_batch_async(
            inp, prob_thresh=0.1, scales=(0,)))[0]
        packed = det.pack_inputs(inp)
        b = det._fetch(det.detect_batch_async(
            packed, prob_thresh=0.1, scales=(0,)))[0]
        np.testing.assert_allclose(a, b, err_msg=transfer)


def test_natural_pruning_detector_runs_and_supersets_channels():
    """A PyramidDetector with ec.template_pruning="natural" compiles and
    detects; at the +1 (2x) pyramid scale its decode sees the type-B
    channels (18..24) that the reference pruning zeroes. With a random
    tiny model both modes must agree on scales <= 1 (same valid ids)."""
    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(
        model, jax.random.PRNGKey(0), input_size=(128, 128))
    variables = {"params": params, "batch_stats": batch_stats}
    kw = dict(cfg=DetectorConfig(),
              )
    ref = PyramidDetector(model, variables, templates,
                          ec=EvalConfig(max_dets_per_scale=50,
                                        max_total_dets=50), **kw)
    nat = PyramidDetector(model, variables, templates,
                          ec=EvalConfig(max_dets_per_scale=50,
                                        max_total_dets=50,
                                        template_pruning="natural"), **kw)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    # scales <= 1: identical masks -> identical detections
    d_ref = ref.detect(img, prob_thresh=0.05, scales=(-1, 0))
    d_nat = nat.detect(img, prob_thresh=0.05, scales=(-1, 0))
    np.testing.assert_allclose(d_ref, d_nat, rtol=0, atol=1e-5)
    # with the 2x level included the natural mode runs (may emit more)
    d_nat2 = nat.detect(img, prob_thresh=0.05, scales=(-1, 0, 1))
    assert d_nat2.shape[1] == 5
