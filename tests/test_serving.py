import numpy as np
import jax
import pytest

from tinyfaces_tpu.config import DetectorConfig, EvalConfig
from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.evaluation import PyramidDetector
from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
from tinyfaces_tpu.serving import DetectionService

TINY_STAGES = (1, 1, 1)


@pytest.fixture(scope="module")
def detector():
    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (128, 128))
    return PyramidDetector(
        model, {"params": params, "batch_stats": batch_stats}, templates,
        cfg=DetectorConfig(),
        ec=EvalConfig(scales=(0,), max_dets_per_scale=50, max_total_dets=50),
    )


def test_service_single_and_batched_requests(detector):
    svc = DetectionService(detector, max_batch=4, max_delay_ms=30, scales=(0,),
                           prob_thresh=0.05)
    try:
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (96, 128, 3), dtype=np.uint8) for _ in range(7)]
        futures = [svc.submit(im) for im in imgs]
        results = [f.result(timeout=120) for f in futures]
        assert all(r.ndim == 2 and r.shape[1] == 5 for r in results)

        # consistent with direct detection
        direct = detector.detect(imgs[0], prob_thresh=0.05, scales=(0,))
        np.testing.assert_allclose(results[0], direct, atol=1e-3)
    finally:
        svc.close()


def test_service_mixed_buckets(detector):
    svc = DetectionService(detector, max_batch=4, max_delay_ms=10, scales=(0,),
                           prob_thresh=0.05)
    try:
        rng = np.random.default_rng(1)
        small = [rng.integers(0, 255, (96, 96, 3), dtype=np.uint8) for _ in range(3)]
        big = [rng.integers(0, 255, (200, 260, 3), dtype=np.uint8) for _ in range(3)]
        futs = [svc.submit(im) for pair in zip(small, big) for im in pair]
        for f in futs:
            r = f.result(timeout=180)
            assert r.shape[1] == 5
    finally:
        svc.close()
