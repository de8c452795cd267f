import numpy as np

from wider_eval import dataset_eval, image_eval, read_results_dir


def test_image_eval_matching():
    gts = np.array([[10.0, 10, 20, 20], [100, 100, 30, 30]])  # xywh
    keep = np.array([True, True])
    dets = np.array(
        [
            [10, 10, 20, 20, 0.9],  # TP on gt0
            [11, 11, 20, 20, 0.8],  # duplicate -> FP
            [300, 300, 10, 10, 0.7],  # FP
            [100, 100, 30, 30, 0.6],  # TP on gt1
        ]
    )
    scores, flags = image_eval(dets, gts, keep)
    np.testing.assert_array_equal(flags, [1, 0, 0, 1])
    assert (np.diff(scores) <= 0).all()


def test_image_eval_ignored_gt():
    gts = np.array([[10.0, 10, 20, 20]])
    keep = np.array([False])  # outside the difficulty split
    dets = np.array([[10, 10, 20, 20, 0.9]])
    _, flags = image_eval(dets, gts, keep)
    np.testing.assert_array_equal(flags, [-1])  # neither TP nor FP


def test_dataset_eval_perfect():
    gt = {"e/a.jpg": np.array([[10.0, 10, 20, 20]]),
          "e/b.jpg": np.array([[5.0, 5, 12, 12]])}
    keep = {k: np.ones(v.shape[0], bool) for k, v in gt.items()}
    results = {
        "e/a.jpg": np.array([[10, 10, 20, 20, 2.0]]),
        "e/b.jpg": np.array([[5, 5, 12, 12, 1.0]]),
    }
    ap = dataset_eval(results, gt, keep)
    assert ap > 0.99


def test_dataset_eval_half():
    gt = {"e/a.jpg": np.array([[10.0, 10, 20, 20], [200.0, 200, 20, 20]])}
    keep = {"e/a.jpg": np.ones(2, bool)}
    results = {"e/a.jpg": np.array([[10, 10, 20, 20, 1.0]])}
    ap = dataset_eval(results, gt, keep)
    assert 0.4 < ap <= 0.5


def test_read_results_roundtrip(tmp_path):
    from tinyfaces_tpu.evaluation import write_results

    dets = np.array([[10.0, 20.0, 50.0, 80.0, 0.5]])
    write_results(dets, "ev/img.jpg", "val", results_dir=tmp_path)
    out = read_results_dir(tmp_path)
    assert "ev/img.jpg" in out
    np.testing.assert_allclose(out["ev/img.jpg"][0], [10, 20, 41, 61, 0.5])
