import numpy as np
import pytest

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


def test_gt_from_mats_exact_splits(tmp_path):
    """Exact easy/medium/hard split loading from synthesized eval_tools
    ground-truth .mat files (official structure)."""
    scipy_io = pytest.importorskip("scipy.io")

    gdir = tmp_path / "ground_truth"
    gdir.mkdir()

    events = np.array([["0--Ev"]], dtype=object)
    file_list = np.empty((1, 1), dtype=object)
    file_list[0, 0] = np.array([["imA"], ["imB"]], dtype=object)
    bbx = np.empty((2, 1), dtype=object)
    bbx[0, 0] = np.array([[10.0, 10, 20, 20], [50, 50, 30, 30]])
    bbx[1, 0] = np.zeros((0, 4))
    face_bbx_list = np.empty((1, 1), dtype=object)
    face_bbx_list[0, 0] = bbx
    scipy_io.savemat(gdir / "wider_face_val.mat", {
        "event_list": events, "file_list": file_list,
        "face_bbx_list": face_bbx_list,
    })

    for name, keep_rows in (("easy", [[1]]), ("medium", [[1, 2]]), ("hard", [[1, 2]])):
        gt_list = np.empty((1, 1), dtype=object)
        inner = np.empty((2, 1), dtype=object)
        inner[0, 0] = np.array(keep_rows[0], float).reshape(-1, 1)
        inner[1, 0] = np.zeros((0, 0))
        gt_list[0, 0] = inner
        scipy_io.savemat(gdir / f"wider_{name}_val.mat", {"gt_list": gt_list})

    from wider_eval import gt_from_mats

    gt, keep = gt_from_mats(tmp_path)
    assert set(gt) == {"0--Ev/imA.jpg", "0--Ev/imB.jpg"}
    assert gt["0--Ev/imA.jpg"].shape == (2, 4)
    np.testing.assert_array_equal(keep["easy"]["0--Ev/imA.jpg"], [True, False])
    np.testing.assert_array_equal(keep["medium"]["0--Ev/imA.jpg"], [True, True])
    assert keep["hard"]["0--Ev/imB.jpg"].shape == (0,)

    # end-to-end: perfect detections on the easy split give AP 1.0
    from wider_eval import dataset_eval

    results = {
        "0--Ev/imA.jpg": np.array([[10.0, 10, 20, 20, 2.0], [50, 50, 30, 30, 1.0]]),
        "0--Ev/imB.jpg": np.zeros((0, 5)),
    }
    ap_easy = dataset_eval(results, gt, keep["easy"])
    assert ap_easy > 0.99


def test_wider_protocol_agrees_with_voc_average_precision():
    """Two independent AP implementations (the 1000-threshold WIDER protocol
    and the per-detection VOC ranking) must agree closely on clean data."""
    from tinyfaces_tpu.metrics import average_precision

    rng = np.random.default_rng(7)
    gt, keep, results = {}, {}, {}
    class_recs, det_rows, confidences, image_ids = {}, [], [], []
    npos = 0
    for i in range(12):
        img = f"e/im{i}.jpg"
        n = int(rng.integers(1, 6))
        xy = rng.uniform(0, 300, (n, 2))
        wh = rng.uniform(20, 60, (n, 2))
        xywh = np.concatenate([xy, wh], axis=1)
        gt[img] = xywh
        keep[img] = np.ones(n, bool)
        class_recs[img] = {"bbox": xywh.copy(), "det": [False] * n}
        npos += n

        dets = []
        for j in range(n):
            score = rng.uniform(0.3, 1.0)
            if rng.random() < 0.75:  # true positive, slightly jittered
                d = xywh[j] + rng.normal(0, 1.0, 4)
            else:  # false positive far away
                d = np.array([400 + 50 * j, 400, 30, 30.0])
            dets.append([*d, score])
            x, y, w, h = d
            det_rows.append([x, y, x + w - 1, y + h - 1])
            confidences.append(score)
            image_ids.append(img)
        results[img] = np.array(dets)

    ap_wider = dataset_eval(results, gt, keep)
    ap_voc, _, _ = average_precision(
        np.array(confidences), np.array(det_rows), image_ids, class_recs, npos
    )
    assert abs(ap_wider - ap_voc) < 0.05, (ap_wider, ap_voc)
