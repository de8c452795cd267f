import numpy as np

from tinyfaces_tpu.metrics import average_precision, voc_ap


def test_voc_ap_perfect_curve():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == 1.0


def test_voc_ap_envelope():
    rec = np.array([0.1, 0.4, 1.0])
    prec = np.array([1.0, 0.5, 0.1])
    got = voc_ap(rec, prec)
    # envelope: [0,0.1]->1.0, (0.1,0.4]->0.5, (0.4,1.0]->0.1
    want = 0.1 * 1.0 + 0.3 * 0.5 + 0.6 * 0.1
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_voc_ap_07_metric():
    rec = np.array([0.0, 1.0])
    prec = np.array([1.0, 1.0])
    np.testing.assert_allclose(voc_ap(rec, prec, use_07_metric=True), 1.0)


def _recs(gt_by_img):
    recs, npos = {}, 0
    for img, boxes in gt_by_img.items():
        boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
        recs[img] = {"bbox": boxes, "det": [False] * boxes.shape[0]}
        npos += boxes.shape[0]
    return recs, npos


def test_average_precision_perfect_detections():
    # GT in xywh; detections exactly on the converted corners
    gt = {"a": [[10, 10, 20, 20]], "b": [[5, 5, 10, 10]]}
    recs, npos = _recs(gt)
    dets = np.array([[10, 10, 29, 29], [5, 5, 14, 14]], np.float64)
    conf = np.array([0.9, 0.8])
    ap, prec, rec = average_precision(conf, dets, ["a", "b"], recs, npos)
    assert ap == 1.0
    assert rec[-1] == 1.0


def test_average_precision_duplicate_is_fp():
    gt = {"a": [[10, 10, 20, 20]]}
    recs, npos = _recs(gt)
    dets = np.array([[10, 10, 29, 29], [11, 11, 30, 30]], np.float64)
    conf = np.array([0.9, 0.8])
    ap, prec, rec = average_precision(conf, dets, ["a", "a"], recs, npos)
    assert rec[-1] == 1.0
    np.testing.assert_allclose(prec, [1.0, 0.5])


def test_compute_model_score_json_roundtrip(tmp_path):
    """compute_model_score (reference metrics.py:164-205 parity surface):
    GT JSON list + predictions JSONL -> AP. Perfect detections give AP 1.0;
    adding an unmatched high-confidence box drops precision."""
    import json

    from tinyfaces_tpu.metrics import compute_model_score

    gt = [
        {"image": {"id": "img0"},
         "bboxes": [{"category_id": 3, "bbox": [10, 10, 20, 20]},
                    {"category_id": 1, "bbox": [50, 50, 10, 10]}]},
        {"image": {"id": "img1"},
         "bboxes": [{"category_id": 3, "bbox": [5, 5, 10, 10]}]},
    ]
    gt_file = tmp_path / "gt.json"
    gt_file.write_text(json.dumps(gt))

    pred_file = tmp_path / "pred.jsonl"
    pred_file.write_text(
        json.dumps({"id": "img0", "confidences": [0.9],
                    "bboxes": [[10, 10, 29, 29]]}) + "\n"
        + json.dumps({"id": "img1", "confidences": [0.8],
                      "bboxes": [[5, 5, 14, 14]]}) + "\n"
    )
    ap, prec, rec = compute_model_score(str(pred_file), str(gt_file), class_id=3)
    assert ap == 1.0 and rec[-1] == 1.0

    # one spurious detection on an empty region -> FP
    pred_file.write_text(
        json.dumps({"id": "img0", "confidences": [0.95, 0.9],
                    "bboxes": [[200, 200, 220, 220], [10, 10, 29, 29]]}) + "\n"
        + json.dumps({"id": "img1", "confidences": [0.8],
                      "bboxes": [[5, 5, 14, 14]]}) + "\n"
    )
    ap2, prec2, rec2 = compute_model_score(str(pred_file), str(gt_file), class_id=3)
    assert ap2 < 1.0 and rec2[-1] == 1.0
