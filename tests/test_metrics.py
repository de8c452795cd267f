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
