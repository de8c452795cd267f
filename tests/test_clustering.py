import numpy as np

from tinyfaces_tpu.clustering.cluster import (
    centralize_bbox,
    compute_distances,
    compute_kmedoids,
    k_medoids,
)
from tinyfaces_tpu.metrics import jaccard_index


def test_centralize_bbox():
    boxes = np.array([[10.0, 20.0, 19.0, 39.0]])  # w=10, h=20 (+1 convention)
    c = centralize_bbox(boxes)
    np.testing.assert_allclose(c, [[-4.5, -9.5, 4.5, 9.5]])


def test_compute_distances_matches_scalar_jaccard():
    rng = np.random.default_rng(0)
    w = rng.uniform(5, 80, 12)
    h = rng.uniform(5, 80, 12)
    boxes = np.stack([-w / 2, -h / 2, w / 2, h / 2], axis=1)
    d = compute_distances(boxes)
    for i in range(12):
        for j in range(12):
            want = 1 - float(jaccard_index(boxes[i], boxes[j]))
            np.testing.assert_allclose(d[i, j], want, atol=1e-6)
    np.testing.assert_allclose(np.diag(d), 0, atol=1e-12)


def test_kmedoids_recovers_separated_clusters():
    rng = np.random.default_rng(1)
    sizes = [8.0, 40.0, 200.0]
    pts = []
    for s in sizes:
        w = s * rng.uniform(0.95, 1.05, 30)
        h = s * rng.uniform(0.95, 1.05, 30)
        pts.append(np.stack([-w / 2, -h / 2, w / 2, h / 2], axis=1))
    boxes = np.concatenate(pts)
    dist = compute_distances(boxes)
    medoids, assign = k_medoids(dist, 3, np.random.default_rng(0))
    # each true cluster maps to exactly one medoid cluster
    labels = [set(assign[i * 30 : (i + 1) * 30]) for i in range(3)]
    assert all(len(l) == 1 for l in labels)
    assert len(set.union(*labels)) == 3


def test_compute_kmedoids_return_layout():
    rng = np.random.default_rng(2)
    n = 80
    boxes = np.stack(
        [rng.uniform(0, 10, n), rng.uniform(0, 10, n),
         rng.uniform(20, 200, n), rng.uniform(20, 200, n)], axis=1
    )
    k = 5
    clustering = compute_kmedoids(boxes, 1, indices=k, max_clusters=k)
    assert len(clustering) == k + 1
    assert clustering[k]["n_clusters"] == k
    assert np.asarray(clustering[k]["medoids"]).shape == (k, 4)


def test_cluster_cli_writes_templates(tmp_path, monkeypatch):
    """tools/cluster_templates.py end to end on a synthetic annotation file."""
    import json
    import sys

    rng = np.random.default_rng(3)
    lines = []
    for i in range(3):
        rows = []
        for _ in range(30):
            w, h = int(rng.integers(10, 120)), int(rng.integers(10, 120))
            rows.append(f"{rng.integers(0, 200)} {rng.integers(0, 200)} {w} {h} 0 0 0 0 0 0")
        lines += [f"0--Ev/im{i}.jpg", str(len(rows))] + rows
    ann = tmp_path / "gt.txt"
    ann.write_text("\n".join(lines) + "\n")
    out = tmp_path / "templates.json"

    import tools.cluster_templates as ct

    monkeypatch.setattr(
        sys, "argv",
        ["cluster_templates.py", str(ann), "--num-templates", "10",
         "--out", str(out)],
    )
    ct.main()
    templates = np.asarray(json.load(open(out)))
    assert templates.shape == (10, 5)
    # centered boxes with the natural-scale column
    np.testing.assert_allclose(templates[:, 0], -templates[:, 2])
    np.testing.assert_allclose(templates[:, 4], 1.0)
    # sorted large -> small by area
    areas = (templates[:, 2] - templates[:, 0]) * (templates[:, 3] - templates[:, 1])
    assert (np.diff(areas) <= 1e-9).all()


def test_kmedoids_k_exceeds_points():
    import pytest as _pytest

    dist = np.zeros((3, 3))
    with _pytest.raises(ValueError):
        k_medoids(dist, 5, np.random.default_rng(0))


def test_pam_backend_beats_or_matches_local():
    """PAM (BUILD+SWAP, the pyclustering-equivalent backend) must reach a
    total nearest-medoid cost <= the Voronoi-iteration local backend on a
    clustered instance, and both must return valid medoid sets."""
    from tinyfaces_tpu.clustering.cluster import compute_distances, pam

    rng = np.random.default_rng(0)
    # three separated shape clusters (centered boxes)
    sizes = np.concatenate([
        rng.normal(20, 1.5, (60, 2)),
        rng.normal(60, 3.0, (60, 2)),
        rng.normal(140, 6.0, (60, 2)),
    ])
    boxes = np.stack([-(sizes[:, 0] - 1) / 2, -(sizes[:, 1] - 1) / 2,
                      (sizes[:, 0] - 1) / 2, (sizes[:, 1] - 1) / 2], 1)
    dist = compute_distances(boxes)

    def cost(med):
        return float(dist[med].min(axis=0).sum())

    m_pam, a_pam = pam(dist, 3, rng)
    m_loc, a_loc = k_medoids(dist, 3, np.random.default_rng(0))
    assert len(set(m_pam.tolist())) == 3
    assert a_pam.shape == (180,)
    assert cost(m_pam) <= cost(m_loc) + 1e-9
    # with k=3 on three tight clusters, PAM must find one medoid per cluster
    assert sorted(np.searchsorted([60, 120], m_pam, side="right").tolist()) == [0, 1, 2]


def test_reference_backend_names_map_to_pam(tmp_path):
    from tinyfaces_tpu.clustering.cluster import compute_kmedoids

    rng = np.random.default_rng(1)
    s = rng.uniform(10, 100, (40, 2))
    boxes = np.stack([np.zeros(40), np.zeros(40), s[:, 0], s[:, 1]], 1)
    for opt in ("pyclustering", "pyclust", "pam"):
        out = compute_kmedoids(boxes, 1, option=opt, indices=3,
                               max_clusters=4, seed=0)
        assert out[3]["n_clusters"] == 3
        assert np.asarray(out[3]["medoids"]).shape == (3, 4)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        compute_kmedoids(boxes, 1, option="sklearn", indices=3, max_clusters=3)
