"""Golden-fixture tests for crowd-stratified detail evaluation.

Pins the reference ``ClusterMode`` band semantics
(``lib/utils/KeypointEvaluator.py:528-545``): cluster_mode [1,2,6,10] ->
c1={1}, c2={2-5}, c3={6-9}, c4={10+}; the OCHuman variant [1,2]
(``lib/dataset/ochuman.py:450-459``) -> c1={1}, c2={2+}; and the
``res_eval.txt`` per-level report layout (``KeypointEvaluator.py:436-482``).
"""

import numpy as np

from i2rnet_tpu.utils.detail_eval import cluster_bands, detail_evaluate

K = 17


def _kp(x, y):
    v = np.zeros(3 * K)
    v[0], v[1], v[2] = x, y, 2
    return v.tolist()


def _gt(x, y, gid):
    return {"id": gid, "keypoints": _kp(x, y), "area": 1.0,
            "bbox": [x - 1, y - 1, 2, 2], "iscrowd": 0, "num_keypoints": 1}


def _dt(x, y, score=0.9):
    return {"keypoints": _kp(x, y), "score": score}


def test_cluster_bands_reference_semantics():
    assert cluster_bands([1, 2, 6, 10]) == [
        ("c1", 1, 1), ("c2", 2, 5), ("c3", 6, 9), ("c4", 10, 10 ** 9)]
    assert cluster_bands([1, 2]) == [("c1", 1, 1), ("c2", 2, 10 ** 9)]


def _fixture():
    """images with 1 / 3 / 7 / 12 persons; predictions perfect for the
    first two images, empty for the crowded two."""
    gid = iter(range(1, 100))
    gt, dt = {}, {}
    for img, n in [(1, 1), (2, 3), (3, 7), (4, 12)]:
        gt[img] = [_gt(10.0 * (j + 1), 10.0, next(gid)) for j in range(n)]
        if n <= 5:
            dt[img] = [_dt(10.0 * (j + 1), 10.0) for j in range(n)]
        else:
            dt[img] = []
    return gt, dt


def test_default_bands_ap_per_level():
    gt, dt = _fixture()
    out = detail_evaluate(gt, dt, num_joints=K, cluster_mode=(1, 2, 6, 10))
    assert list(out) == ["AP(c1:n=1)", "AP(c2:n=2-5)", "AP(c3:n=6-9)",
                         "AP(c4:n>=10)"]
    np.testing.assert_allclose(out["AP(c1:n=1)"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AP(c2:n=2-5)"], 1.0, atol=1e-9)
    assert out["AP(c3:n=6-9)"] == 0.0
    assert out["AP(c4:n>=10)"] == 0.0


def test_ochuman_cluster_mode_two_levels(tmp_path):
    gt, dt = _fixture()
    report = str(tmp_path / "results" / "res_eval.txt")
    out = detail_evaluate(gt, dt, num_joints=K, cluster_mode=(1, 2),
                          report_path=report,
                          all_stats=[("AP", 0.5), ("AR", 0.6)])
    assert list(out) == ["AP(c1:n=1)", "AP(c2:n>=2)"]
    np.testing.assert_allclose(out["AP(c1:n=1)"], 1.0, atol=1e-9)
    # c2 pools the 3/7/12-person images; only the 3-person one is predicted
    assert 0.0 < out["AP(c2:n>=2)"] < 1.0

    text = open(report).read()
    assert "All eval:" in text and "('AP', 0.5)" in text
    assert "Class c1 eval:" in text and "Class c2 eval:" in text
    # count histogram: c2 has 3 images total, one per person-count
    assert "    total:3" in text
    assert "    3:1" in text and "    7:1" in text and "    12:1" in text


def test_missing_levels_are_skipped():
    gt = {1: [_gt(10, 10, 1)]}
    dt = {1: [_dt(10, 10)]}
    out = detail_evaluate(gt, dt, num_joints=K, cluster_mode=(1, 2, 6, 10))
    assert list(out) == ["AP(c1:n=1)"]
