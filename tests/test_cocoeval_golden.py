"""Golden-fixture tests for the from-scratch COCO keypoint evaluator.

pycocotools is absent in this environment, so each scenario's expected
numbers are derived BY HAND from the published COCOeval algorithm
(greedy score-ordered OKS matching per threshold, ignore-last gt order,
crowd re-matching, 101-point interpolated precision) — the spec the
reference consumes at ``lib/dataset/coco.py:487-509``. Any regression in
matching or accumulation shifts these exact values.
"""

import numpy as np

from i2rnet_tpu.ops.cocoeval import IOU_THRS, KeypointEval, compute_oks
from i2rnet_tpu.ops.nms import sigmas_for

K = 17
SIG0 = float(sigmas_for(K)[0])  # 0.026
VAR0 = (2 * SIG0) ** 2


def kp_single(x, y, k=K):
    """k-joint keypoint vector with only joint0 visible at (x, y)."""
    v = np.zeros(3 * k)
    v[0], v[1], v[2] = x, y, 2
    return v.tolist()


def gt_at(x, y, gid, area=1.0, k=K, **kw):
    g = {"id": gid, "keypoints": kp_single(x, y, k), "area": area,
         "bbox": [x - 1, y - 1, 2, 2], "iscrowd": 0, "num_keypoints": 1}
    g.update(kw)
    return g


def dt_at(x, y, score, k=K):
    return {"keypoints": kp_single(x, y, k), "score": score}


def d_for_oks(target_oks, area=1.0):
    """Displacement giving exactly OKS=target for a 1-visible-joint gt."""
    # oks = exp(-d^2 / VAR0 / (area + eps) / 2)
    return float(np.sqrt(-np.log(target_oks) * VAR0 * (area + np.spacing(1)) * 2))


def ap_of(stats, name):
    return dict(stats)[name]


def test_oks_closed_form():
    gts = [gt_at(10.0, 10.0, gid=1)]
    d = d_for_oks(0.7)
    dts = [dt_at(10.0 + d, 10.0, 0.9)]
    oks = compute_oks(gts, dts, sigmas_for(K))
    np.testing.assert_allclose(oks[0, 0], 0.7, rtol=1e-6)


def test_perfect_detection_full_ap():
    gts = {1: [gt_at(10, 10, gid=1)]}
    dts = {1: [dt_at(10, 10, 0.9)]}
    stats = KeypointEval(gts, dts, K).summarize_coco()
    np.testing.assert_allclose(ap_of(stats, "AP"), 1.0, rtol=1e-12)
    np.testing.assert_allclose(ap_of(stats, "AR"), 1.0, rtol=1e-12)
    # area 1.0 is below the medium range -> no M/L gts
    assert ap_of(stats, "AP (M)") == -1.0
    assert ap_of(stats, "AP (L)") == -1.0


def test_missed_gt_halves_recall():
    """2 gts, 1 perfect dt: rc=0.5 -> 51 of 101 interpolated points at 1.0."""
    gts = {1: [gt_at(10, 10, gid=1), gt_at(100, 100, gid=2)]}
    dts = {1: [dt_at(10, 10, 0.9)]}
    stats = KeypointEval(gts, dts, K).summarize_coco()
    np.testing.assert_allclose(ap_of(stats, "AP"), 51 / 101, rtol=1e-9)
    np.testing.assert_allclose(ap_of(stats, "AR"), 0.5, rtol=1e-9)


def test_low_scoring_false_positive_is_free():
    """FP ranked below the TP doesn't dent 101-pt interpolated AP."""
    gts = {1: [gt_at(10, 10, gid=1)]}
    dts = {1: [dt_at(10, 10, 0.9), dt_at(500, 500, 0.3)]}
    stats = KeypointEval(gts, dts, K).summarize_coco()
    np.testing.assert_allclose(ap_of(stats, "AP"), 1.0, rtol=1e-12)


def test_high_scoring_false_positive_halves_ap():
    """FP ranked above the TP: pr=[0, 1/2] -> monotone 0.5 everywhere."""
    gts = {1: [gt_at(10, 10, gid=1)]}
    dts = {1: [dt_at(500, 500, 0.95), dt_at(10, 10, 0.5)]}
    stats = KeypointEval(gts, dts, K).summarize_coco()
    np.testing.assert_allclose(ap_of(stats, "AP"), 0.5, rtol=1e-9)
    np.testing.assert_allclose(ap_of(stats, "AR"), 1.0, rtol=1e-9)


def test_partial_oks_counts_at_low_thresholds_only():
    """OKS just above 0.7 -> TP at thresholds .50-.70 (5 of 10) -> AP 0.5."""
    gts = {1: [gt_at(10, 10, gid=1)]}
    dts = {1: [dt_at(10 + d_for_oks(0.701), 10, 0.9)]}
    stats = KeypointEval(gts, dts, K).summarize_coco()
    np.testing.assert_allclose(ap_of(stats, "AP"), 0.5, rtol=1e-6)
    np.testing.assert_allclose(ap_of(stats, "Ap .5"), 1.0, rtol=1e-12)
    np.testing.assert_allclose(ap_of(stats, "AP .75"), 0.0, atol=1e-9)


def test_ignored_gt_absorbs_detection():
    """A dt matching only an ignore-gt (num_keypoints=0) is neither TP nor
    FP; the other dt still gives AP 1."""
    ig = gt_at(100, 100, gid=2)
    ig["num_keypoints"] = 0
    ig["keypoints"] = kp_single(100, 100)
    gts = {1: [gt_at(10, 10, gid=1), ig]}
    dts = {1: [dt_at(100, 100, 0.95), dt_at(10, 10, 0.5)]}
    stats = KeypointEval(gts, dts, K).summarize_coco()
    np.testing.assert_allclose(ap_of(stats, "AP"), 1.0, rtol=1e-12)


def test_prefers_nonignored_gt_over_better_ignored():
    """Matching must stop at ignored gts once a non-ignored match exists
    (pycocotools' break rule): dt with OKS .6 on real gt and .9 on ignore
    gt stays on the real gt -> TP at thr<=.6 only -> AP=0.3."""
    real = gt_at(10.0, 10.0, gid=1)
    ig = gt_at(10.0 + d_for_oks(0.601) - d_for_oks(0.9), 10.0, gid=2)
    ig["num_keypoints"] = 0
    gts = {1: [real, ig]}
    dts = {1: [dt_at(10.0 + d_for_oks(0.601), 10.0, 0.9)]}
    ev = KeypointEval(gts, dts, K)
    oks = compute_oks(ev.gt[1], ev.dt[1], sigmas_for(K))
    np.testing.assert_allclose(oks[0, 0], 0.601, rtol=1e-6)
    assert oks[0, 1] > 0.6  # the ignored gt IS the better match
    stats = ev.summarize_coco()
    np.testing.assert_allclose(ap_of(stats, "AP"), 0.3, rtol=1e-6)


def test_area_range_partition():
    """Medium gt counts only in AP(M), large only in AP(L)."""
    a_med, a_lrg = 50.0**2, 100.0**2
    gts = {1: [gt_at(10, 10, gid=1, area=a_med),
               gt_at(400, 400, gid=2, area=a_lrg)]}
    dts = {1: [dt_at(10, 10, 0.9), dt_at(400, 400, 0.8)]}
    stats = KeypointEval(gts, dts, K).summarize_coco()
    np.testing.assert_allclose(ap_of(stats, "AP"), 1.0, rtol=1e-12)
    np.testing.assert_allclose(ap_of(stats, "AP (M)"), 1.0, rtol=1e-12)
    np.testing.assert_allclose(ap_of(stats, "AP (L)"), 1.0, rtol=1e-12)
    # the out-of-range gt is ignored per range; a dt matched to an ignored
    # gt must not become an FP in that range
    np.testing.assert_allclose(ap_of(stats, "AR (M)"), 1.0, rtol=1e-12)
    np.testing.assert_allclose(ap_of(stats, "AR (L)"), 1.0, rtol=1e-12)


def test_max_dets_truncation():
    """Detections beyond maxDets (score-ordered) are dropped."""
    gts = {1: [gt_at(10 * i, 10, gid=i + 1) for i in range(3)]}
    dts = {1: [dt_at(10 * i, 10, 0.9 - 0.1 * i) for i in range(3)]}
    stats = KeypointEval(gts, dts, K, max_dets=2).summarize_coco()
    # the 3rd (lowest-score) dt is dropped -> recall 2/3
    np.testing.assert_allclose(ap_of(stats, "AR"), 2 / 3, rtol=1e-9)
    np.testing.assert_allclose(ap_of(stats, "AP"), 67 / 101, rtol=1e-9)


def test_score_tie_order_is_stable():
    """Equal scores keep insertion order (mergesort) -> the earlier dt gets
    the gt, the later one is the FP."""
    from i2rnet_tpu.ops.cocoeval import _evaluate_img
    gts = {1: [gt_at(10, 10, gid=1)]}
    dts = {1: [dt_at(10 + d_for_oks(0.8), 10, 0.7), dt_at(10, 10, 0.7)]}
    ev = KeypointEval(gts, dts, K)
    ious = compute_oks(ev.gt[1], ev.dt[1], sigmas_for(K))
    r = _evaluate_img(ev.gt[1], ev.dt[1], ious, (0.0, 1e10), 20, len(IOU_THRS))
    # at thr .5: dt0 (first in input order) matched, dt1 unmatched
    assert r["dtMatches"][0, 0] == 1 and r["dtMatches"][0, 1] == 0


def test_crowd_gt_allows_rematching():
    """iscrowd gts can absorb multiple detections (no single-match rule)."""
    crowd = gt_at(10, 10, gid=1, iscrowd=1)
    crowd["num_keypoints"] = 0  # crowd anns carry no keypoints -> ignore
    gts = {1: [gt_at(50, 50, gid=2), crowd]}
    dts = {1: [dt_at(10, 10, 0.9), dt_at(10, 10, 0.85), dt_at(50, 50, 0.8)]}
    stats = KeypointEval(gts, dts, K).summarize_coco()
    # both crowd-matched dts are ignored; the real gt is found -> AP 1
    np.testing.assert_allclose(ap_of(stats, "AP"), 1.0, rtol=1e-12)


def test_crowdpose_bands_route_images():
    """crowdIndex bands: easy [0,.1), medium [.1,.8), hard [.8,1]."""
    gts = {i: [gt_at(10, 10, gid=i, k=14)] for i in (1, 2, 3)}
    dts = {1: [dt_at(10, 10, 0.9, k=14)], 2: [dt_at(999, 999, 0.9, k=14)],
           3: [dt_at(10, 10, 0.9, k=14)]}
    ci = {1: 0.05, 2: 0.5, 3: 0.9}
    stats = KeypointEval(gts, dts, 14, sigmas=sigmas_for(14),
                         crowd_index=ci).summarize_crowdpose()
    s = dict(stats)
    np.testing.assert_allclose(s["AP (easy)"], 1.0, rtol=1e-12)
    assert s["AP (medium)"] == 0.0
    np.testing.assert_allclose(s["AP (hard)"], 1.0, rtol=1e-12)
