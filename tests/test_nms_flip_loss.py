"""Tests for NMS (vs independent numpy oracles), flip utils, and masked loss."""

import numpy as np

from i2rnet_tpu.ops import flip as F
from i2rnet_tpu.ops import nms as N
from i2rnet_tpu.core.loss import joints_mse_loss, joints_ohkm_mse_loss

COCO_PAIRS = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]]


def _oracle_oks_iou(g, d, a_g, a_d, sigmas):
    variances = (sigmas * 2) ** 2
    xg, yg = g[0::3], g[1::3]
    ious = np.zeros(d.shape[0])
    for i in range(d.shape[0]):
        xd, yd = d[i, 0::3], d[i, 1::3]
        e = ((xd - xg) ** 2 + (yd - yg) ** 2) / variances / ((a_g + a_d[i]) / 2 + np.spacing(1)) / 2
        ious[i] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def _oracle_oks_nms(kpts_db, thresh, sigmas):
    scores = np.array([k["score"] for k in kpts_db])
    kpts = np.array([np.asarray(k["keypoints"]).flatten() for k in kpts_db])
    areas = np.array([k["area"] for k in kpts_db])
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        ovr = _oracle_oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]], sigmas)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return keep


def _random_db(rng, m, k=17):
    db = []
    for _ in range(m):
        base = rng.rand(k, 2) * 50
        jitter = rng.randn(k, 2) * rng.choice([0.5, 6.0])
        kp = np.concatenate([base + jitter, rng.rand(k, 1)], axis=1)
        db.append({
            "keypoints": kp.astype(np.float32),
            "area": float(rng.rand() * 500 + 100),
            "score": float(rng.rand()),
        })
    return db


def test_oks_iou_matrix_matches_oracle(rng):
    db = _random_db(rng, 6)
    kpts = np.stack([d["keypoints"] for d in db])
    areas = np.array([d["area"] for d in db])
    ours = np.asarray(N.oks_iou_matrix(kpts, areas, N.COCO_SIGMAS))
    for g in range(6):
        oracle = _oracle_oks_iou(kpts[g].flatten(), kpts.reshape(6, -1), areas[g], areas, N.COCO_SIGMAS)
        np.testing.assert_allclose(ours[g], oracle, rtol=1e-4, atol=1e-5)


def test_oks_nms_matches_oracle(rng):
    for trial in range(5):
        db = _random_db(rng, 8)
        ours = sorted(N.oks_nms(db, 0.9))
        oracle = sorted(_oracle_oks_nms(db, 0.9, N.COCO_SIGMAS))
        assert ours == oracle, f"trial {trial}: {ours} vs {oracle}"


def test_soft_oks_nms_runs_and_orders(rng):
    db = _random_db(rng, 10)
    picks = N.soft_oks_nms(db, 0.9)
    assert len(picks) == 10  # gaussian soft-nms keeps all (rescored) up to max_dets
    scores = np.array([d["score"] for d in db])
    assert picks[0] == int(np.argmax(scores))


def test_box_nms(rng):
    dets = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],   # heavy overlap with first
        [50, 50, 60, 60, 0.7],
        [0, 0, 10, 10, 0.6],   # duplicate of first
    ], np.float32)
    keep = N.box_nms(dets, 0.5)
    assert keep == [0, 2]


def test_flip_back_matches_manual(rng):
    hm = rng.rand(2, 17, 8, 6).astype(np.float32)
    out = np.asarray(F.flip_back(hm, COCO_PAIRS))
    manual = hm[:, :, :, ::-1].copy()
    for a, b in COCO_PAIRS:
        manual[:, [a, b]] = manual[:, [b, a]]
    np.testing.assert_allclose(out, manual)


def test_fliplr_joints(rng):
    joints = rng.rand(17, 3).astype(np.float32) * 100
    vis = np.ones((17, 3), np.float32)
    vis[5] = 0
    j2, v2 = F.fliplr_joints(joints, vis, 192, COCO_PAIRS)
    j2, v2 = np.asarray(j2), np.asarray(v2)
    # pair (5,6): slot 5 receives old joint 6 flipped; slot 6 gets old 5 but vis=0
    assert abs(j2[5, 0] - (192 - joints[6, 0] - 1)) < 1e-4
    assert v2[6].sum() == 0
    assert np.all(j2[6] == 0)


def test_joints_mse_loss_matches_ragged(rng):
    """Masked static-shape loss == ragged loss computed on valid rows only."""
    b, n, k, h, w = 2, 3, 4, 8, 6
    pred = rng.rand(b, n, k, h, w).astype(np.float32)
    gt = rng.rand(b, n, k, h, w).astype(np.float32)
    tw = rng.rand(b, n, k).astype(np.float32)
    valid = np.array([[True, True, False], [True, False, False]])

    ours = float(joints_mse_loss(pred, gt, tw, valid))

    # ragged oracle: 0.5/K * sum_j mean_{valid rows, pixels}((p-g)*w)^2
    rows_p = pred[valid].reshape(-1, k, h * w)
    rows_g = gt[valid].reshape(-1, k, h * w)
    rows_w = tw[valid]
    loss = 0.0
    for j in range(k):
        d = (rows_p[:, j] * rows_w[:, j:j+1] - rows_g[:, j] * rows_w[:, j:j+1])
        loss += 0.5 * np.mean(d**2)
    oracle = loss / k
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_ohkm_loss_runs(rng):
    pred = rng.rand(2, 3, 17, 8, 6).astype(np.float32)
    gt = rng.rand(2, 3, 17, 8, 6).astype(np.float32)
    valid = np.ones((2, 3), bool)
    v = float(joints_ohkm_mse_loss(pred, gt, None, valid, topk=8))
    assert v > 0


def test_zipreader(tmp_path, rng):
    """archive.zip@inner/path image reads (reference zipreader)."""
    import os
    import zipfile

    import cv2

    from i2rnet_tpu.utils import zipreader

    img = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "x.png"), img)
    zpath = tmp_path / "a.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(tmp_path / "x.png", "imgs/x.png")
    out = zipreader.imread(f"{zpath}@imgs/x.png")
    np.testing.assert_array_equal(out, img)


def test_attention_weight_dropout_semantics(rng):
    """Train-mode attention applies dropout to the softmax WEIGHTS (torch
    semantics, reference attention.py:451-454): rows keep expectation, and
    full drop zeroes the output."""
    import jax
    import jax.numpy as jnp

    from i2rnet_tpu.ops.attention import masked_mhsa_xla

    b, s, c, h = 2, 6, 8, 2
    q = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, c), jnp.float32)

    base = masked_mhsa_xla(q, k, v, h)
    # expectation over many rng draws approaches the undropped output
    outs = [masked_mhsa_xla(q, k, v, h, dropout_rate=0.3,
                            dropout_rng=jax.random.PRNGKey(i))
            for i in range(300)]
    mean = jnp.mean(jnp.stack(outs), axis=0)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(base),
                               rtol=0.3, atol=0.12)
    # a single draw differs from the deterministic output
    assert np.abs(np.asarray(outs[0]) - np.asarray(base)).max() > 1e-3
