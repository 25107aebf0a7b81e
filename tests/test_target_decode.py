"""Parity tests for Gaussian targets and DARK heatmap decode."""

import cv2
import numpy as np

from i2rnet_tpu.ops import decode as D
from i2rnet_tpu.ops import target as TG
from i2rnet_tpu.ops.accuracy import pck_accuracy


def _oracle_target(joints, vis, heatmap_size, sigma):
    """Independent numpy oracle of the reference generate_target semantics."""
    w, h = heatmap_size
    k = joints.shape[0]
    target = np.zeros((k, h, w), np.float32)
    weight = vis.astype(np.float32).copy()
    tmp = sigma * 3
    for j in range(k):
        mu_x, mu_y = joints[j]
        ul = [int(mu_x - tmp), int(mu_y - tmp)]
        br = [int(mu_x + tmp + 1), int(mu_y + tmp + 1)]
        if ul[0] >= w or ul[1] >= h or br[0] < 0 or br[1] < 0:
            weight[j] = 0
        if weight[j] > 0.5:
            xs = np.arange(w, dtype=np.float32)
            ys = np.arange(h, dtype=np.float32)[:, None]
            target[j] = np.exp(-((xs - mu_x) ** 2 + (ys - mu_y) ** 2) / (2 * sigma**2))
    return target, weight


def test_generate_targets_matches_oracle(rng):
    joints = np.array([[10.0, 20.0], [47.9, 63.9], [-10.0, 5.0], [100.0, 100.0],
                       [3.2, 1.1]], np.float32)
    vis = np.array([1.0, 1.0, 1.0, 1.0, 0.0], np.float32)
    t, w = TG.generate_targets(joints, vis, (48, 64), 2)
    t_o, w_o = _oracle_target(joints, vis, (48, 64), 2)
    np.testing.assert_allclose(np.asarray(w), w_o)
    np.testing.assert_allclose(np.asarray(t), t_o, atol=1e-5)


def test_generate_targets_batched(rng):
    joints = rng.rand(2, 3, 17, 2).astype(np.float32) * 60
    vis = (rng.rand(2, 3, 17) > 0.2).astype(np.float32)
    t, w = TG.generate_targets(joints, vis, (48, 64), 2)
    assert t.shape == (2, 3, 17, 64, 48)
    assert w.shape == (2, 3, 17)


def test_get_max_preds(rng):
    hm = rng.rand(4, 17, 64, 48).astype(np.float32)
    coords, maxv = D.get_max_preds(hm)
    flat = hm.reshape(4, 17, -1)
    idx = flat.argmax(-1)
    np.testing.assert_allclose(np.asarray(coords)[..., 0], idx % 48)
    np.testing.assert_allclose(np.asarray(coords)[..., 1], idx // 48)
    np.testing.assert_allclose(np.asarray(maxv)[..., 0], flat.max(-1), rtol=1e-6)


def _oracle_blur(hm, kernel):
    """Reference-style blur oracle: zero-pad border then cv2.GaussianBlur."""
    border = (kernel - 1) // 2
    out = hm.copy()
    p, k, h, w = hm.shape
    for i in range(p):
        for j in range(k):
            origin_max = np.max(hm[i, j])
            dr = np.zeros((h + 2 * border, w + 2 * border))
            dr[border:-border, border:-border] = hm[i, j].copy()
            dr = cv2.GaussianBlur(dr, (kernel, kernel), 0)
            out[i, j] = dr[border:-border, border:-border]
            out[i, j] *= origin_max / np.max(out[i, j])
    return out


def test_gaussian_blur_matches_cv2(rng):
    hm = rng.rand(2, 3, 64, 48).astype(np.float32)
    ours = np.asarray(D.gaussian_blur(hm, 11))
    oracle = _oracle_blur(hm, 11)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_taylor_refine_subpixel():
    # an exact Gaussian: refinement should move argmax toward the true center
    h, w, sigma = 64, 48, 2.0
    mu_x, mu_y = 21.4, 30.7
    xs = np.arange(w, dtype=np.float32)
    ys = np.arange(h, dtype=np.float32)[:, None]
    g = np.exp(-((xs - mu_x) ** 2 + (ys - mu_y) ** 2) / (2 * sigma**2))
    hm = g[None, None].astype(np.float32)
    coords, _ = D.get_max_preds(hm)
    log_hm = np.log(np.maximum(hm, 1e-10))
    refined = np.asarray(D.taylor_refine(log_hm, coords))
    assert abs(refined[0, 0, 0] - mu_x) < 0.05
    assert abs(refined[0, 0, 1] - mu_y) < 0.05
    # argmax alone is off by up to 0.5
    assert abs(np.asarray(coords)[0, 0, 0] - mu_x) > abs(refined[0, 0, 0] - mu_x)


def test_taylor_refine_border_noop():
    hm = np.zeros((1, 1, 64, 48), np.float32)
    hm[0, 0, 0, 0] = 1.0
    coords, _ = D.get_max_preds(hm)
    refined = np.asarray(D.taylor_refine(np.log(np.maximum(hm, 1e-10)), coords))
    np.testing.assert_allclose(refined, np.asarray(coords))


def test_get_final_preds_end_to_end(rng):
    h, w, sigma = 64, 48, 2.0
    mu = np.array([[20.3, 30.6], [10.1, 40.9]], np.float32)
    hm = np.zeros((1, 2, h, w), np.float32)
    xs = np.arange(w, dtype=np.float32)
    ys = np.arange(h, dtype=np.float32)[:, None]
    for j in range(2):
        hm[0, j] = np.exp(-((xs - mu[j, 0]) ** 2 + (ys - mu[j, 1]) ** 2) / (2 * sigma**2))
    center = np.array([[100.0, 120.0]], np.float32)
    scale = np.array([[0.8, 1.1]], np.float32)
    preds, maxv = D.get_final_preds(hm, center, scale, blur_kernel=11)
    # map the true subpixel mu through the same inverse transform
    from i2rnet_tpu.ops.transforms import transform_preds
    expected = np.asarray(transform_preds(mu, center[0], scale[0], (w, h)))
    np.testing.assert_allclose(np.asarray(preds)[0], expected, atol=0.5)
    assert np.asarray(maxv).shape == (1, 2, 1)


def test_pck_accuracy_perfect_and_masked(rng):
    hm = rng.rand(2, 3, 5, 64, 48).astype(np.float32)
    valid = np.array([[True, True, False], [True, False, False]])
    avg, per_joint, cnt = pck_accuracy(hm, hm, person_valid=valid)
    assert float(avg) == 1.0
    # totally wrong preds -> low acc
    gt = np.zeros_like(hm)
    gt[..., 50, 40] = 1.0
    bad = np.zeros_like(hm)
    bad[..., 5, 5] = 1.0
    avg2, _, _ = pck_accuracy(bad, gt, person_valid=valid)
    assert float(avg2) == 0.0


def test_gaussian_kernel_matches_cv2_all_sizes():
    """Blur coefficients bit-match cv2.getGaussianKernel(k, 0) for every
    kernel size a config could set — including the small-kernel table
    (k<=7) and the fixed-point k=9 case, not just the released k=11."""
    import cv2

    from i2rnet_tpu.ops.decode import _cv2_gaussian_kernel1d
    for k in (1, 3, 5, 7, 9, 11, 13, 15):
        ref = cv2.getGaussianKernel(k, 0).ravel()
        np.testing.assert_allclose(_cv2_gaussian_kernel1d(k), ref,
                                   atol=1e-7, err_msg=f"ksize={k}")
