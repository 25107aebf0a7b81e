"""Parity tests for affine geometry vs cv2 oracles."""

import cv2
import numpy as np
import pytest

from i2rnet_tpu.ops import transforms as T


def _cv2_affine(center, scale, rot, output_size, inv=False):
    # independent oracle built directly on cv2.getAffineTransform, mirroring
    # the reference construction
    scale_tmp = np.asarray(scale, np.float32) * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([-(src_w - 1) * 0.5 * -sn * -1, 0], np.float32)  # placeholder
    sd = [0, (src_w - 1) * -0.5]
    src_dir = np.array([sd[0] * cs - sd[1] * sn, sd[0] * sn + sd[1] * cs], np.float32)
    dst_dir = np.array([0, (dst_w - 1) * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    src[2] = third(src[0], src[1])
    dst[0] = [(dst_w - 1) * 0.5, (dst_h - 1) * 0.5]
    dst[1] = dst[0] + dst_dir
    dst[2] = third(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


@pytest.mark.parametrize("rot", [0.0, 17.5, -40.0])
@pytest.mark.parametrize("inv", [False, True])
def test_get_affine_transform_matches_cv2(rot, inv):
    center = np.array([123.0, 88.0], np.float32)
    scale = np.array([1.3, 1.9], np.float32)
    ours = np.asarray(T.get_affine_transform(center, scale, rot, (192, 256), inv=inv))
    oracle = _cv2_affine(center, scale, rot, (192, 256), inv=inv)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-3)

    ours_np = T.np_get_affine_transform(center, scale, rot, (192, 256), inv=inv)
    np.testing.assert_allclose(ours_np, oracle, rtol=1e-4, atol=1e-3)


def test_invert_affine_roundtrip():
    t = np.asarray(T.get_affine_transform([50.0, 60.0], [1.0, 1.5], 30.0, (48, 64)))
    inv = np.asarray(T.invert_affine(t))
    pts = np.random.RandomState(0).rand(7, 2).astype(np.float32) * 40
    fwd = np.asarray(T.affine_transform(pts, t))
    back = np.asarray(T.affine_transform(fwd, inv))
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_transform_preds_matches_manual():
    center = np.array([200.0, 150.0], np.float32)
    scale = np.array([1.2, 1.6], np.float32)
    coords = np.array([[10.0, 20.0], [47.0, 63.0], [0.0, 0.0]], np.float32)
    ours = np.asarray(T.transform_preds(coords, center, scale, (48, 64)))
    oracle_t = _cv2_affine(center, scale, 0, (48, 64), inv=True)
    expected = np.stack([oracle_t @ np.array([c[0], c[1], 1.0]) for c in coords])
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-2)


def test_affine_warp_matches_cv2_warpaffine():
    rng = np.random.RandomState(1)
    img = rng.rand(120, 90, 3).astype(np.float32)
    center = np.array([45.0, 60.0], np.float32)
    scale = np.array([0.5, 0.6], np.float32)
    trans = T.np_get_affine_transform(center, scale, 13.0, (48, 64))
    oracle = cv2.warpAffine(img, trans.astype(np.float64), (48, 64), flags=cv2.INTER_LINEAR)
    ours = np.asarray(T.affine_warp(img, trans, (48, 64)))
    assert ours.shape == oracle.shape
    # cv2 uses 5-bit fixed point interpolation -> small tolerance
    np.testing.assert_allclose(ours, oracle, atol=0.02)


def test_affine_warp_batch_shapes():
    rng = np.random.RandomState(2)
    imgs = rng.rand(3, 64, 48, 1).astype(np.float32)
    trans = np.stack([
        T.np_get_affine_transform([24.0, 32.0], [0.3, 0.4], r, (24, 32))
        for r in (0.0, 5.0, -5.0)
    ])
    out = np.asarray(T.affine_warp_batch(imgs, trans, (24, 32)))
    assert out.shape == (3, 32, 24, 1)


def test_axis_aligned_crop_matches_gather_crop():
    """The separable MXU warp (eval/serving fast path) must match the
    gather warp bit-near on axis-aligned affines: positive/negative scale
    (whole-image flip folds into the diagonal), translation, and samples
    falling outside the source (zero-outside convention)."""
    from i2rnet_tpu.ops.preprocess import _crop_one, _crop_one_axis_aligned

    rng = np.random.RandomState(3)
    img = rng.rand(80, 100, 3).astype(np.float32)
    cases = [
        np.array([[0.5, 0.0, 3.2], [0.0, 0.7, -2.1]], np.float32),
        np.array([[-0.6, 0.0, 70.0], [0.0, 1.3, 5.0]], np.float32),  # flip
        np.array([[2.0, 0.0, -40.0], [0.0, 2.5, -30.0]], np.float32),  # oob
        np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32),  # identity
    ]
    for trans in cases:
        ref = np.asarray(_crop_one(img, trans, 48, 64))
        fast = np.asarray(_crop_one_axis_aligned(img, trans, 48, 64))
        np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-5)


def test_eval_device_batch_uses_axis_aligned_path(tmp_path):
    """device_batch on an eval dataset must produce the same batch through
    the axis-aligned path as the gather path (full device_preprocess
    contract), and reject rotated affines via the host assert."""
    from i2rnet_tpu.data.coco import COCODataset
    from i2rnet_tpu.data.synthetic import make_synthetic_coco
    from i2rnet_tpu.ops.preprocess import device_preprocess
    from i2rnet_tpu.presets import tiny_test_config

    root = make_synthetic_coco(str(tmp_path / "d"), num_images=3,
                               num_joints=5, max_persons=2,
                               image_set="val2017")
    c = tiny_test_config(num_joints=5).clone()
    c.DATASET.DATASET = "coco"
    c.TPU.MAX_IMAGE_HW = (256, 320)
    c = c.freeze()
    ds = COCODataset(c, root, "val2017", is_train=False)
    raw, _ = ds.make_raw_batch([(0, None), (1, None)], n_max=2)

    fast = ds.device_batch(raw)
    slow = device_preprocess(raw, (ds.image_width, ds.image_height),
                             (ds.heatmap_width, ds.heatmap_height),
                             ds.sigma, joints_weight=ds.joints_weight,
                             axis_aligned=False)
    for k in fast:
        # atol 2e-4 on ImageNet-normalized pixels = ~5e-5 raw-pixel f32
        # summation-order roundoff between the two contraction orders
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(slow[k]),
                                   rtol=1e-5, atol=2e-4, err_msg=k)

    rotated = {**raw, "crop_affines": raw["crop_affines"].copy()}
    rotated["crop_affines"][..., 0, 1] = 0.1
    with pytest.raises(AssertionError, match="axis-aligned"):
        ds.device_batch(rotated)
