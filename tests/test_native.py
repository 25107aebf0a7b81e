"""Native C++ NMS vs the numpy host fallback vs the JAX device kernels.

The host wrappers in ``i2rnet_tpu.ops.nms`` route to the native library
first and fall back to numpy; the jitted device functions serve on-device
callers. All three implementations must agree on the same inputs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from i2rnet_tpu import native
from i2rnet_tpu.ops import nms as jnms


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def _device_greedy(iou, scores, thresh):
    keep = np.asarray(jnms.greedy_nms_from_iou(
        jnp.asarray(iou), jnp.asarray(scores),
        jnp.ones((len(scores),), bool), thresh))
    order = np.argsort(-scores, kind="stable")
    return [int(i) for i in order if keep[i]]


def test_native_box_nms_matches(lib_ok, rng):
    dets = np.concatenate([rng.rand(30, 4) * 100, rng.rand(30, 1)], axis=1
                          ).astype(np.float32)
    dets[:, 2:4] += dets[:, 0:2] + 5
    iou_np = jnms.np_box_iou_matrix(dets[:, :4])
    ref_np = jnms._np_greedy_from_iou(iou_np, dets[:, 4], 0.5)
    ref_dev = _device_greedy(np.asarray(jnms.box_iou_matrix(dets[:, :4])),
                             dets[:, 4], 0.5)
    got = native.box_nms(dets, 0.5)
    assert got == ref_np == ref_dev
    assert jnms.box_nms(dets, 0.5) == got  # wrapper routes consistently


def test_native_oks_nms_matches(lib_ok, rng):
    n, k = 12, 17
    base = rng.rand(1, k, 2) * 50
    kpts = np.concatenate([
        base + rng.randn(n, k, 2) * rng.choice([0.5, 8.0], (n, 1, 1)),
        rng.rand(n, k, 1)], axis=2).astype(np.float32)
    areas = (rng.rand(n) * 500 + 100).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    sig = jnms.COCO_SIGMAS

    iou_np = jnms.np_oks_iou_matrix(kpts, areas, sig)
    np.testing.assert_allclose(
        iou_np, np.asarray(jnms.oks_iou_matrix(kpts, areas, sig)),
        rtol=1e-5, atol=1e-6)

    ref_np = jnms._np_greedy_from_iou(iou_np, scores, 0.9)
    ref_dev = _device_greedy(iou_np, scores, 0.9)
    got = native.oks_nms(kpts, areas, scores, sig, 0.9)
    assert got == ref_np == ref_dev

    ref_soft_np = jnms._np_soft_from_iou(iou_np, scores, 0.9, 20)
    _, picks = jnms.soft_oks_nms_device(
        jnp.asarray(iou_np), jnp.asarray(scores),
        jnp.ones((n,), bool), 0.9, max_dets=20)
    ref_soft_dev = [int(p) for p in np.asarray(picks) if p >= 0]
    got_soft = native.soft_oks_nms(kpts, areas, scores, sig, 0.9)
    assert got_soft == ref_soft_np == ref_soft_dev
