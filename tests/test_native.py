"""Native C++ NMS vs the JAX device implementations."""

import numpy as np
import pytest

from i2rnet_tpu import native
from i2rnet_tpu.ops import nms as jnms


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_box_nms_matches(lib_ok, rng):
    dets = np.concatenate([rng.rand(30, 4) * 100, rng.rand(30, 1)], axis=1
                          ).astype(np.float32)
    dets[:, 2:4] += dets[:, 0:2] + 5
    ref = jnms.box_nms(dets, 0.5)
    got = native.box_nms(dets, 0.5)
    assert got == ref


def test_native_oks_nms_matches(lib_ok, rng):
    n, k = 12, 17
    base = rng.rand(1, k, 2) * 50
    kpts = np.concatenate([
        base + rng.randn(n, k, 2) * rng.choice([0.5, 8.0], (n, 1, 1)),
        rng.rand(n, k, 1)], axis=2).astype(np.float32)
    areas = (rng.rand(n) * 500 + 100).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    sig = jnms.COCO_SIGMAS

    db = [{"keypoints": kpts[i], "area": areas[i], "score": scores[i]}
          for i in range(n)]
    ref = jnms.oks_nms(db, 0.9)
    got = native.oks_nms(kpts, areas, scores, sig, 0.9)
    assert got == ref

    ref_soft = jnms.soft_oks_nms(db, 0.9)
    got_soft = native.soft_oks_nms(kpts, areas, scores, sig, 0.9)
    assert got_soft == ref_soft
