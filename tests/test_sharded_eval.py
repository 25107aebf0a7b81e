"""Sharded evaluation == unsharded evaluation (bit-identical AP).

The reference evaluates rank-0-only (``lib/core/function.py:106-107``); this
framework shards eval batches over the mesh's data axis instead. This test
runs the full validate path (model forward -> fused decode -> evaluator) both
ways on the 8-virtual-device CPU mesh and asserts identical metrics.
"""

import jax
import numpy as np

from i2rnet_tpu.core.validate import validate
from i2rnet_tpu.data.coco import COCODataset
from i2rnet_tpu.data.synthetic import make_synthetic_coco
from i2rnet_tpu.parallel.mesh import make_mesh
from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.registry import get_model_builder
import pytest

pytestmark = pytest.mark.slow


def test_sharded_validate_matches_unsharded(tmp_path):
    root = make_synthetic_coco(str(tmp_path / "d"), num_images=6, num_joints=5,
                               max_persons=2, image_set="val2017")
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.MAX_PATCH = 2
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.BLUR_KERNEL = 5
    cfg.TEST.BATCH_SIZE_PER_GPU = 1   # x8 devices when sharded
    cfg = cfg.freeze()

    ds = COCODataset(cfg, root, "val2017", is_train=False)
    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    items, nb = next(ds.eval_batches(2))
    raw, _ = ds.make_raw_batch(items, nb)
    probe = ds.device_batch(raw)
    variables = model.init(jax.random.PRNGKey(0), probe["images"],
                           probe["pos_masks"], probe["person_valid"],
                           train=False)

    out1 = str(tmp_path / "o1")
    out2 = str(tmp_path / "o2")
    nv_plain, perf_plain = validate(cfg, ds, model, variables, out1,
                                    batch_images=8)
    mesh = make_mesh(8)
    assert int(np.prod(mesh.devices.shape)) == 8
    nv_shard, perf_shard = validate(cfg, ds, model, variables, out2,
                                    mesh=mesh)  # batch 1 x 8 devices
    assert perf_shard == perf_plain
    for (k1, v1), (k2, v2) in zip(nv_plain.items(), nv_shard.items()):
        assert k1 == k2
        np.testing.assert_allclose(v2, v1, rtol=1e-6, err_msg=k1)
