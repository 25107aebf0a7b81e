"""Full train_loop smoke: 2 epochs on synthetic data, checkpoint + resume."""

import numpy as np

from i2rnet_tpu.core.trainer import train_loop
from i2rnet_tpu.data.synthetic import make_synthetic_coco
from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.utils.checkpoint import latest_checkpoint
import pytest

pytestmark = pytest.mark.slow


def _cfg(root):
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TRAIN_SET = "val2017"
    cfg.DATASET.TEST_SET = "val2017"
    cfg.DATASET.MAX_PATCH = 2
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 2
    cfg.TEST.BATCH_SIZE_PER_GPU = 3
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.BLUR_KERNEL = 5
    cfg.WORKERS = 2
    cfg.AUTO_RESUME = True
    cfg.PRINT_FREQ = 1
    return cfg.freeze()


def test_train_loop_checkpoints_and_resumes(tmp_path):
    root = make_synthetic_coco(str(tmp_path / "data"), num_images=4,
                               num_joints=5, max_persons=2, image_set="val2017")
    cfg = _cfg(root)
    out = str(tmp_path / "out")

    state = train_loop(cfg, out, max_epochs=1, max_steps_per_epoch=2)
    steps_after_one = int(state.step)
    assert steps_after_one >= 1
    ck = latest_checkpoint(out)
    assert ck and ck.endswith("epoch_0")

    # resume picks up at epoch 1
    state2 = train_loop(cfg, out, max_epochs=2, max_steps_per_epoch=2)
    assert int(state2.step) > steps_after_one
    assert latest_checkpoint(out).endswith("epoch_1")


def test_train_loop_loads_single_model(tmp_path):
    """train_loop itself applies MODEL.SINGLE_MODEL + SINGLEFORMER_FIX:
    the first stage in the final state equals the loaded (Orbax) checkpoint
    bit-for-bit after training."""
    import jax
    import orbax.checkpoint as ocp

    from i2rnet_tpu.registry import get_model_builder

    root = make_synthetic_coco(str(tmp_path / "data"), num_images=4,
                               num_joints=5, max_persons=2,
                               image_set="val2017")
    cfg = _cfg(root).clone()
    cfg.MODEL.NAME = "interformer"
    cfg.MODEL.SINGLEFORMER = "transpose_h"
    cfg.MODEL.SINGLEFORMER_FIX = True
    cfg.MODEL.ENCODER_LAYERS = 1
    cfg.MODEL.ENCODER_MULTI_LAYERS = 1
    cfg.MODEL.USE_MULTI_POS = False
    cfg.MODEL.POS_EMBEDDING = "sine"
    cfg.AUTO_RESUME = False

    # fabricate an intra checkpoint (Orbax model_best layout) from a fresh
    # two-stage init, perturbed so loading is observable
    probe_cfg = cfg.clone().freeze()
    model = get_model_builder("interformer")(probe_cfg, use_pallas=False)
    imgs = np.zeros((1, 2, 64, 48, 3), np.float32)
    pos = np.zeros((1, 2, 64, 48, 1), np.float32)
    valid = np.ones((1, 2), bool)
    v = model.init(jax.random.PRNGKey(9), imgs, pos, valid, train=False)
    single = jax.tree_util.tree_map(
        lambda x: np.asarray(x) + 0.125,
        {"params": v["params"]["singleformer"],
         "batch_stats": v["batch_stats"]["singleformer"]})
    ck = tmp_path / "intra_best"
    ocp.PyTreeCheckpointer().save(str(ck.resolve()), single)

    cfg.MODEL.SINGLE_MODEL = str(ck)
    cfg = cfg.freeze()
    out = str(tmp_path / "out")
    state = train_loop(cfg, out, max_epochs=1, max_steps_per_epoch=2,
                       validate_every=100)
    got = jax.tree_util.tree_map(np.asarray, state.params["singleformer"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        got, single["params"])
