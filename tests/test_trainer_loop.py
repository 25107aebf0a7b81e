"""Full train_loop smoke: 2 epochs on synthetic data, checkpoint + resume."""

import numpy as np

from i2rnet_tpu.core.trainer import train_loop
from i2rnet_tpu.data.synthetic import make_synthetic_coco
from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.utils.checkpoint import latest_checkpoint


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
