"""Each config knob flips observable behavior (VERDICT round-1 item 7):
TEST.POST_PROCESS, LOSS.USE_DIFFERENT_JOINTS_WEIGHT, DEBUG.* image dumps."""

import glob
import os

import numpy as np
import pytest

from i2rnet_tpu.data.coco import COCODataset
from i2rnet_tpu.data.synthetic import make_synthetic_coco
from i2rnet_tpu.presets import tiny_test_config


def test_post_process_gates_taylor_refinement(rng):
    """POST_PROCESS=False -> raw integer argmax decode (reference
    inference.py:102-109); True -> sub-pixel Taylor-refined coords."""
    from i2rnet_tpu.ops.decode import get_final_preds

    hm = rng.rand(3, 5, 16, 12).astype(np.float32)
    centers = np.tile(np.array([[50.0, 60.0]], np.float32), (3, 1))
    scales = np.tile(np.array([[0.8, 1.0]], np.float32), (3, 1))

    raw, mv_raw = get_final_preds(hm, centers, scales, blur_kernel=5,
                                  transform_back=False, post_process=False)
    ref, mv_ref = get_final_preds(hm, centers, scales, blur_kernel=5,
                                  transform_back=False, post_process=True)
    raw, ref = np.asarray(raw), np.asarray(ref)
    # raw decode is integer-valued; refined decode is not
    np.testing.assert_array_equal(raw, np.round(raw))
    assert np.abs(ref - raw).max() > 0
    assert np.abs(ref - np.round(ref)).max() > 0
    np.testing.assert_array_equal(np.asarray(mv_raw), np.asarray(mv_ref))


def _synthetic_ds(tmp_path, use_jw):
    root = make_synthetic_coco(str(tmp_path / "d"), num_images=3, num_joints=5,
                               max_persons=2, image_set="val2017")
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.MAX_PATCH = 2
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    cfg.LOSS.USE_DIFFERENT_JOINTS_WEIGHT = use_jw
    cfg = cfg.freeze()
    return COCODataset(cfg, root, "val2017", is_train=True)


def test_different_joints_weight_applied(tmp_path):
    """COCO joints_weight table (coco.py:106-112) multiplies target_weight
    when LOSS.USE_DIFFERENT_JOINTS_WEIGHT (JointsDataset.py:432-433)."""
    rng = np.random.RandomState(0)
    ds_off = _synthetic_ds(tmp_path / "off", use_jw=False)
    ds_on = _synthetic_ds(tmp_path / "on", use_jw=True)
    assert ds_on.use_different_joints_weight
    assert ds_on.joints_weight == (1.0, 1.0, 1.0, 1.0, 1.0)  # trimmed to K=5

    items, nb = next(ds_off.train_batches(2, rng))
    raw, _ = ds_off.make_raw_batch(items, nb, np.random.RandomState(1))
    tw_off = np.asarray(ds_off.device_batch(raw)["target_weight"])
    tw_on = np.asarray(ds_on.device_batch(raw)["target_weight"])
    # K=5 truncates the table to all-ones; equal here, but the wiring is live:
    np.testing.assert_allclose(tw_on, tw_off * np.asarray(ds_on.joints_weight))

    # full 17-joint table: weights actually differ on limb joints
    from i2rnet_tpu.ops.preprocess import device_preprocess
    full = COCODataset.joints_weight
    raw17 = {
        "images": np.zeros((1, 32, 32, 3), np.uint8),
        "crop_affines": np.tile(np.eye(2, 3, dtype=np.float32), (1, 1, 1, 1)),
        "boxes": np.zeros((1, 1, 4), np.float32),
        "mask_affines": np.tile(np.eye(2, 3, dtype=np.float32), (1, 1, 1, 1)),
        "joints_hm": np.full((1, 1, 17, 2), 6.0, np.float32),
        "joints_vis": np.ones((1, 1, 17), np.float32),
        "person_valid": np.ones((1, 1), bool),
    }
    tw = np.asarray(device_preprocess(
        raw17, (48, 64), (12, 16), 2, joints_weight=full)["target_weight"])
    np.testing.assert_allclose(tw[0, 0], np.asarray(full))


@pytest.mark.slow
def test_debug_images_written_during_validate(tmp_path):
    """DEBUG.DEBUG + SAVE_* flags dump gt/pred grids during validation
    (reference function.py:240-241, vis.py:253-294)."""
    import cv2  # noqa: F401  (skip if unavailable)

    from i2rnet_tpu.core.validate import validate
    from i2rnet_tpu.registry import get_model_builder

    root = make_synthetic_coco(str(tmp_path / "d"), num_images=2, num_joints=5,
                               max_persons=2, image_set="val2017")
    cfg = tiny_test_config(num_joints=5).clone()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.MAX_PATCH = 2
    cfg.TPU.MAX_IMAGE_HW = (256, 320)
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.BLUR_KERNEL = 5
    cfg.TEST.BATCH_SIZE_PER_GPU = 2
    cfg.PRINT_FREQ = 1
    cfg.DEBUG.DEBUG = True
    cfg.DEBUG.SAVE_BATCH_IMAGES_GT = True
    cfg.DEBUG.SAVE_HEATMAPS_GT = True
    cfg.DEBUG.SAVE_HEATMAPS_PRED = True
    cfg = cfg.freeze()

    import jax
    ds = COCODataset(cfg, root, "val2017", is_train=False)
    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    items, nb = next(ds.eval_batches(2))
    raw, _ = ds.make_raw_batch(items, nb)
    probe = ds.device_batch(raw)
    variables = model.init(jax.random.PRNGKey(0), probe["images"],
                           probe["pos_masks"], probe["person_valid"],
                           train=False)

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    validate(cfg, ds, model, variables, out_dir, max_batches=1)
    dumped = glob.glob(os.path.join(out_dir, "debug", "val_*"))
    names = {os.path.basename(p).split(".")[0].split("_", 2)[-1] for p in dumped}
    assert any(p.endswith("_gt.jpg") for p in dumped), dumped
    assert any(p.endswith("_hm_gt.jpg") for p in dumped), dumped
    assert any(p.endswith("_hm_pred.jpg") for p in dumped), dumped


def test_bogus_cli_override_key_raises(tmp_path):
    """yacs 'Non-existent key' semantics for CLI overrides: a typo'd opts
    key must fail loudly, not be silently ignored. The open MODEL.EXTRA
    subtree stays writable (reference schema keeps EXTRA free-form)."""
    import pytest
    import yaml

    from i2rnet_tpu.config.config import load_config

    cfg = tiny_test_config(num_joints=5).clone()
    d = cfg.to_dict()
    d.pop("SEED", None)
    yf = tmp_path / "exp.yaml"
    yaml.safe_dump(d, open(yf, "w"))

    with pytest.raises(KeyError, match="TRAIN.NOSUCHKEY"):
        load_config(str(yf), opts=["TRAIN.NOSUCHKEY", "1"])
    with pytest.raises(KeyError, match="NOPE.X"):
        load_config(str(yf), opts=["NOPE.X", "1"])
    ok = load_config(str(yf), opts=["TRAIN.LR", "0.01",
                                    "MODEL.EXTRA.NEWKNOB", "3"])
    assert ok.TRAIN.LR == 0.01 and ok.MODEL.EXTRA.NEWKNOB == 3


def test_cli_override_literal_eval_semantics(tmp_path):
    """yacs parses CLI values with ast.literal_eval, not yaml: 'no', 'on',
    'null' stay strings even when the default is None (ADVICE round-2);
    python literals ('True', '0.5', '[1, 2]') parse; lists coerce to the
    default's tuple type."""
    import yaml

    from i2rnet_tpu.config.config import load_config

    cfg = tiny_test_config(num_joints=5).clone()
    d = cfg.to_dict()
    d.pop("SEED", None)
    yf = tmp_path / "exp.yaml"
    yaml.safe_dump(d, open(yf, "w"))

    c = load_config(str(yf), opts=["MODEL.SINGLEFORMER", "no"])
    assert c.MODEL.SINGLEFORMER == "no"        # yaml would make this False
    c = load_config(str(yf), opts=["MODEL.SINGLEFORMER", "null"])
    assert c.MODEL.SINGLEFORMER == "null"      # yaml would make this None
    c = load_config(str(yf), opts=["TEST.FLIP_TEST", "True",
                                   "MODEL.LOSS_WEIGHTS", "[0.3, 0.7]",
                                   "GPUS", "[0, 1]"])
    assert c.TEST.FLIP_TEST is True
    assert c.MODEL.LOSS_WEIGHTS == [0.3, 0.7]
    assert c.GPUS == (0, 1)                    # coerced to the tuple default
