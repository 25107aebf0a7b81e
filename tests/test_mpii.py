"""MPII dataset end-to-end: synthetic fixture -> GT-oracle eval -> PCKh@0.5.

Covers the legacy single-person pipeline (reference ``lib/dataset/mpii.py``):
matlab 1-based annot JSON parsing (center shift ``c[1] += 15*s``, 1.25 scale
enlarge, -1 offset), N=1 degradation of the multi-person machinery, and the
``gt_{set}.mat`` PCKh evaluation (headsize normalization, pelvis/thorax
masking, per-limb table).
"""

import json
import os

import numpy as np
import pytest

from i2rnet_tpu.presets import tiny_test_config

cv2 = pytest.importorskip("cv2")
scipy_io = pytest.importorskip("scipy.io")

# standard MPII joint order (reference mpii.py:27-29 flip pairs assume it)
JOINT_NAMES = ["rank", "rkne", "rhip", "lhip", "lkne", "lank",
               "pelv", "thor", "upnk", "head",
               "rwri", "relb", "rsho", "lsho", "lelb", "lwri"]
N_IMAGES = 4


def _make_mpii(root, rng):
    os.makedirs(os.path.join(root, "annot"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    annos = []
    pos_gt = np.zeros((16, 2, N_IMAGES))
    headboxes = np.zeros((2, 2, N_IMAGES))
    for i in range(N_IMAGES):
        img = (rng.rand(200, 160, 3) * 255).astype(np.uint8)
        name = f"im{i}.jpg"
        cv2.imwrite(os.path.join(root, "images", name), img)

        # person roughly centered; joints inside a 60x100 box around center
        cx, cy = 80.0 + i * 2, 90.0 + i * 3
        joints = np.stack([
            cx + rng.uniform(-25, 25, 16),
            cy + rng.uniform(-40, 40, 16)], axis=1)
        # matlab 1-based in the JSON and the gt mat
        annos.append({
            "image": name,
            "center": [cx + 1, cy + 1],
            "scale": 1.0,   # * 200px std
            "joints": (joints + 1).tolist(),
            "joints_vis": [1] * 16,
        })
        pos_gt[:, :, i] = joints + 1
        # headbox around the head joint, diagonal ~30px
        hx, hy = joints[JOINT_NAMES.index("head")] + 1
        headboxes[0, :, i] = [hx - 15, hy - 15]
        headboxes[1, :, i] = [hx + 15, hy + 15]

    with open(os.path.join(root, "annot", "valid.json"), "w") as f:
        json.dump(annos, f)

    scipy_io.savemat(os.path.join(root, "annot", "gt_valid.mat"), {
        "dataset_joints": np.array([JOINT_NAMES], dtype=object),
        "jnt_missing": np.zeros((16, N_IMAGES)),
        "pos_gt_src": pos_gt,
        "headboxes_src": headboxes,
    })
    return root


def test_mpii_end_to_end_pckh(tmp_path, rng):
    from i2rnet_tpu.core.validate import validate
    from i2rnet_tpu.registry import get_dataset_class

    root = _make_mpii(str(tmp_path / "mpii"), rng)
    cfg = tiny_test_config(num_joints=16).clone()
    cfg.DATASET.DATASET = "mpii"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = "valid"
    cfg.TEST.BATCH_SIZE_PER_GPU = 2
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.BLUR_KERNEL = 5
    cfg.TPU.MAX_IMAGE_HW = (256, 256)
    cfg = cfg.freeze()

    ds = get_dataset_class("mpii")(cfg, root, "valid", is_train=False)
    assert len(ds.db) == N_IMAGES
    for rec in ds.db:
        assert len(rec["annos"]) == 1  # single-person records

    def oracle(variables, batch):
        return batch["target"]

    name_value, perf = validate(cfg, ds, model=None, variables=None,
                                output_dir=str(tmp_path / "out"),
                                eval_step_fn=oracle)
    # GT heatmaps decoded at 1/4 resolution -> a few px error, far below
    # the PCKh@0.5 threshold (headsize*0.6/2 ~ 9px here)
    assert set(name_value) == {"Head", "Shoulder", "Elbow", "Wrist", "Hip",
                               "Knee", "Ankle", "Mean", "Mean@0.1"}
    assert perf == name_value["Mean"]
    assert perf > 95.0, dict(name_value)
    assert os.path.exists(tmp_path / "out" / "pred.mat")
