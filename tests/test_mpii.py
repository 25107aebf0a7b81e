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


@pytest.mark.parity
@pytest.mark.parity_core
def test_mpii_pckh_matches_reference_evaluate(tmp_path, rng):
    """Golden protocol diff: identical predictions through the reference's
    own ``lib/dataset/mpii.py::evaluate`` (PCKh@0.5: headsize*0.6
    normalization, pelvis/thorax masking, per-limb table, Mean@0.1 at the
    11th threshold) and ours — every table entry equal.

    The reference method touches no dataset state (only cfg/preds/
    output_dir), so it is driven directly through the class with the stubs
    installed; imperfect predictions (GT + noise spanning the threshold)
    make every band discriminative.
    """
    from tests.ref_harness import install_reference_stubs

    install_reference_stubs()
    from scipy.io import loadmat

    root = _make_mpii(str(tmp_path / "mpii"), rng)
    cfg = tiny_test_config(num_joints=16).clone()
    cfg.DATASET.DATASET = "mpii"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = "valid"
    cfg = cfg.freeze()

    # preds in the 0-based frame validate() produces: GT (1-based) - 1,
    # plus noise from well-inside to well-outside the PCKh@0.5 radius
    # (headsize 30*sqrt(2)*0.6 ~ 25.5px -> threshold ~12.7px)
    gt = loadmat(os.path.join(root, "annot", "gt_valid.mat"))
    pos_gt = np.transpose(gt["pos_gt_src"], [2, 0, 1])  # [N, 16, 2]
    noise = rng.uniform(-1, 1, pos_gt.shape)
    noise *= rng.choice([0.5, 5.0, 20.0], size=(N_IMAGES, 16, 1))
    preds = pos_gt - 1.0 + noise

    from dataset.mpii import MPIIDataset as RefDS

    # the reference assumes its tools pre-created output_dir
    os.makedirs(tmp_path / "ref_out", exist_ok=True)
    ref_nv, ref_perf = RefDS.evaluate(
        None, cfg, preds.copy(), str(tmp_path / "ref_out"))
    from i2rnet_tpu.registry import get_dataset_class
    ours = get_dataset_class("mpii")(cfg, root, "valid", is_train=False)
    our_nv, our_perf = ours.evaluate(cfg, preds.copy(),
                                     str(tmp_path / "our_out"))

    assert list(our_nv) == list(ref_nv)
    for k in ref_nv:
        np.testing.assert_allclose(float(our_nv[k]), float(ref_nv[k]),
                                   rtol=0, atol=1e-9, err_msg=k)
    assert our_perf == pytest.approx(float(ref_perf), abs=1e-9)
    # the noise mix must actually discriminate (not all-100 / all-0)
    assert 0.0 < float(ref_perf) < 100.0
