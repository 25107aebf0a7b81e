"""End-to-end pipeline tests on the synthetic COCO-format dataset."""

import numpy as np
import pytest

from i2rnet_tpu.core.validate import validate
from i2rnet_tpu.data.coco import COCODataset
from i2rnet_tpu.data.synthetic import make_synthetic_coco
from i2rnet_tpu.ops.cocoeval import KeypointEval
from i2rnet_tpu.presets import tiny_test_config


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_coco(str(root), num_images=6, num_joints=5,
                               max_persons=3, image_set="val2017")


@pytest.fixture(scope="module")
def cfg():
    c = tiny_test_config(num_joints=5).clone()
    c.DATASET.DATASET = "coco"
    c.DATASET.TEST_SET = "val2017"
    c.TEST.FLIP_TEST = False
    c.TEST.BLUR_KERNEL = 5
    c.TPU.MAX_IMAGE_HW = (256, 320)
    return c.freeze()


@pytest.fixture(scope="module")
def dataset(cfg, synth_root):
    return COCODataset(cfg, synth_root, "val2017", is_train=False)


def test_dataset_db(dataset):
    assert len(dataset.db) == 6
    for rec in dataset.db:
        assert 1 <= len(rec["annos"]) <= 3
        for a in rec["annos"]:
            assert a["joints_3d"].shape == (5, 3)


def test_raw_batch_and_device_preprocess(dataset):
    items = [(0, None), (1, None)]
    raw, meta = dataset.make_raw_batch(items, n_max=4)
    assert raw["images"].shape == (2, 256, 320, 3)
    batch = dataset.device_batch(raw)
    assert batch["images"].shape == (2, 4, 64, 48, 3)
    assert batch["pos_masks"].shape == (2, 4, 64, 48, 1)
    assert batch["target"].shape == (2, 4, 5, 16, 12)

    # target argmax must equal the warped heatmap joint coords (rounded)
    target = np.asarray(batch["target"])
    tw = np.asarray(batch["target_weight"])
    for bi in range(2):
        for pi in range(4):
            if not raw["person_valid"][bi, pi]:
                assert target[bi, pi].max() == 0
                continue
            for j in range(5):
                if tw[bi, pi, j] > 0.5:
                    hm = target[bi, pi, j]
                    yx = np.unravel_index(hm.argmax(), hm.shape)
                    jx, jy = raw["joints_hm"][bi, pi, j]
                    assert abs(yx[1] - round(jx)) <= 1
                    assert abs(yx[0] - round(jy)) <= 1

    # pos mask roughly covers the box fraction of the crop
    masks = np.asarray(batch["pos_masks"])
    valid = raw["person_valid"]
    assert masks[valid].mean() > 0.05


def test_pos_mask_matches_cv2_reference_path(dataset):
    """Analytic pos-mask == rasterize + resize (cv2 oracle), EXACTLY —
    including the fractional soft-edge pixels cv2's bilinear resize
    produces (reference ``JointsDataset.py:166-178, 323-325``). Tolerance
    covers only the oracle's uint8 round-trip (0.5/255) and cv2's
    fixed-point interpolation weights."""
    import cv2
    for dbi in range(3):
        rec = dataset.db[dbi]
        img_h, img_w = 240, 320
        raw, _ = dataset.make_raw_batch([(dbi, None)], n_max=4)
        masks = np.asarray(dataset.device_batch(raw)["pos_masks"])
        for pi, a in enumerate(rec["annos"]):
            x, y, w, h = a["box"][:4]
            ours = masks[0, pi, :, :, 0]
            rect = np.zeros((img_h, img_w), np.uint8)
            cv2.rectangle(rect, (int(x), int(y)), (int(x + w), int(y + h)),
                          255, -1)
            oracle = cv2.resize(rect, (48, 64)).astype(np.float32) / 255.0
            np.testing.assert_allclose(ours, oracle, atol=6e-3,
                                       err_msg=f"db {dbi} person {pi}")


def test_keypoint_eval_perfect_and_degraded():
    rng = np.random.RandomState(3)
    gt, dt = {}, {}
    for img in range(4):
        gl, dl = [], []
        for p in range(3):
            kp = np.zeros(15)
            kp[0::3] = rng.rand(5) * 100 + 50
            kp[1::3] = rng.rand(5) * 100 + 50
            kp[2::3] = 2
            gl.append({"keypoints": kp.tolist(), "area": 90 * 90,
                       "bbox": [40, 40, 90, 90], "iscrowd": 0, "num_keypoints": 5})
            dl.append({"keypoints": kp.tolist(), "score": 0.9})
        gt[img] = gl
        dt[img] = dl
    sig = np.full(5, 0.05)
    stats = dict(KeypointEval(gt, dt, sigmas=sig).summarize_coco())
    assert stats["AP"] == 1.0 and stats["AR"] == 1.0

    # drop half the detections -> AR halves, AP ~0.5
    dt2 = {k: v[:2] if k < 2 else v[:1] for k, v in dt.items()}
    stats2 = dict(KeypointEval(gt, dt2, sigmas=sig).summarize_coco())
    assert 0.3 < stats2["AP"] < 0.7
    assert stats2["AR"] < 0.7


def test_validate_with_gt_oracle(cfg, dataset, tmp_path):
    """Decode + inverse transform + rescoring + NMS + evaluator on GT
    heatmaps must give AP ~= 1 (the golden-path integration test)."""
    def oracle(variables, batch):
        return batch["target"]

    name_value, perf = validate(cfg, dataset, model=None, variables=None,
                                output_dir=str(tmp_path), eval_step_fn=oracle,
                                batch_images=3)
    assert perf > 0.95, f"GT-oracle AP {perf}: {name_value}"


def test_train_batches_patch_modes(cfg, synth_root):
    c = cfg.clone()
    c.DATASET.MAX_PATCH = 2
    for mode in ["random", "random_totally", "window", "main_target"]:
        c.DATASET.PATCH_MODE = mode
        ds = COCODataset(c.freeze(), synth_root, "val2017", is_train=True)
        rng = np.random.RandomState(0)
        batches = list(ds.train_batches(2, rng))
        assert batches, mode
        for items, nb in batches:
            for _, group in items:
                assert 1 <= len(group) <= 2, mode
        c.defrost()


def test_validate_main_target_mode(cfg, synth_root, tmp_path):
    c = cfg.clone()
    c.DATASET.PATCH_MODE = "main_target"
    c.DATASET.MAX_PATCH = 2
    c = c.freeze()
    ds = COCODataset(c, synth_root, "val2017", is_train=False)

    def oracle(variables, batch):
        return batch["target"]

    name_value, perf = validate(c, ds, model=None, variables=None,
                                output_dir=str(tmp_path), eval_step_fn=oracle,
                                batch_images=4)
    assert perf > 0.95, f"main-target GT-oracle AP {perf}"


def test_detail_eval_flag(cfg, dataset, tmp_path):
    c = cfg.clone()
    c.TEST.DETAIL_EVAL = True
    c = c.freeze()

    def oracle(variables, batch):
        return batch["target"]

    name_value, perf = validate(c, dataset, model=None, variables=None,
                                output_dir=str(tmp_path), eval_step_fn=oracle,
                                batch_images=3)
    assert any(k.startswith("AP(c") for k in name_value)


def test_detector_box_mode(cfg, synth_root, tmp_path):
    """COCO detector-box path: single-person records from a detections JSON,
    pipeline runs end-to-end and scores against GT."""
    import json
    import os

    # synthesize detections from the GT boxes (perfect detector)
    from i2rnet_tpu.data.coco_format import CocoJson
    coco = CocoJson(os.path.join(synth_root, "annotations",
                                 "person_keypoints_val2017.json"))
    dets = []
    for img_id in coco.get_img_ids():
        for a in coco.get_anns(img_id):
            dets.append({"image_id": img_id, "category_id": 1,
                         "bbox": a["bbox"], "score": 0.97})
    det_file = str(tmp_path / "dets.json")
    with open(det_file, "w") as f:
        json.dump(dets, f)

    c = cfg.clone()
    c.TEST.USE_GT_BBOX = False
    c.TEST.COCO_BBOX_FILE = det_file
    c.TEST.IMAGE_THRE = 0.0
    c = c.freeze()
    ds = COCODataset(c, synth_root, "val2017", is_train=False)
    assert all(len(r["annos"]) == 1 for r in ds.db)
    assert len(ds.db) == len(dets)

    def oracle(variables, batch):
        # det records carry no joints; predict constant center blobs
        return np.ones_like(np.asarray(batch["target"])) * 0.0 + batch["target"]

    name_value, perf = validate(c, ds, model=None, variables=None,
                                output_dir=str(tmp_path), eval_step_fn=oracle,
                                batch_images=4)
    # no GT joints in det records -> targets empty -> AP 0, but the whole
    # path (decode, rescore, NMS, evaluator, results JSON) must run
    assert "AP" in name_value
    assert (tmp_path / "results" / "keypoints_val2017_results.json").exists()


def test_select_data_filter(cfg, synth_root):
    c = cfg.clone()
    c.DATASET.SELECT_DATA = True
    c = c.freeze()
    ds = COCODataset(c, synth_root, "val2017", is_train=True)
    # synthetic boxes tightly bound their joints -> the OKS-style filter
    # keeps (nearly) everything; the filter must at least run and not empty
    assert len(ds.db) >= 1
    total = sum(len(r["annos"]) for r in ds.db)
    assert total >= 1


def test_rotated_pos_mask_matches_cv2():
    """Train-time path: analytic pos mask with rotation == rasterize +
    rotate_bound + resize (cv2 oracle), all angles."""
    import cv2
    import jax.numpy as jnp

    from i2rnet_tpu.ops.preprocess import _pos_mask_one, np_rotate_bound_resize_affine

    H, W = 240, 320
    x, y, w, h = 40, 60, 120, 100
    for angle in [0.0, 17.0, -33.0, 80.0]:
        rect = np.zeros((H, W), np.uint8)
        cv2.rectangle(rect, (int(x), int(y)), (int(x + w), int(y + h)), 255, -1)
        m = cv2.getRotationMatrix2D((W // 2, H // 2), angle, 1.0)
        cos, sin = abs(m[0, 0]), abs(m[0, 1])
        n_w = int(H * sin + W * cos)
        n_h = int(H * cos + W * sin)
        m[0, 2] += n_w / 2 - W // 2
        m[1, 2] += n_h / 2 - H // 2
        rot = cv2.warpAffine(rect, m, (n_w, n_h))
        oracle = cv2.resize(rot, (48, 64)).astype(np.float32) / 255.0

        aff = np_rotate_bound_resize_affine(W, H, angle, 48, 64)
        ours = np.asarray(_pos_mask_one(jnp.asarray([x, y, x + w, y + h], jnp.float32),
                                        jnp.asarray(aff), 48, 64))[:, :, 0]
        hard = (oracle > 0.95) | (oracle < 0.05)
        agree = ((np.abs(ours - np.round(oracle)) < 0.5) | ~hard).mean()
        assert agree > 0.995, (angle, agree)


def test_crowdpose_protocol_bands():
    """CrowdPose summarize: crowdIndex bands are half-open; per-band AP
    reflects which images' detections are present."""
    rng = np.random.RandomState(5)
    gt, dt, ci = {}, {}, {}
    for img, idx in enumerate([0.05, 0.5, 0.9]):
        kp = np.zeros(42)
        kp[0::3] = rng.rand(14) * 100
        kp[1::3] = rng.rand(14) * 100
        kp[2::3] = 2
        gt[img] = [{"keypoints": kp.tolist(), "area": 8000,
                    "bbox": [0, 0, 90, 90], "iscrowd": 0, "num_keypoints": 14}]
        ci[img] = idx
        # perfect detection only for the easy and hard images
        if idx != 0.5:
            dt[img] = [{"keypoints": kp.tolist(), "score": 0.9}]
        else:
            dt[img] = []
    ev = KeypointEval(gt, dt, num_joints=14, crowd_index=ci)
    stats = dict(ev.summarize_crowdpose())
    assert stats["AP (easy)"] > 0.999
    assert stats["AP (medium)"] == 0.0
    assert stats["AP (hard)"] > 0.999
    assert 0.5 < stats["AP"] < 1.0


def test_prefetch_early_exit_stops_workers():
    """Breaking out mid-iteration must tear down worker threads
    (round-1 known leak for max_batches consumers)."""
    import threading
    import time

    from i2rnet_tpu.data.prefetch import prefetch_batches

    baseline = threading.active_count()

    def batches():
        for i in range(100):
            yield [i], 1

    gen = prefetch_batches(batches(), lambda idx, items, nb: items[0] * 2,
                           num_workers=4)
    got = []
    for x in gen:
        got.append(x)
        if len(got) == 2:
            break
    gen.close()
    deadline = time.time() + 15
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= baseline, (
        f"leaked threads: {threading.active_count()} > {baseline}")
    assert got == [0, 2]
