"""coco_ochuman transfer-eval dataset: layout, paths, scoring.

The reference's ``lib/dataset/coco_ochuman.py`` is its COCO class pointed
at OCHuman data via hardcoded absolute paths — flat 6-digit image names
(coco_ochuman.py:252-253; the 12-digit COCO naming above them is commented
out) and the OCHuman test-range annotation JSON (:122). Scoring happens in
its usage (image_set='val2017' never matches the 'test' guard). Our
portable translation is the OCHuman layout under a second registry name;
these tests pin that contract.
"""

import os

import numpy as np
import pytest

from i2rnet_tpu.data.synthetic import make_synthetic_ochuman
from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.registry import get_dataset_class

ANN = "ochuman_coco_format_test_range_0.00_1.00.json"


@pytest.fixture
def ds(tmp_path):
    root = make_synthetic_ochuman(str(tmp_path / "d"), num_images=4,
                                  max_persons=2, ann_name=ANN)
    cfg = tiny_test_config(num_joints=17).clone()
    cfg.DATASET.DATASET = "coco_ochuman"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = ANN
    cfg = cfg.freeze()
    return get_dataset_class("coco_ochuman")(cfg, root, ANN, is_train=False), cfg


def test_paths_resolve_six_digit(ds):
    ds, _ = ds
    assert len(ds.db) == 4
    for rec in ds.db:
        # the reference resolves '%06d.jpg' flat under images/
        # (coco_ochuman.py:252-253) — a 12-digit COCO name would miss
        assert os.path.basename(rec["image"]) == f"{rec['image_id']:06d}.jpg"
        assert os.path.exists(rec["image"])


def test_transfer_eval_scores_despite_test_in_name(ds, tmp_path):
    """GT-derived predictions through evaluate(): the released file name
    contains 'test' but scoring must still run (the dataset's purpose);
    near-perfect preds give AP ~1."""
    ds, cfg = ds
    preds, boxes, ids = [], [], []
    for rec in ds.db:
        for a in rec["annos"]:
            j = a["joints_3d"][:, :2]
            preds.append(np.concatenate([j, 0.9 * np.ones((17, 1))], axis=1))
            boxes.append(np.concatenate([a["center"], a["scale"],
                                         [np.prod(a["scale"] * 200), 0.95]]))
            ids.append(rec["image_id"])
    name_value, ap = ds.evaluate(
        cfg, np.stack(preds), str(tmp_path / "o"), np.stack(boxes),
        np.array(ids))
    assert "AP" in name_value and name_value != {"Null": 0}
    assert ap > 0.95, dict(name_value)
    assert os.path.exists(
        tmp_path / "o" / "results" / f"keypoints_{ANN}_results.json")
