"""CrowdPose dataset (14 joints) — reference ``lib/dataset/crowdpose.py``.

Differences from COCO: annotation file at ``root/json/crowdpose_{set}.json``,
images at ``root/images/{id}.jpg``, 14-joint skeleton with its own flip
pairs/half-body split, CrowdPose evaluation protocol (AP/AR + AP easy/medium/
hard stratified by per-image ``crowdIndex``).
"""

from __future__ import annotations

import json
import logging
import os
from collections import defaultdict

from i2rnet_tpu.data.coco import COCODataset
from i2rnet_tpu.ops.cocoeval import KeypointEval
from i2rnet_tpu.registry import register_dataset

logger = logging.getLogger(__name__)


@register_dataset("crowdpose")
class CROWDPOSEDataset(COCODataset):
    num_joints = 14
    flip_pairs = [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9], [10, 11]]
    upper_body_ids = (0, 1, 2, 3, 4, 5, 12, 13)
    lower_body_ids = (6, 7, 8, 9, 10, 11)
    # limb up-weighting (reference crowdpose.py:104-110)
    joints_weight = (1., 1., 1.2, 1.2, 1.5, 1.5, 1., 1., 1.2,
                     1.2, 1.5, 1.5, 1., 1.)

    def _ann_file(self):
        return os.path.join(self.root, "json", f"crowdpose_{self.image_set}.json")

    def image_path(self, index: int) -> str:
        return os.path.join(self.root, "images", f"{index}.jpg")

    def _skip_scoring(self) -> bool:
        # the crowdpose eval split is named 'test' and HAS public GT — the
        # reference scores it unconditionally (crowdpose.py:394-396)
        return False

    def _crowd_index(self):
        return {im["id"]: float(im.get("crowdIndex", 0.0))
                for im in self.coco.dataset.get("images", [])}

    def _score(self, res_file):
        with open(res_file) as f:
            results = json.load(f)
        dt = defaultdict(list)
        for r in results:
            dt[r["image_id"]].append({"keypoints": r["keypoints"], "score": r["score"]})
        ev = KeypointEval(self._gt_for_eval(), dt, num_joints=self.num_joints,
                          crowd_index=self._crowd_index())
        return ev.summarize_crowdpose()
