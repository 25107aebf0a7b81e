"""OCHuman dataset (COCO-format, 17 joints, heavy occlusion).

Reference ``lib/dataset/ochuman.py``: ``image_set`` names the annotation
JSON directly (relative to root), images live at ``root/images/{id:06d}.jpg``.
Evaluation follows the COCO keypoint protocol; DETAIL_EVAL adds the
crowd-stratified report (see utils.KeypointEvaluator).

``coco_ochuman`` (reference ``lib/dataset/coco_ochuman.py``) — a COCO-schema
dataset whose image paths point at OCHuman for transfer evaluation — is the
same class with a COCO-style 12-digit path; registered separately.
"""

from __future__ import annotations

import os

from i2rnet_tpu.data.coco import COCODataset
from i2rnet_tpu.registry import register_dataset


@register_dataset("OCHuman")
class OCHumanDataset(COCODataset):
    num_joints = 17
    # reference lib/dataset/ochuman.py:450-459: KeypointEvaluator with
    # cluster_mode [1, 2] -> levels c1={1 person}, c2={2+ persons}
    detail_cluster_mode = (1, 2)

    def _ann_file(self):
        return os.path.join(self.root, self.image_set)

    def image_path(self, index: int) -> str:
        return os.path.join(self.root, "images", f"{index:06d}.jpg")

    def _skip_scoring(self) -> bool:
        # OCHuman's released eval files are named *_test_range_*.json but
        # carry public GT; the reference scores unconditionally (its
        # 'test'-skip guard is commented out, ochuman.py:371-373,383) —
        # inheriting COCO's "test means no GT" rule would silently return
        # AP 0 for the reference's own released eval command.
        return False


@register_dataset("coco_ochuman")
class CocoOCHumanDataset(OCHumanDataset):
    def image_path(self, index: int) -> str:
        return os.path.join(self.root, "images", f"{index:012d}.jpg")
