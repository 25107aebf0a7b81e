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
    """Transfer-eval dataset: a COCO-configured run scored on OCHuman data.

    The reference's ``lib/dataset/coco_ochuman.py`` is its COCO class with
    the annotation file and image directory hardcoded to OCHuman absolute
    paths — images resolve as flat 6-digit names (``'%06d.jpg'`` at
    coco_ochuman.py:252-253; the 12-digit COCO naming is commented out
    above it), annotations as the OCHuman test-range JSON
    (coco_ochuman.py:122). The portable translation is therefore exactly
    the OCHuman layout (``root/{image_set}`` + ``images/{id:06d}.jpg``);
    only the registry name differs, letting a COCO experiment YAML switch
    datasets without editing model/config keys (the reference switches by
    editing ``lib/dataset/__init__.py:12-13``).

    Scoring is unconditional, like OCHumanDataset: the reference's
    ``'test' in image_set`` guard (coco_ochuman.py:371-376) never fires in
    its usage — it is driven with COCO split names ('val2017') while the
    GT file is fixed — and here ``image_set`` IS the json filename, which
    for the released file contains 'test'; honoring the dead guard would
    skip the scoring that is this dataset's entire purpose.
    """
