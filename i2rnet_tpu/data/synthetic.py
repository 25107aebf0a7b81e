"""Synthetic COCO-format mini-dataset for tests and smoke training.

Generates small images containing colored "stick figures" whose joints are
exactly known, writes a COCO-format annotation JSON + jpg files, so the full
pipeline (COCODataset -> batcher -> device preprocess -> model -> decode ->
evaluate) runs hermetically on CPU. The SURVEY.md §4 test-plan artifact.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import cv2
import numpy as np


def make_synthetic_coco(root: str, num_images: int = 6,
                        image_hw: Tuple[int, int] = (240, 320),
                        num_joints: int = 17, max_persons: int = 3,
                        image_set: str = "val2017", seed: int = 0) -> str:
    """Create images/ + annotations/ under ``root``. Returns root."""
    rng = np.random.RandomState(seed)
    h, w = image_hw
    img_dir = os.path.join(root, "images", image_set)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        img = (rng.rand(h, w, 3) * 40).astype(np.uint8)
        n_person = rng.randint(1, max_persons + 1)
        for _ in range(n_person):
            pw = rng.randint(40, 80)
            ph = rng.randint(80, 140)
            x0 = rng.randint(0, max(1, w - pw))
            y0 = rng.randint(0, max(1, h - ph))
            color = tuple(int(c) for c in rng.randint(80, 255, 3))
            cv2.rectangle(img, (x0, y0), (x0 + pw, y0 + ph), color, 2)

            kps = []
            n_vis = 0
            for j in range(num_joints):
                jx = x0 + int((0.2 + 0.6 * rng.rand()) * pw)
                jy = y0 + int((j + 0.5) / num_joints * ph)
                vis = 2 if rng.rand() > 0.15 else 0
                if vis:
                    cv2.circle(img, (jx, jy), 3, color, -1)
                    n_vis += 1
                kps.extend([jx, jy, vis])
            annotations.append({
                "id": ann_id,
                "image_id": img_id,
                "category_id": 1,
                "keypoints": kps,
                "num_keypoints": n_vis,
                "bbox": [float(x0), float(y0), float(pw), float(ph)],
                "area": float(pw * ph),
                "iscrowd": 0,
            })
            ann_id += 1
        fn = f"{img_id:012d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fn), img)
        images.append({"id": img_id, "file_name": fn, "height": h, "width": w})

    skeleton_names = [f"j{i}" for i in range(num_joints)]
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person", "supercategory": "person",
            "keypoints": skeleton_names, "skeleton": [],
        }],
    }
    with open(os.path.join(ann_dir, f"person_keypoints_{image_set}.json"), "w") as f:
        json.dump(ann, f)
    return root


def make_synthetic_crowdpose(root: str, num_images: int = 6,
                             image_hw: Tuple[int, int] = (240, 320),
                             max_persons: int = 3, image_set: str = "test",
                             seed: int = 0) -> str:
    """CrowdPose-format variant of :func:`make_synthetic_coco`.

    Layout per reference ``lib/dataset/crowdpose.py``: annotations at
    ``root/json/crowdpose_{set}.json`` (crowdpose.py:121-127), images flat at
    ``root/images/{id}.jpg`` (crowdpose.py:270-276), 14 joints. Image ids are
    6-digit because the reference's evaluate parses the id from the image
    path as ``int(img_path[-10:-4])`` (crowdpose.py:351). Every image carries
    a ``crowdIndex`` cycling through the three evaluation bands (easy < 0.1,
    medium, hard > 0.8) so AP (easy)/(medium)/(hard) are all exercised.
    """
    rng = np.random.RandomState(seed)
    num_joints = 14
    h, w = image_hw
    img_dir = os.path.join(root, "images")
    ann_dir = os.path.join(root, "json")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    crowd_levels = [0.05, 0.4, 0.9]
    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        img_id = 100001 + i
        img = (rng.rand(h, w, 3) * 40).astype(np.uint8)
        n_person = rng.randint(1, max_persons + 1)
        for _ in range(n_person):
            pw = rng.randint(40, 80)
            ph = rng.randint(80, 140)
            x0 = rng.randint(0, max(1, w - pw))
            y0 = rng.randint(0, max(1, h - ph))
            color = tuple(int(c) for c in rng.randint(80, 255, 3))
            cv2.rectangle(img, (x0, y0), (x0 + pw, y0 + ph), color, 2)
            kps = []
            n_vis = 0
            for j in range(num_joints):
                jx = x0 + int((0.2 + 0.6 * rng.rand()) * pw)
                jy = y0 + int((j + 0.5) / num_joints * ph)
                vis = 2 if rng.rand() > 0.15 else 0
                if vis:
                    cv2.circle(img, (jx, jy), 3, color, -1)
                    n_vis += 1
                kps.extend([jx, jy, vis])
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": n_vis,
                "bbox": [float(x0), float(y0), float(pw), float(ph)],
                "area": float(pw * ph), "iscrowd": 0,
            })
            ann_id += 1
        cv2.imwrite(os.path.join(img_dir, f"{img_id}.jpg"), img)
        images.append({"id": img_id, "file_name": f"{img_id}.jpg",
                       "height": h, "width": w,
                       "crowdIndex": crowd_levels[i % 3]})

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person", "supercategory": "person",
            "keypoints": [f"j{i}" for i in range(num_joints)], "skeleton": [],
        }],
    }
    with open(os.path.join(ann_dir, f"crowdpose_{image_set}.json"), "w") as f:
        json.dump(ann, f)
    return root


def make_synthetic_ochuman(root: str, num_images: int = 6,
                           image_hw: Tuple[int, int] = (240, 320),
                           max_persons: int = 3,
                           ann_name: str =
                           "ochuman_coco_format_val_range_0.00_1.00.json",
                           seed: int = 0) -> str:
    """OCHuman-format variant of :func:`make_synthetic_coco`.

    Layout per reference ``lib/dataset/ochuman.py``: ``image_set`` names the
    annotation JSON itself, resolved as ``root/{image_set}``
    (ochuman.py:116-125 — the annotations/person_keypoints_* convention is
    commented out), images flat at ``root/images/{id:06d}.jpg``
    (ochuman.py:253-259). 17 COCO joints. Image ids are 6-digit because
    evaluate parses the id from the image path as ``int(img_path[-10:-4])``
    (ochuman.py:330). Persons are drawn overlapping (OCHuman is the
    occlusion benchmark), with at least one multi-person image so the
    cluster_mode=[1,2] detail bands both populate.

    Returns root; point ``DATASET.TEST_SET`` at ``ann_name``.
    """
    rng = np.random.RandomState(seed)
    num_joints = 17
    h, w = image_hw
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(root, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        img_id = 100001 + i
        img = (rng.rand(h, w, 3) * 40).astype(np.uint8)
        # force the occlusion flavor: >=2 persons on even images, sharing
        # a neighborhood so their boxes overlap
        n_person = (rng.randint(2, max_persons + 1) if i % 2 == 0
                    else rng.randint(1, max_persons + 1))
        cx0 = rng.randint(0, w // 2)
        cy0 = rng.randint(0, h // 3)
        for p in range(n_person):
            pw = rng.randint(40, 80)
            ph = rng.randint(80, 140)
            x0 = min(max(0, cx0 + rng.randint(-10, 30 * p + 11)), w - pw - 1)
            y0 = min(max(0, cy0 + rng.randint(-10, 11)), h - ph - 1)
            color = tuple(int(c) for c in rng.randint(80, 255, 3))
            cv2.rectangle(img, (x0, y0), (x0 + pw, y0 + ph), color, 2)
            kps = []
            n_vis = 0
            for j in range(num_joints):
                jx = x0 + int((0.2 + 0.6 * rng.rand()) * pw)
                jy = y0 + int((j + 0.5) / num_joints * ph)
                vis = 2 if rng.rand() > 0.15 else 0
                if vis:
                    cv2.circle(img, (jx, jy), 3, color, -1)
                    n_vis += 1
                kps.extend([jx, jy, vis])
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": n_vis,
                "bbox": [float(x0), float(y0), float(pw), float(ph)],
                "area": float(pw * ph), "iscrowd": 0,
            })
            ann_id += 1
        cv2.imwrite(os.path.join(img_dir, f"{img_id:06d}.jpg"), img)
        images.append({"id": img_id, "file_name": f"{img_id:06d}.jpg",
                       "height": h, "width": w})

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person", "supercategory": "person",
            "keypoints": [f"j{i}" for i in range(num_joints)], "skeleton": [],
        }],
    }
    with open(os.path.join(root, ann_name), "w") as f:
        json.dump(ann, f)
    return root


def make_synthetic_detections(root: str, image_set: str = "val2017",
                              seed: int = 1, jitter_px: float = 2.0,
                              dup_every: int = 2, low_score_every: int = 4,
                              out_name: str = None) -> str:
    """Write a COCO person-detection-results JSON for the synthetic fixture.

    Mirrors what ``TEST.COCO_BBOX_FILE`` carries in the reference's detector
    eval mode (``lib/dataset/coco.py:298-343``): one ``{image_id,
    category_id, bbox, score}`` entry per detection. Derived from the GT
    boxes so the fixture exercises the full detector branch:

    * every GT box appears slightly jittered with a high score (kept),
    * every ``dup_every``-th box also gets a second, more-jittered duplicate
      at a lower score — decodes to near-identical keypoints, so OKS-NMS
      must drop it on both implementations,
    * every ``low_score_every``-th box adds a 0.1-score entry that
      ``TEST.IMAGE_THRE`` must filter before the model ever sees it.

    Returns the detections-file path (point ``TEST.COCO_BBOX_FILE`` at it).
    """
    rng = np.random.RandomState(seed)
    with open(os.path.join(root, "annotations",
                           f"person_keypoints_{image_set}.json")) as f:
        ann = json.load(f)

    def _jit(bbox, px):
        x, y, w, h = bbox
        return [float(x + rng.uniform(-px, px)),
                float(y + rng.uniform(-px, px)),
                float(max(8.0, w + rng.uniform(-px, px))),
                float(max(8.0, h + rng.uniform(-px, px)))]

    dets = []
    for i, a in enumerate(ann["annotations"]):
        dets.append({"image_id": a["image_id"], "category_id": 1,
                     "bbox": _jit(a["bbox"], jitter_px),
                     "score": float(rng.uniform(0.85, 0.99))})
        if dup_every and i % dup_every == 0:
            dets.append({"image_id": a["image_id"], "category_id": 1,
                         "bbox": _jit(a["bbox"], 2.5 * jitter_px),
                         "score": float(rng.uniform(0.45, 0.75))})
        if low_score_every and i % low_score_every == 0:
            dets.append({"image_id": a["image_id"], "category_id": 1,
                         "bbox": _jit(a["bbox"], jitter_px),
                         "score": 0.1})
    det_file = os.path.join(
        root, "annotations", out_name or f"person_detections_{image_set}.json")
    with open(det_file, "w") as f:
        json.dump(dets, f)
    return det_file
