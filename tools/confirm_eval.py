#!/usr/bin/env python
"""Re-score an arbitrary keypoint-results JSON (reference ``confirm_eval.py``).

Usage:
    python tools/confirm_eval.py --results results.json --ann <gt json> \
        [--num-joints 17] [--crowdpose]
"""

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from i2rnet_tpu.data.coco_format import CocoJson  # noqa: E402
from i2rnet_tpu.ops.cocoeval import KeypointEval  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True)
    p.add_argument("--ann", required=True, help="COCO-format GT annotations")
    p.add_argument("--num-joints", type=int, default=17)
    p.add_argument("--crowdpose", action="store_true")
    args = p.parse_args()

    coco = CocoJson(args.ann)
    gt = defaultdict(list)
    for img_id in coco.get_img_ids():
        for obj in coco.get_anns(img_id, iscrowd=None):
            kp = obj.get("keypoints", [])
            gt[img_id].append({
                "id": obj["id"],
                "keypoints": kp,
                "area": obj.get("area", 0),
                "bbox": obj.get("bbox", [0, 0, 0, 0]),
                "iscrowd": obj.get("iscrowd", 0),
                "num_keypoints": obj.get(
                    "num_keypoints",
                    int(np.count_nonzero(np.asarray(kp)[2::3])) if kp else 0),
            })

    with open(args.results) as f:
        results = json.load(f)
    dt = defaultdict(list)
    for r in results:
        dt[r["image_id"]].append({"keypoints": r["keypoints"], "score": r["score"]})

    if args.crowdpose:
        ci = {im["id"]: float(im.get("crowdIndex", 0.0))
              for im in coco.dataset.get("images", [])}
        ev = KeypointEval(gt, dt, num_joints=args.num_joints, crowd_index=ci)
        stats = ev.summarize_crowdpose()
    else:
        ev = KeypointEval(gt, dt, num_joints=args.num_joints)
        stats = ev.summarize_coco()
    for name, val in stats:
        print(f"{name:12s} {val:.4f}")


if __name__ == "__main__":
    main()
