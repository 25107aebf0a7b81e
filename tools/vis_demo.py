#!/usr/bin/env python
"""Render predicted skeletons from a results JSON (reference ``vis_demo.py``).

Usage:
    python tools/vis_demo.py --results results.json --image-root <dir> \
        --out-dir vis/ [--score-thresh 0.3]
"""

import argparse
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from i2rnet_tpu.utils.vis import draw_skeleton  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True, help="keypoint results JSON")
    p.add_argument("--image-root", required=True)
    p.add_argument("--out-dir", default="vis_out")
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--pattern", default="{:012d}.jpg",
                   help="image filename pattern from image_id")
    p.add_argument("--limit", type=int, default=50)
    args = p.parse_args()

    with open(args.results) as f:
        results = json.load(f)

    by_image = defaultdict(list)
    for r in results:
        if r["score"] >= args.score_thresh:
            by_image[r["image_id"]].append(r)

    os.makedirs(args.out_dir, exist_ok=True)
    for i, (img_id, persons) in enumerate(sorted(by_image.items())):
        if i >= args.limit:
            break
        path = os.path.join(args.image_root, args.pattern.format(img_id))
        img = cv2.imread(path)
        if img is None:
            continue
        for person in persons:
            kp = np.asarray(person["keypoints"], np.float32).reshape(-1, 3)
            img = draw_skeleton(img, kp)
        out = os.path.join(args.out_dir, os.path.basename(path))
        cv2.imwrite(out, img)
    print(f"wrote visualizations to {args.out_dir}")


if __name__ == "__main__":
    main()
