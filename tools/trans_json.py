#!/usr/bin/env python
"""Result-JSON diff harness (reference ``trans_json.py``).

Matches two keypoint-results JSONs entry-by-entry (by image_id + center) and
reports coordinate/score deltas — the reference's golden-test mechanism for
verifying one implementation reproduces another's outputs.

Usage:
    python tools/trans_json.py A.json B.json [--atol 1.0]
"""

import argparse
import json
import sys
from collections import defaultdict

import numpy as np


def index(results):
    idx = defaultdict(list)
    for r in results:
        c = r.get("center", [0, 0])
        idx[(r["image_id"], round(c[0], 1), round(c[1], 1))].append(r)
    return idx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--atol", type=float, default=1.0)
    args = p.parse_args()

    with open(args.a) as f:
        ra = json.load(f)
    with open(args.b) as f:
        rb = json.load(f)
    ia, ib = index(ra), index(rb)

    matched = 0
    max_kp = 0.0
    max_score = 0.0
    missing = 0
    for key, entries in ia.items():
        if key not in ib:
            missing += len(entries)
            continue
        for ea, eb in zip(entries, ib[key]):
            ka = np.asarray(ea["keypoints"], np.float64)
            kb = np.asarray(eb["keypoints"], np.float64)
            max_kp = max(max_kp, float(np.abs(ka - kb).max()))
            max_score = max(max_score, abs(ea["score"] - eb["score"]))
            matched += 1

    print(f"matched {matched} / {len(ra)} entries; {missing} missing in B")
    print(f"max |keypoint delta| = {max_kp:.4f}, max |score delta| = {max_score:.6f}")
    ok = max_kp <= args.atol and missing == 0
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
