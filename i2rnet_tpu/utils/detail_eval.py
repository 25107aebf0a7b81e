"""Crowd-stratified detail evaluation.

Reimplements reference ``lib/utils/KeypointEvaluator.py:482-543``: split the
GT (and the results) by persons-per-image into cluster levels (default
boundaries [1, 2, 6, 10] -> levels 1, 2, 3-6, 7-10, 11+) and report AP per
level — how accuracy degrades with crowding.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Sequence

from i2rnet_tpu.ops.cocoeval import KeypointEval


def detail_evaluate(gt: Dict[int, List[dict]], dt: Dict[int, List[dict]],
                    num_joints: int = 17,
                    cluster_levels: Sequence[int] = (1, 2, 6, 10),
                    sigmas=None) -> "OrderedDict[str, float]":
    """Per-crowd-level AP. Returns {'AP(n=1)': ..., 'AP(n=2)': ..., ...}."""
    persons = {img: len([g for g in gts if g.get("num_keypoints", 1) > 0])
               for img, gts in gt.items()}

    bands = []
    lo = 1
    for b in cluster_levels:
        bands.append((lo, b))
        lo = b + 1
    bands.append((lo, 10**9))

    out = OrderedDict()
    for lo, hi in bands:
        ids = {i for i, n in persons.items() if lo <= n <= hi}
        if not ids:
            continue
        ev = KeypointEval({i: gt[i] for i in ids},
                          {i: dt.get(i, []) for i in ids},
                          num_joints=num_joints, sigmas=sigmas)
        stats = dict(ev.summarize_coco())
        label = f"AP(n={lo})" if lo == hi else (
            f"AP(n={lo}-{hi})" if hi < 10**9 else f"AP(n>={lo})")
        out[label] = stats["AP"]
    return out
