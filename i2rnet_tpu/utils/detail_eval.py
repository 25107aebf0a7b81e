"""Crowd-stratified detail evaluation.

Reimplements reference ``lib/utils/KeypointEvaluator.py`` semantics: split
GT (and results) by persons-per-image into cluster levels and report AP per
level — how accuracy degrades with crowding.

Band semantics follow the reference's ``ClusterMode`` (``:528-545``) exactly:
``cluster_mode`` is a list of band START points; level ``c{i}`` covers
``[start[i-1], start[i] - 1]`` and images with more persons than the last
populated key open one extra level. E.g.:

- ``[1, 2, 6, 10]`` (default, reference ``:482``) -> c1={1}, c2={2-5},
  c3={6-9}, c4={10+}
- ``[1, 2]`` (OCHuman, reference ``lib/dataset/ochuman.py:450-459``) ->
  c1={1}, c2={2+}

``write_report`` mirrors the reference's ``res_eval.txt`` output
(``KeypointEvaluator.py:436-482``): the all-images eval, per-level
person-count histograms, and per-level stat lines.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

from i2rnet_tpu.ops.cocoeval import KeypointEval


def cluster_bands(cluster_mode: Sequence[int]) -> List[Tuple[str, int, int]]:
    """ClusterMode start points -> [(level, lo, hi)], hi inclusive
    (reference ``KeypointEvaluator.py:528-545``)."""
    pts = list(cluster_mode)
    bands: List[Tuple[str, int, int]] = []
    for i in range(len(pts) - 1):
        bands.append((f"c{i + 1}", pts[i], pts[i + 1] - 1))
    # n > max populated key opens one extra level (get_cluster_level :543-545)
    bands.append((f"c{len(pts)}", pts[-1], 10 ** 9))
    return bands


def _band_label(lo: int, hi: int) -> str:
    if lo == hi:
        return f"n={lo}"
    if hi >= 10 ** 9:
        return f"n>={lo}"
    return f"n={lo}-{hi}"


def detail_evaluate(gt: Dict[int, List[dict]], dt: Dict[int, List[dict]],
                    num_joints: int = 17,
                    cluster_mode: Sequence[int] = (1, 2, 6, 10),
                    sigmas=None,
                    report_path: Optional[str] = None,
                    all_stats=None) -> "OrderedDict[str, float]":
    """Per-crowd-level AP. Returns {'AP(c1:n=1)': ..., ...}.

    When ``report_path`` is given, also writes the reference-style
    ``res_eval.txt`` (all-images stats = ``all_stats`` if provided, plus
    per-level count histograms and stat lines)."""
    persons = {img: len([g for g in gts if g.get("num_keypoints", 1) > 0])
               for img, gts in gt.items()}

    out = OrderedDict()
    report_blocks = []
    for level, lo, hi in cluster_bands(cluster_mode):
        ids = {i for i, n in persons.items() if lo <= n <= hi}
        if not ids:
            continue
        ev = KeypointEval({i: gt[i] for i in ids},
                          {i: dt.get(i, []) for i in ids},
                          num_joints=num_joints, sigmas=sigmas)
        stats = OrderedDict(ev.summarize_coco())
        label = _band_label(lo, hi)
        out[f"AP({level}:{label})"] = stats["AP"]
        counts = OrderedDict()
        counts["total"] = len(ids)
        for n in sorted({persons[i] for i in ids}):
            counts[str(n)] = sum(1 for i in ids if persons[i] == n)
        report_blocks.append((level, counts, stats))

    if report_path is not None:
        _write_report(report_path, report_blocks, all_stats)
    return out


def _write_report(path: str, blocks, all_stats=None) -> None:
    """Reference ``res_eval.txt`` layout (``KeypointEvaluator.py:436-482``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n\n")
        f.write("All eval:\n")
        if all_stats:
            for name, val in dict(all_stats).items():
                f.write(f"('{name}', {val})\n")
        f.write("\n\n")
        for level, counts, stats in blocks:
            f.write(f"Class {level} eval:")
            f.write("\n{\n")
            for k, v in counts.items():
                f.write(f"    {k}:{v}\n")
            f.write("}\n")
            for name, val in stats.items():
                f.write(f"('{name}', {val})\n")
            f.write("\n\n")
