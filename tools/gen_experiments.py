#!/usr/bin/env python
"""Generate the in-repo ``experiments/`` YAMLs from the released configs.

One-time (re)generation tool: loads each of the 10 released reference
experiment YAMLs (``/root/reference/experiments/{coco,crowdpose,OCHuman}``)
through :func:`i2rnet_tpu.config.load_config` — i.e. defaults merged with
the released file, exactly what the reference's ``update_config`` produces —
normalizes the machine-specific data paths, and dumps the FULL resolved
config (including this framework's ``TPU`` section at its defaults) to
``experiments/<subdir>/<same name>.yaml``.

The emitted files are standalone: ``tools/train.py --cfg experiments/...``
works without reaching into ``/root/reference``. A golden test
(``tests/test_experiments_yaml.py``) pins the emitted files equal to the
released configs modulo the normalized keys.
"""

from __future__ import annotations

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from i2rnet_tpu.config.config import load_config  # noqa: E402

REFERENCE_EXPERIMENTS = "/root/reference/experiments"

RELEASED = [
    "coco/interformer_coco_w48_pure_en6.yaml",
    "coco/interformer_coco_tph_192_p4_b4.yaml",
    "coco/interformer_coco_hrt_192_p2_b12.yaml",
    "coco/interformer_coco_hrt_288_p2_b4.yaml",
    "crowdpose/interformer_crowdpose_w48_pure_en6.yaml",
    "crowdpose/interformer_crowdpose_tph_192_p6_b4.yaml",
    "crowdpose/interformer_crowdpose_hrt_192_p4_b4.yaml",
    "OCHuman/interformer_ochuman_w48_pure_en6.yaml",
    "OCHuman/interformer_ochuman_tph_192_p3_b8.yaml",
    "OCHuman/interformer_ochuman_hrt_192_p3_b8.yaml",
]

# machine-specific path prefixes in the released files -> portable defaults
# (users point DATA_DIR at their dataset tree instead)
DATA_ROOTS = {"coco": "data/coco/", "crowdpose": "data/crowdpose/",
              "OCHuman": "data/OCHuman/"}
BBOX_FILE = ("data/coco/person_detection_results/"
             "COCO_val2017_detections_AP_H_56_person.json")

HEADER = """\
# {name} — TPU-framework experiment config.
# Hyperparameters resolved from the released config
# (reference experiments/{rel}) through the same defaults-merge the
# reference's update_config performs; dataset paths normalized to a
# portable data/ prefix (set DATA_DIR or edit DATASET.ROOT).
# Regenerate with: python tools/gen_experiments.py
"""


def generate(ref_root: str, out_root: str) -> list:
    written = []
    for rel in RELEASED:
        src = os.path.join(ref_root, rel)
        cfg = load_config(src)
        d = cfg.to_dict()
        ds = d["DATASET"]["DATASET"]
        d["DATASET"]["ROOT"] = DATA_ROOTS.get(ds, "data/")
        if d["TEST"].get("COCO_BBOX_FILE"):
            d["TEST"]["COCO_BBOX_FILE"] = BBOX_FILE
        # GPUS is accepted for YAML compat only; drop the tuple (yaml would
        # serialize it as a python/tuple tag) in favor of the default
        d.pop("GPUS", None)
        d.pop("SEED", None)  # let callers seed explicitly

        dst = os.path.join(out_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        name = os.path.basename(rel)
        with open(dst, "w") as f:
            f.write(HEADER.format(name=name, rel=rel))
            yaml.safe_dump(d, f, sort_keys=True, default_flow_style=False)
        written.append(dst)
        print(f"wrote {dst}")
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default=REFERENCE_EXPERIMENTS)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "experiments"))
    args = ap.parse_args()
    generate(args.reference, args.out)


if __name__ == "__main__":
    main()
