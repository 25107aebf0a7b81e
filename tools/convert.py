#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint to an Orbax checkpoint.

One-time import of the released ``.pth`` weights (reference model zoo,
README tables) into this framework's native format:

    python tools/convert.py --cfg <experiment.yaml> \
        --pth models/interformer_coco_w48_pure_en6.pth --out ckpt/w48_pure

The resulting directory loads with ``utils.checkpoint.load_variables`` /
``TEST.MODEL_FILE`` and hub loaders.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--strict", action="store_true",
                   help="fail on any unmatched torch parameter")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import os

    import orbax.checkpoint as ocp

    from i2rnet_tpu.config import load_config
    from i2rnet_tpu.convert.torch_import import convert_state_dict, load_torch_state_dict

    cfg = load_config(args.cfg, opts=args.opts or [])
    sd = load_torch_state_dict(args.pth)
    variables, unmatched = convert_state_dict(sd, cfg.MODEL.NAME, strict=args.strict)
    if unmatched:
        print(f"warning: {len(unmatched)} unmatched torch params "
              f"(first: {unmatched[:5]})")

    out = Path(args.out).resolve()
    ocp.PyTreeCheckpointer().save(os.fspath(out), variables, force=True)
    n = sum(1 for _ in __import__("jax").tree_util.tree_leaves(variables["params"]))
    print(f"wrote {out} ({n} parameter tensors)")


if __name__ == "__main__":
    main()
