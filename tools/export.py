#!/usr/bin/env python
"""Export a model forward to a serialized StableHLO artifact for serving.

Production-deployment path with no reference counterpart (the reference
serves from the torch checkpoint): ``jax.export`` captures the jitted
forward with static shapes into a version-stable artifact that any
jax.export-compatible runtime (or a later jax version) can rehydrate and run
without the Python model code.

    python tools/export.py --preset coco_w48 --batch 16 --persons 7 \
        --out exported/w48_pure.stablehlo [--checkpoint ckpt_dir_or_pth]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default=None)
    p.add_argument("--preset", default="coco_w48", choices=["coco_w48", "coco_tph"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--persons", type=int, default=7)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from i2rnet_tpu.registry import get_model_builder

    if args.cfg:
        from i2rnet_tpu.config import load_config
        cfg = load_config(args.cfg, opts=args.opts or [])
    else:
        from i2rnet_tpu.presets import tph_interformer, w48_pure_en6
        cfg = {"coco_w48": w48_pure_en6, "coco_tph": tph_interformer}[args.preset]("coco")

    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    b, n = args.batch, args.persons
    w, h = cfg.MODEL.IMAGE_SIZE

    if args.checkpoint:
        if args.checkpoint.endswith(".pth"):
            from i2rnet_tpu.convert.torch_import import convert_torch_checkpoint
            variables = convert_torch_checkpoint(args.checkpoint, cfg)
        else:
            from i2rnet_tpu.utils.checkpoint import load_variables
            variables = load_variables(args.checkpoint)
    else:
        print("warning: exporting with random init (no --checkpoint)")
        probe = np.zeros((1, 2, h, w, 3), np.float32)
        variables = model.init(jax.random.PRNGKey(0), probe,
                               np.zeros((1, 2, h, w, 1), np.float32),
                               np.ones((1, 2), bool), train=False)

    def forward(images, pos_masks, valid):
        return model.apply(variables, images, pos_masks, valid,
                           train=False)["multi"]

    specs = (
        jax.ShapeDtypeStruct((b, n, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, n, h, w, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, n), jnp.bool_),
    )
    exported = jax.export.export(jax.jit(forward))(*specs)
    blob = exported.serialize()
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(blob)
    print(f"wrote {out} ({len(blob) / 1e6:.1f} MB, "
          f"in {exported.in_avals} -> out {exported.out_avals})")


if __name__ == "__main__":
    main()
