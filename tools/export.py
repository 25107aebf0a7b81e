#!/usr/bin/env python
"""Export a trained model as a self-contained serving artifact (.i2rx).

The artifact is a jax.export StableHLO program — warp + model + flip test +
DARK decode in one device program, weights baked in — loadable with
``i2rnet_tpu.serving.load_predictor`` and runnable with nothing but jax on
the target platform. See ``i2rnet_tpu/serving.py`` for the format.

Usage:
    python tools/export.py --cfg experiments/coco/....yaml \
        --checkpoint model.pth_or_orbax --out model.i2rx \
        [--batch 8] [--persons N] [--raw-hw 960 1280] \
        [--platforms tpu cpu] [--no-pallas] [--selftest]
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
    p.add_argument("--checkpoint", default=None,
                   help=".pth (converted) or Orbax dir; random init if "
                        "omitted (plumbing tests only)")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=None,
                   help="images per request (default TEST.BATCH_SIZE_PER_GPU)")
    p.add_argument("--persons", type=int, nargs="+", default=None,
                   help="person bucket(s) N; several values (e.g. 2 4 7) "
                        "put one program per bucket in the artifact and "
                        "predict() routes rows to the smallest fit "
                        "(default DATASET.MAX_PATCH)")
    p.add_argument("--raw-hw", type=int, nargs=2, default=None,
                   help="static raw-image canvas H W (default TPU.MAX_IMAGE_HW)")
    p.add_argument("--platforms", nargs="+", default=["tpu"],
                   choices=["tpu", "cpu", "cuda", "rocm"])
    p.add_argument("--no-pallas", action="store_true",
                   help="export a pure-XLA program (portable across libtpu "
                        "generations; slower than the Mosaic kernels)")
    p.add_argument("--selftest", action="store_true",
                   help="deserialize the written artifact and run one padded "
                        "batch on the current backend")
    args = p.parse_args()

    import jax
    import numpy as np

    from i2rnet_tpu.config import load_config
    from i2rnet_tpu.registry import get_model_builder
    from i2rnet_tpu.serving import (export_predictor, load_predictor,
                                    save_artifact)

    cfg = load_config(args.cfg)
    b = args.batch or cfg.TEST.BATCH_SIZE_PER_GPU
    n = args.persons or cfg.DATASET.MAX_PATCH
    n_init = max(n) if isinstance(n, list) else n
    raw_hw = tuple(args.raw_hw or cfg.TPU.MAX_IMAGE_HW)

    if args.checkpoint:
        if args.checkpoint.endswith(".pth"):
            from i2rnet_tpu.convert.torch_import import convert_torch_checkpoint
            variables = convert_torch_checkpoint(args.checkpoint, cfg)
        else:
            from i2rnet_tpu.utils.checkpoint import load_variables
            variables = load_variables(args.checkpoint)
    else:
        print("warning: no checkpoint — exporting RANDOM weights")
        iw, ih = cfg.MODEL.IMAGE_SIZE
        model = get_model_builder(cfg.MODEL.NAME)(cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((b, n_init, ih, iw, 3), np.float32),
            np.zeros((b, n_init, ih, iw, 1), np.float32),
            np.ones((b, n_init), bool), train=False)

    use_pallas = False if args.no_pallas else None
    payload, header = export_predictor(cfg, variables, b, n, raw_hw,
                                       platforms=args.platforms,
                                       use_pallas=use_pallas)
    save_artifact(args.out, payload, header)
    print(f"wrote {args.out}: {len(payload) / 1e6:.1f} MB payload, "
          f"header {header}")

    if args.selftest:
        pred = load_predictor(args.out)
        img = np.random.randint(0, 255, (raw_hw[0] // 2, raw_hw[1] // 2, 3),
                                np.uint8)
        out = pred.predict([img], [[[4, 4, 40, 80]]])
        print(f"selftest ok: keypoints {out[0].shape}, "
              f"conf range [{out[0][..., 2].min():.3f}, "
              f"{out[0][..., 2].max():.3f}]")


if __name__ == "__main__":
    main()
