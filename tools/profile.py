#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship forward/train step.

The TPU counterpart of the reference's wall-clock/AverageMeter timing
(``lib/core/function.py:31-44``): produces a Perfetto/TensorBoard trace with
per-op device timelines.

Usage:
    python tools/profile.py [--train] [--out /tmp/i2r_trace] [--iters 5]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/i2r_trace")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--train", action="store_true", help="profile a train step")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--persons", type=int, default=7)
    p.add_argument("--preset", default="w48",
                   choices=["w48", "tph", "hrt"],
                   help="model family (vanilla / TransPose-H / HRFormer-B)")
    args = p.parse_args()

    import jax
    import numpy as np

    from i2rnet_tpu.presets import (hrt_interformer, tph_interformer,
                                    w48_pure_en6)
    from i2rnet_tpu.registry import get_model_builder

    cfg = {"w48": w48_pure_en6, "tph": tph_interformer,
           "hrt": hrt_interformer}[args.preset]("coco")
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    rng = np.random.RandomState(0)
    w, h = cfg.MODEL.IMAGE_SIZE
    b, n = args.batch, args.persons
    images = rng.rand(b, n, h, w, 3).astype(np.float32)
    pos = (rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32)
    valid = np.ones((b, n), bool)

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), images[:1, :2], pos[:1, :2], valid[:1, :2],
        train=False))()

    if args.train:
        from i2rnet_tpu.core.train import make_train_step
        from i2rnet_tpu.core.train_state import create_train_state, make_optimizer
        hw_, hh_ = cfg.MODEL.HEATMAP_SIZE
        batch = {
            "images": images, "pos_masks": pos, "person_valid": valid,
            "target": rng.rand(b, n, cfg.MODEL.NUM_JOINTS, hh_, hw_).astype(np.float32),
            "target_weight": np.ones((b, n, cfg.MODEL.NUM_JOINTS), np.float32),
        }
        tx, _ = make_optimizer(cfg, steps_per_epoch=100)
        state = create_train_state(model, variables, tx)
        step = make_train_step(model, tx, donate=False,
                               remat=cfg.TPU.get("REMAT", "none"))
        state, _ = step(state, batch, jax.random.PRNGKey(1))  # compile

        with jax.profiler.trace(args.out):
            for i in range(args.iters):
                state, metrics = step(state, batch, jax.random.PRNGKey(i))
            # block on the full state: over the tunnel, donated outputs and
            # the mid-program loss scalar report ready early (see
            # docs/perf/hrformer_r02.md "timing trap")
            jax.block_until_ready((state, metrics))
    else:
        fwd = jax.jit(lambda im, pm, v: model.apply(variables, im, pm, v,
                                                    train=False)["multi"])
        out = fwd(images, pos, valid)
        out.block_until_ready()
        with jax.profiler.trace(args.out):
            for _ in range(args.iters):
                out = fwd(images, pos, valid)
            out.block_until_ready()

    print(f"trace written to {args.out} (open with TensorBoard or Perfetto)")


if __name__ == "__main__":
    main()
