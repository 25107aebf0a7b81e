#!/usr/bin/env python
"""FLOPs + throughput benchmark (reference ``tools/compute_flops.py``).

The reference traces torchscript graphs and sums per-op FLOP formulas
(``tools/flop_count.py`` / ``tools/jit_handles.py``); here the compiled HLO
reports its own cost analysis — exact for the graph XLA actually runs — and
wall-clock follows the reference protocol (10-iter warmup + 10-iter timing).

Usage:
    python tools/compute_flops.py --cfg <yaml> [--batch 8 --persons 7]
    python tools/compute_flops.py --preset coco_w48  # no YAML needed
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default=None)
    p.add_argument("--preset", default="coco_w48",
                   choices=["coco_w48", "coco_tph", "tph_single"])
    p.add_argument("--batch", type=int, default=8, help="images per batch")
    p.add_argument("--persons", type=int, default=7, help="persons per image")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import numpy as np

    from i2rnet_tpu.registry import get_model_builder

    if args.cfg:
        from i2rnet_tpu.config import load_config
        cfg = load_config(args.cfg, opts=args.opts or [])
    else:
        from i2rnet_tpu.presets import tph_interformer, w48_pure_en6
        if args.preset == "tph_single":
            # plain single-person TransPose-H (reference
            # tools/compute_flops_transpose.py)
            cfg = tph_interformer("coco").clone()
            cfg.MODEL.NAME = "transpose_h"
            cfg.freeze()
        else:
            cfg = {"coco_w48": w48_pure_en6,
                   "coco_tph": tph_interformer}[args.preset]("coco")

    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    b, n = args.batch, args.persons
    w, h = cfg.MODEL.IMAGE_SIZE
    rng = np.random.RandomState(0)
    single_person = cfg.MODEL.NAME == "transpose_h"
    if single_person:
        n = 1
    images = rng.rand(b, n, h, w, 3).astype(np.float32)
    pos = (rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32)
    valid = np.ones((b, n), bool)

    if single_person:
        flat = images.reshape(b, h, w, 3)
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), flat[:1], None, train=False))()

        def forward(im, pm, v):
            return model.apply(variables, im.reshape(b, h, w, 3), None,
                               train=False)[1]
    else:
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), images[:1, :2], pos[:1, :2], valid[:1, :2],
            train=False))()

        def forward(im, pm, v):
            out = model.apply(variables, im, pm, v, train=False)
            return out["multi"]

    lowered = jax.jit(forward).lower(images, pos, valid)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    im_d, pm_d, v_d = map(jax.device_put, (images, pos, valid))
    for _ in range(args.iters):
        compiled(im_d, pm_d, v_d).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = compiled(im_d, pm_d, v_d)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters

    persons = b * n
    print(json.dumps({
        "model": cfg.MODEL.NAME,
        "input": f"{h}x{w}",
        "batch_images": b,
        "persons_per_image": n,
        "gflops_per_batch": round(flops / 1e9, 2),
        "gflops_per_person": round(flops / persons / 1e9, 3),
        "hbm_gb_per_batch": round(bytes_accessed / 1e9, 3),
        "latency_ms": round(dt * 1e3, 3),
        "persons_per_sec": round(persons / dt, 1),
        "fps_images": round(b / dt, 1),
        "tflops_per_sec": round(flops / dt / 1e12, 3),
    }, indent=2))


if __name__ == "__main__":
    main()
