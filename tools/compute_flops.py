#!/usr/bin/env python
"""FLOPs + throughput benchmark (reference ``tools/compute_flops.py``).

The reference traces torchscript graphs and sums per-op FLOP formulas
(``tools/flop_count.py`` / ``tools/jit_handles.py``); here the compiled HLO
reports its own cost analysis — exact for the graph XLA actually runs — and
wall-clock follows the reference protocol (10-iter warmup + 10-iter timing).

Usage:
    python tools/compute_flops.py --cfg <yaml> [--batch 8 --persons 7]
    python tools/compute_flops.py --preset coco_w48  # no YAML needed
    python tools/compute_flops.py --cfg <yaml> --dataset  # paper protocol:
        first 100 val images, per-person GFLOPs (reference
        compute_flops.py:109-167)
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
    p.add_argument("--dataset", action="store_true",
                   help="average over the first N val images (paper protocol)")
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def dataset_protocol(cfg, model, num_samples: int, iters: int):
    """Reference protocol (``compute_flops.py:109-167``): first N val
    images, mean GFLOPs per image and per person, wall-clock FPS.

    Static-shape note: persons are bucketed to a few static widths, so the
    FLOPs counted are the FLOPs this framework actually spends (padded
    persons included); per-person numbers divide by REAL persons.
    """
    import jax
    import numpy as np

    from i2rnet_tpu.registry import get_dataset_class

    ds_cls = get_dataset_class(cfg.DATASET.DATASET)
    ds = ds_cls(cfg, cfg.DATASET.ROOT, cfg.DATASET.TEST_SET, is_train=False)

    compiled_by_bucket, flops_by_bucket, time_by_bucket = {}, {}, {}
    total_flops = total_persons = total_time = n_images = 0

    for items, nb in ds.eval_batches(1):
        if n_images >= num_samples:
            break
        raw, _meta = ds.make_raw_batch(items, nb)
        batch = ds.device_batch(raw)
        n_real = int(np.asarray(raw["person_valid"]).sum())
        if nb not in compiled_by_bucket:
            def fwd(im, pm, v):
                return model.apply(variables, im, pm, v, train=False)["multi"]
            variables = jax.jit(lambda b=batch: model.init(
                jax.random.PRNGKey(0), b["images"], b["pos_masks"],
                b["person_valid"], train=False))()
            compiled = jax.jit(fwd).lower(
                batch["images"], batch["pos_masks"], batch["person_valid"]
            ).compile()
            cost = compiled.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            compiled_by_bucket[nb] = compiled
            flops_by_bucket[nb] = float(cost.get("flops", 0.0))
            compiled(batch["images"], batch["pos_masks"],
                     batch["person_valid"]).block_until_ready()  # warmup
            t0 = time.perf_counter()
            for _ in range(iters):
                out = compiled(batch["images"], batch["pos_masks"],
                               batch["person_valid"])
            out.block_until_ready()
            time_by_bucket[nb] = (time.perf_counter() - t0) / iters
        total_flops += flops_by_bucket[nb]
        total_time += time_by_bucket[nb]
        total_persons += n_real
        n_images += 1

    print(json.dumps({
        "protocol": f"first {n_images} val images "
                    "(reference compute_flops.py:109-167)",
        "model": cfg.MODEL.NAME,
        "dataset": cfg.DATASET.DATASET,
        "gflops_per_image_mean": round(total_flops / max(n_images, 1) / 1e9, 3),
        "gflops_per_person": round(total_flops / max(total_persons, 1) / 1e9, 3),
        "persons_total": int(total_persons),
        "fps_images": round(n_images / max(total_time, 1e-9), 2),
        "persons_per_sec": round(total_persons / max(total_time, 1e-9), 1),
    }, indent=2))


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
    if args.dataset:
        dataset_protocol(cfg, model, args.num_samples, args.iters)
        return
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
