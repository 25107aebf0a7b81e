#!/usr/bin/env python
"""A/B the exported serving artifact against the in-process eval program.

The exported `.i2rx` path is the production-serving story
(``i2rnet_tpu/serving.py``); this tool proves it costs nothing vs the
in-process ``make_eval_step`` jit — same program, weights as constants —
and measures the full request path (uint8 canvas in, keypoints out, warp
included) that neither bench.py row times.

Prints one JSON line:
  {"tool": "bench_serving", "persons_per_sec": {"exported": A,
   "inprocess_serve": B}, ...}

Timing discipline (docs/perf/roofline_r03.md "timing traps"): warm every
program first, then wall-clock a run of in-order steps and pin the stop on
a real-bytes fetch of the LAST output — block_until_ready alone can return
early over the tunnel.

Usage: python tools/bench_serving.py [--batch 16] [--persons 7]
           [--iters 30] [--artifact out.i2rx (reuse an exported file)]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()

RAW_HW = (256, 320)


def _request_arrays(b, n, raw_hw, image_size, rng):
    """One synthetic request at the artifact's static shapes."""
    import numpy as np

    from i2rnet_tpu.serving import boxes_to_person_meta

    rh, rw = raw_hw
    imgs = rng.randint(0, 255, (b, rh, rw, 3)).astype(np.uint8)
    affs = np.zeros((b, n, 2, 3), np.float32)
    rects = np.zeros((b, n, 4), np.float32)
    valid = np.ones((b, n), bool)
    cent = np.zeros((b * n, 2), np.float32)
    scal = np.ones((b * n, 2), np.float32)
    for r in range(b):
        boxes = [[8.0 + 5 * i, 6.0 + 3 * i, 96.0, 180.0] for i in range(n)]
        c, s, a, rect = boxes_to_person_meta(boxes, image_size)
        affs[r], rects[r] = a, rect
        cent[r * n:(r + 1) * n], scal[r * n:(r + 1) * n] = c, s
    return imgs, affs, rects, affs.copy(), valid, cent, scal


def _time_calls(fn, args_sets, iters):
    import jax
    import numpy as np

    for a in args_sets:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    outs = [fn(*args_sets[i % len(args_sets)]) for i in range(iters)]
    jax.block_until_ready(outs)
    jax.tree_util.tree_map(np.asarray, outs[-1])  # pin on real bytes
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--persons", type=int, default=7)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--artifact", default=None,
                    help="reuse an existing .i2rx instead of exporting")
    args = ap.parse_args()

    import jax
    import numpy as np

    from i2rnet_tpu.presets import w48_pure_en6
    from i2rnet_tpu.registry import get_model_builder
    from i2rnet_tpu.serving import (export_predictor, load_predictor,
                                    make_serve_fn, save_artifact)

    b, n = args.batch, args.persons
    cfg = w48_pure_en6("coco")
    iw, ih = cfg.MODEL.IMAGE_SIZE
    platform = jax.default_backend()

    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 2, ih, iw, 3), np.float32),
        np.zeros((1, 2, ih, iw, 1), np.float32),
        np.ones((1, 2), bool), train=False))()

    if args.artifact and os.path.exists(args.artifact):
        pred = load_predictor(args.artifact)
        export_s = None
    else:
        t0 = time.perf_counter()
        payload, header = export_predictor(cfg, variables, b, n, RAW_HW,
                                           platforms=[platform])
        export_s = time.perf_counter() - t0
        if args.artifact:
            save_artifact(args.artifact, payload, header)
            pred = load_predictor(args.artifact)
        else:
            from jax import export as jax_export

            from i2rnet_tpu.serving import Predictor
            pred = Predictor(header, jax_export.deserialize(payload))

    rng = np.random.RandomState(0)
    sets = [tuple(map(jax.device_put,
                      _request_arrays(b, n, RAW_HW, (iw, ih), rng)))
            for _ in range(3)]

    dt_exp = _time_calls(pred.call_raw, sets, args.iters)

    # the identical program jitted in-process (weights traced as args)
    ds_flip = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
               [13, 14], [15, 16]]
    serve = jax.jit(lambda *a: make_serve_fn(cfg, model, ds_flip)(
        variables, *a))
    dt_inp = _time_calls(serve, sets, args.iters)

    persons = b * n * args.iters
    print(json.dumps({
        "tool": "bench_serving",
        "platform": platform,
        "batch": b, "persons_bucket": n, "iters": args.iters,
        "persons_per_sec": {
            "exported": round(persons / dt_exp, 1),
            "inprocess_serve": round(persons / dt_inp, 1),
        },
        "export_seconds": None if export_s is None else round(export_s, 1),
    }))


if __name__ == "__main__":
    main()
