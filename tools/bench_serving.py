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
import tempfile
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


def _latency_bench(pred, rates, duration_s, max_delay_ms, seed=0):
    """Poisson request mix through the MicroBatcher over a bucket-routed
    Predictor: per offered rate (requests/s), p50/p99/mean request latency
    and achieved throughput. Each request is ONE image with 1..n_max
    detector boxes (uniform), so routing exercises every person bucket.

    Latency is arrival -> future completion (queueing + coalescing delay +
    host assembly + device + host regroup), stamped by a done-callback —
    the number a serving SLO would be written against.
    """
    import numpy as np

    from i2rnet_tpu.serving import MicroBatcher

    rng = np.random.RandomState(seed)
    rh, rw = pred.header["raw_hw"]
    n_max = max(int(bk["n_bucket"]) for bk in pred.header.get(
        "buckets", [{"n_bucket": pred.header["n_bucket"]}]))
    pool = []
    for _ in range(32):
        img = rng.randint(0, 255, (rh, rw, 3)).astype(np.uint8)
        m = int(rng.randint(1, n_max + 1))
        boxes = [[float(rng.randint(0, rw // 2)),
                  float(rng.randint(0, rh // 2)), 96.0, 180.0]
                 for _ in range(m)]
        pool.append((img, boxes))

    out = {}
    for rate in rates:
        mb = MicroBatcher(pred, max_delay_ms=max_delay_ms)
        for i in range(4):  # warm the batcher + per-bucket programs
            mb.submit(*pool[i]).result()
        n_req = max(8, int(rate * duration_s))
        arrivals = np.cumsum(rng.exponential(1.0 / rate, size=n_req))
        records = []
        t0 = time.perf_counter()
        for i, at in enumerate(arrivals):
            now = time.perf_counter() - t0
            if at > now:
                time.sleep(at - now)
            rec = {"at": at, "persons": len(pool[i % len(pool)][1])}
            fut = mb.submit(*pool[i % len(pool)])
            fut.add_done_callback(
                lambda f, r=rec: r.__setitem__(
                    "done", time.perf_counter() - t0))
            records.append((fut, rec))
        for fut, _ in records:
            fut.result()
        mb.close()
        lat_ms = np.array([(r["done"] - r["at"]) * 1000.0
                           for _, r in records])
        t_end = max(r["done"] for _, r in records)
        persons = sum(r["persons"] for _, r in records)
        out[f"rate_{rate}"] = {
            "offered_req_per_s": rate,
            "requests": n_req,
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
            "mean_ms": round(float(lat_ms.mean()), 1),
            "achieved_req_per_s": round(n_req / t_end, 1),
            "achieved_persons_per_s": round(persons / t_end, 1),
        }
        print(f"# rate={rate}/s: p50={out[f'rate_{rate}']['p50_ms']}ms "
              f"p99={out[f'rate_{rate}']['p99_ms']}ms "
              f"achieved={out[f'rate_{rate}']['achieved_persons_per_s']} "
              "persons/s", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--persons", type=int, default=7)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--artifact", default=None,
                    help="reuse an existing .i2rx instead of exporting")
    ap.add_argument("--latency", action="store_true",
                    help="Poisson-mix MicroBatcher latency mode: export a "
                         "multi-bucket artifact and report p50/p99 per "
                         "offered rate (VERDICT r3 item 7)")
    ap.add_argument("--rates", type=float, nargs="*",
                    default=[20, 50, 100, 200],
                    help="offered request rates (req/s) for --latency")
    ap.add_argument("--duration", type=float, default=10.0,
                    help="seconds of offered load per rate (--latency)")
    ap.add_argument("--max-delay-ms", type=float, default=5.0,
                    help="MicroBatcher coalescing deadline (--latency)")
    ap.add_argument("--buckets", type=int, nargs="*", default=[2, 4, 7],
                    help="person buckets for the --latency artifact")
    ap.add_argument("--preset", choices=["w48", "tiny"], default="w48",
                    help="tiny = CPU-affordable smoke geometry")
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

    if args.latency:
        # VERDICT r3 item 7: multi-bucket artifact + MicroBatcher under a
        # Poisson mix -> p50/p99 latency + throughput per offered rate
        path = args.artifact or os.path.join(
            tempfile.gettempdir(), "bench_serving_latency.i2rx")
        if not os.path.exists(path):
            payload, header = export_predictor(
                cfg, variables, b, tuple(args.buckets), RAW_HW,
                platforms=[platform])
            save_artifact(path, payload, header)
        pred = load_predictor(path)
        pred.warmup()
        res = _latency_bench(pred, args.rates, args.duration,
                             args.max_delay_ms)
        print(json.dumps({
            "tool": "bench_serving", "mode": "latency",
            "platform": platform, "batch_images": pred.header["batch_images"],
            "buckets": [bk["n_bucket"] for bk in pred.header["buckets"]],
            "raw_hw": pred.header["raw_hw"],
            "max_delay_ms": args.max_delay_ms,
            "duration_s_per_rate": args.duration,
            "results": res,
        }))
        return

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
