#!/usr/bin/env python
"""A/B the single-pass whole-block eval kernel (TPU.FUSED_BLOCK_EVAL_ONEPASS).

Forward-only HRFormer-B interformer eval at the benchmark geometry, timed
with the dispatch-immune method (all iterations inside ONE jitted
fori_loop with a scalar carry, wall clock pinned by fetching real output
bytes — see docs/perf/roofline_r03.md "timing traps").

    python tools/bench_eval_onepass.py onepass
    python tools/bench_eval_onepass.py twokernel

Run both in the same session and compare — absolute step times drift
between tunnel sessions, so only same-session pairs are comparable.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["onepass", "twokernel"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--persons", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from i2rnet_tpu.presets import hrt_interformer
    from i2rnet_tpu.registry import get_model_builder

    cfg = hrt_interformer("coco").clone()
    cfg.TPU.FUSED_BLOCK_EVAL = True
    cfg.TPU.FUSED_BLOCK_EVAL_ONEPASS = args.mode == "onepass"
    cfg = cfg.freeze()
    b, n, k = args.batch, args.persons, args.iters
    w, h = cfg.MODEL.IMAGE_SIZE
    rng = np.random.RandomState(0)
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    images = jax.device_put(rng.rand(b, n, h, w, 3).astype(np.float32))
    pos = jax.device_put((rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32))
    valid = jax.device_put(np.ones((b, n), bool))
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), images[:1, :2], pos[:1, :2], valid[:1, :2],
        train=False))()

    @jax.jit
    def bench(im, pm, v):
        def body(i, carry):
            # carry feeds back into the input so the loop body cannot be
            # hoisted as loop-invariant
            out = model.apply(variables, im + carry * 1e-20, pm, v,
                              train=False)["multi"]
            return carry + jnp.mean(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, 0.0)

    print(f"[{args.mode}] compiling...", flush=True)
    _ = np.asarray(bench(images, pos, valid))  # pin: fetch real bytes
    print(f"[{args.mode}] compiled; timing...", flush=True)
    t0 = time.perf_counter()
    _ = np.asarray(bench(images, pos, valid))
    dt = time.perf_counter() - t0
    print(f"{args.mode}: {dt / k * 1000:.2f} ms/iter, "
          f"{b * n * k / dt:.1f} persons/s", flush=True)


if __name__ == "__main__":
    main()
