"""Benchmark: persons/sec/chip, flagship I²R-Net (vanilla, HRNet-W48-S) at
256x192 inference on the available accelerator.

Prints ONE JSON line:
  {"metric": "persons_per_sec_per_chip", "value": N, "unit": "persons/s",
   "vs_baseline": R}

Baseline anchor: the reference publishes no FPS numbers (SURVEY.md §6); its
FLOPs/FPS protocol is tools/compute_flops.py (10-iter warmup + 10-iter
timing). We anchor vs_baseline to an estimated 50 persons/s for the PyTorch
reference on its assumed single-GPU eval setup (TransPose-H reports ~45 FPS
on consumer GPUs; the vanilla I²R-Net is of comparable cost). The north-star
target is vs_baseline >= 5.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

REFERENCE_PERSONS_PER_SEC = 50.0  # documented estimate, see module docstring

# B=16 maximizes persons/sec on v5e (sweep: B=8 -> 2979/s, B=16 -> 4727/s,
# B=32 -> 3996/s)
BATCH_IMAGES = 16
MAX_PERSONS = 7
WARMUP_ITERS = 3
TIMED_ITERS = 10


def main():
    from i2rnet_tpu.presets import w48_pure_en6
    from i2rnet_tpu.registry import get_model_builder

    cfg = w48_pure_en6("coco")
    model = get_model_builder(cfg.MODEL.NAME)(cfg)

    rng = np.random.RandomState(0)
    w, h = cfg.MODEL.IMAGE_SIZE
    images = rng.rand(BATCH_IMAGES, MAX_PERSONS, h, w, 3).astype(np.float32)
    pos_masks = (rng.rand(BATCH_IMAGES, MAX_PERSONS, h, w, 1) > 0.5).astype(np.float32)
    valid = np.ones((BATCH_IMAGES, MAX_PERSONS), bool)

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images[:1, :2],
                           pos_masks[:1, :2], valid[:1, :2], train=False)
    )()

    @jax.jit
    def forward(images, pos_masks, valid):
        return model.apply(variables, images, pos_masks, valid, train=False)["multi"]

    images_d = jax.device_put(images)
    pos_d = jax.device_put(pos_masks)
    valid_d = jax.device_put(valid)

    for _ in range(WARMUP_ITERS):
        forward(images_d, pos_d, valid_d).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(TIMED_ITERS):
        out = forward(images_d, pos_d, valid_d)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    persons = BATCH_IMAGES * MAX_PERSONS * TIMED_ITERS
    pps = persons / dt
    print(json.dumps({
        "metric": "persons_per_sec_per_chip",
        "value": round(pps, 2),
        "unit": "persons/s",
        "vs_baseline": round(pps / REFERENCE_PERSONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
