#!/usr/bin/env python
"""Trace-based training-step benchmark (the honest methodology).

Wall-clock ``block_until_ready`` over the tunnel returns EARLY for donated
outputs and for scalars produced mid-program (see docs/perf/hrformer_r02.md,
"tunnel timing trap"), so this tool times train steps from ``jax.profiler``
device execution events: it traces N steps and reports the median duration
of the ``jit_step`` executions.

Usage:
    python tools/bench_train.py --preset hrt [--batch 8 --persons 4]
        [--fix] [--frozen-eval] [--fused-train] [--steps 4]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()

PRESETS = {
    "w48": ("w48_pure_en6", 16, 7),
    "tph": ("tph_interformer", 16, 7),
    "hrt": ("hrt_interformer", 8, 4),
}


def jit_step_times_ms(trace_dir: str):
    """Median/mean duration of the traced jit_step device executions."""
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    pids = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev = {p for p, nm in pids.items() if "TPU" in nm}
    durs = [e["dur"] / 1000.0 for e in data["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") in dev
            and e.get("name", "").startswith("jit_step")]
    durs.sort()
    if not durs:
        raise RuntimeError("no jit_step device events in trace")
    return durs[len(durs) // 2], sum(durs) / len(durs), len(durs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="hrt")
    ap.add_argument("--batch", type=int)
    ap.add_argument("--persons", type=int)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--fix", action="store_true",
                    help="SINGLEFORMER_FIX (freeze the first stage)")
    ap.add_argument("--frozen-eval", action="store_true",
                    help="TPU.FROZEN_STAGE_EVAL_MODE")
    ap.add_argument("--fused-train", action="store_true",
                    help="TPU.FUSED_BLOCK_TRAIN")
    ap.add_argument("--fused-train-min-tokens", type=int,
                    help="TPU.MIN_FUSED_TRAIN_TOKENS (768 also fuses "
                         "branch1; each geometry adds 3 Mosaic instances)")
    ap.add_argument("--fused-train-max-blocks", type=int,
                    help="TPU.FUSED_TRAIN_MAX_BLOCKS (prefix cap on fused "
                         "blocks; plan B for compile-helper memory limits)")
    ap.add_argument("--no-flash-train", action="store_true",
                    help="disable TPU.FLASH_TRAIN_ATTENTION (unfused XLA "
                         "attention-dropout path)")
    ap.add_argument("--no-fused-ffn-train", action="store_true",
                    help="disable TPU.FUSED_FFN_TRAIN (unfused XLA FFN tail)")
    ap.add_argument("--einsum-attn", action="store_true",
                    help="TPU.WINDOW_ATTN_EINSUM (batch-dim dot_general "
                         "window attention; layout experiment)")
    ap.add_argument("--remat", choices=["layers", "dots", "full"],
                    help="TPU.REMAT rematerialization policy (HBM vs FLOPs)")
    ap.add_argument("--memstats", action="store_true",
                    help="report the compiled program's HBM footprint "
                         "(argument/output/temp bytes via memory_analysis)")
    ap.add_argument("--image-size", type=int, nargs=2, metavar=("W", "H"),
                    help="override the input geometry (hrt preset only), "
                         "e.g. --image-size 288 384 for the flagship "
                         "interformer_coco_hrt_288_p2_b4.yaml recipe")
    args = ap.parse_args()

    import jax
    import numpy as np

    from i2rnet_tpu import presets
    from i2rnet_tpu.core.pretrained import frozen_predicate_for_cfg
    from i2rnet_tpu.core.train import make_train_step
    from i2rnet_tpu.core.train_state import create_train_state, make_optimizer
    from i2rnet_tpu.registry import get_model_builder

    name, def_b, def_n = PRESETS[args.preset]
    b = args.batch or def_b
    n = args.persons or def_n
    if args.image_size and args.preset != "hrt":
        ap.error("--image-size is only wired for the hrt preset")
    preset_kwargs = (
        {"image_size": tuple(args.image_size)} if args.image_size else {})
    cfg = getattr(presets, name)("coco", **preset_kwargs).clone()
    if args.fix:
        cfg.MODEL.SINGLEFORMER_FIX = True
    if args.frozen_eval:
        cfg.TPU.FROZEN_STAGE_EVAL_MODE = True
    if args.fused_train:
        cfg.TPU.FUSED_BLOCK_TRAIN = True
    if args.fused_train_min_tokens is not None:
        cfg.TPU.MIN_FUSED_TRAIN_TOKENS = args.fused_train_min_tokens
    if args.fused_train_max_blocks is not None:
        cfg.TPU.FUSED_TRAIN_MAX_BLOCKS = args.fused_train_max_blocks
    if args.no_flash_train:
        cfg.TPU.FLASH_TRAIN_ATTENTION = False
    if args.no_fused_ffn_train:
        cfg.TPU.FUSED_FFN_TRAIN = False
    if args.einsum_attn:
        cfg.TPU.WINDOW_ATTN_EINSUM = True
    if args.remat:
        cfg.TPU.REMAT = args.remat
    cfg = cfg.freeze()

    k = cfg.MODEL.NUM_JOINTS
    w, h = cfg.MODEL.IMAGE_SIZE
    hw, hh = cfg.MODEL.HEATMAP_SIZE
    rng = np.random.RandomState(0)
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    batches = []
    for _ in range(2):
        batches.append(jax.tree_util.tree_map(jax.device_put, {
            "images": rng.rand(b, n, h, w, 3).astype(np.float32),
            "pos_masks": (rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32),
            "person_valid": np.ones((b, n), bool),
            "target": rng.rand(b, n, k, hh, hw).astype(np.float32),
            "target_weight": np.ones((b, n, k), np.float32),
        }))
    bt = batches[0]
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), bt["images"][:1, :2], bt["pos_masks"][:1, :2],
        bt["person_valid"][:1, :2], train=False))()
    tx, _ = make_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, variables, tx,
                               frozen_predicate=frozen_predicate_for_cfg(cfg))
    step = make_train_step(model, tx, loss_weights=cfg.MODEL.LOSS_WEIGHTS,
                           frozen_predicate=frozen_predicate_for_cfg(cfg),
                           remat=cfg.TPU.REMAT)

    mem = None
    if args.memstats:
        # AOT-compile the same program (persistent cache makes this cheap)
        # to read its HBM footprint; temp bytes is where remat pays off.
        ma = step.lower(state, batches[0],
                        jax.random.PRNGKey(0)).compile().memory_analysis()
        if ma is not None:
            mem = {k: int(getattr(ma, k, 0)) for k in
                   ("argument_size_in_bytes", "output_size_in_bytes",
                    "temp_size_in_bytes", "generated_code_size_in_bytes")}

    for i in range(3):
        state, m = step(state, batches[i % 2], jax.random.PRNGKey(i))
    _ = np.asarray(state.params["final_layer"]["bias"])

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(args.steps):
                state, m = step(state, batches[i % 2],
                                jax.random.PRNGKey(10 + i))
            _ = np.asarray(state.params["final_layer"]["bias"])
        med, mean, cnt = jit_step_times_ms(td)

    print(json.dumps({
        "metric": "train_step_ms",
        "value": round(med, 2),
        "unit": "ms/step",
        "detail": {
            "preset": args.preset, "batch": b, "persons": n,
            "image_size": list(cfg.MODEL.IMAGE_SIZE),
            "persons_per_sec": round(b * n / (med / 1000.0), 1),
            "mean_ms": round(mean, 2), "traced_steps": cnt,
            "singleformer_fix": args.fix,
            "frozen_stage_eval_mode": args.frozen_eval,
            "fused_block_train": args.fused_train,
            "fused_train_max_blocks": args.fused_train_max_blocks,
            "flash_train_attention": not args.no_flash_train,
            "fused_ffn_train": not args.no_fused_ffn_train,
            "remat": cfg.TPU.REMAT,
            **({"hbm_bytes": mem} if mem else {}),
        },
    }))


if __name__ == "__main__":
    main()
