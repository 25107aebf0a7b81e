#!/usr/bin/env python
"""Training entry point.

TPU-native counterpart of both reference trainers (``tools/train.py`` and
``tools/ddp_train.py``): there is no DataParallel/DDP split — one process
drives the whole device mesh; add hosts via ``jax.distributed`` (the
``--coordinator`` flags) and each host feeds its batch shard.

Usage:
    python tools/train.py --cfg experiments/coco/my_experiment.yaml [opts...]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()


def parse_args():
    p = argparse.ArgumentParser(description="Train I2R-Net (TPU)")
    p.add_argument("--cfg", required=True, help="experiment YAML (reference schema)")
    p.add_argument("--modelDir", default="", type=str)
    p.add_argument("--logDir", default="", type=str)
    p.add_argument("--dataDir", default="", type=str)
    p.add_argument("--seed", default=None, type=int)
    p.add_argument("--coordinator", default="", type=str,
                   help="jax.distributed coordinator address for multi-host")
    p.add_argument("--num-processes", default=1, type=int)
    p.add_argument("--process-id", default=0, type=int)
    p.add_argument("--max-epochs", default=None, type=int)
    p.add_argument("--max-steps-per-epoch", default=None, type=int)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    if args.coordinator:
        import jax
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)

    from i2rnet_tpu.config import load_config
    from i2rnet_tpu.core.trainer import train_loop
    from i2rnet_tpu.utils.logging import create_logger

    cfg = load_config(args.cfg, opts=args.opts or [], data_dir=args.dataDir,
                      model_dir=args.modelDir, log_dir=args.logDir)
    if args.seed is not None:
        cfg.defrost()
        cfg.SEED = args.seed
        cfg.freeze()

    logger, output_dir, tb_dir = create_logger(cfg, args.cfg, "train")
    logger.info("config: %s", cfg)
    train_loop(cfg, output_dir, tb_log_dir=tb_dir, max_epochs=args.max_epochs,
               max_steps_per_epoch=args.max_steps_per_epoch)


if __name__ == "__main__":
    main()
