#!/usr/bin/env python
"""Evaluation entry point (reference ``tools/test.py`` / ``tools/ddp_test.py``).

Loads TEST.MODEL_FILE (Orbax dir, or a torch .pth via the weight converter),
builds the GT-bbox or detector-bbox dataset, runs sharded inference with
flip-test + on-device decode, scores AP.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate I2R-Net (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--modelDir", default="", type=str)
    p.add_argument("--logDir", default="", type=str)
    p.add_argument("--dataDir", default="", type=str)
    p.add_argument("--max-batches", default=None, type=int)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    from i2rnet_tpu.config import load_config
    from i2rnet_tpu.core.validate import validate
    from i2rnet_tpu.registry import get_dataset_class, get_model_builder
    from i2rnet_tpu.utils.checkpoint import load_variables
    from i2rnet_tpu.utils.logging import create_logger, metric_table

    cfg = load_config(args.cfg, opts=args.opts or [], data_dir=args.dataDir,
                      model_dir=args.modelDir, log_dir=args.logDir)
    logger, output_dir, _ = create_logger(cfg, args.cfg, "valid")

    model = get_model_builder(cfg.MODEL.NAME)(cfg)

    model_file = cfg.TEST.MODEL_FILE or str(Path(output_dir) / "final_state")
    if model_file.endswith(".pth"):
        from i2rnet_tpu.convert.torch_import import convert_torch_checkpoint
        variables = convert_torch_checkpoint(model_file, cfg)
    else:
        variables = load_variables(model_file)
    logger.info("=> loaded %s", model_file)

    ds_cls = get_dataset_class(cfg.DATASET.DATASET)
    dataset = ds_cls(cfg, cfg.DATASET.ROOT, cfg.DATASET.TEST_SET, is_train=False)

    # shard eval over all available chips (TEST.BATCH_SIZE_PER_GPU per chip),
    # replacing the reference's single-device ddp_test rank-0 gather
    mesh = None
    if len(jax.devices()) > 1:
        from i2rnet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        logger.info("=> sharded eval over %d devices", len(jax.devices()))

    name_value, perf = validate(cfg, dataset, model, variables, output_dir,
                                max_batches=args.max_batches, mesh=mesh)
    logger.info("\n%s", metric_table(name_value, cfg.MODEL.NAME))
    logger.info("perf: %.4f", perf)


if __name__ == "__main__":
    main()
