"""Logging / metering utilities.

Mirrors reference ``lib/utils/utils.py:24-83``: rank-aware file+console
logger named ``GT_{use_gt}_{phase}_{cfg}_{timestamp}.log`` under
``LOG_DIR``; output dir layout ``OUTPUT_DIR/{dataset}/{model}/{cfg_name}``.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path


def create_logger(cfg, cfg_name: str, phase: str = "train", rank: int = 0):
    """Returns (logger, final_output_dir, tb_log_dir)."""
    root_output = Path(cfg.OUTPUT_DIR or "output")
    dataset = cfg.DATASET.DATASET
    model = cfg.MODEL.NAME
    cfg_name = os.path.basename(cfg_name).split(".")[0]

    final_output_dir = root_output / dataset / model / cfg_name
    final_output_dir.mkdir(parents=True, exist_ok=True)

    time_str = time.strftime("%Y-%m-%d-%H-%M")
    log_file = f"GT_{cfg.TEST.USE_GT_BBOX}_{phase}_{cfg_name}_{time_str}.log"
    log_dir = Path(cfg.LOG_DIR or "log") / dataset / model
    log_dir.mkdir(parents=True, exist_ok=True)

    logger = logging.getLogger("i2rnet_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)-15s %(message)s")
    if rank == 0:
        fh = logging.FileHandler(log_dir / log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
        ch = logging.StreamHandler()
        ch.setFormatter(fmt)
        logger.addHandler(ch)

    tb_log_dir = log_dir / (cfg_name + "_" + time_str)
    return logger, str(final_output_dir), str(tb_log_dir)


class AverageMeter:
    """Running average (reference ``lib/core/function.py`` AverageMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0


def metric_table(name_values, model_name: str) -> str:
    """Pretty metric table (replaces pylsytable at reference
    ``lib/core/function.py:470-478``)."""
    names = list(name_values.keys())
    vals = [f"{v:.4f}" if isinstance(v, float) else str(v) for v in name_values.values()]
    widths = [max(len(n), len(v)) for n, v in zip(names, vals)]
    head = " | ".join(n.ljust(w) for n, w in zip(names, widths))
    row = " | ".join(v.ljust(w) for v, w in zip(vals, widths))
    sep = "-+-".join("-" * w for w in widths)
    return f"[{model_name}]\n{head}\n{sep}\n{row}"
