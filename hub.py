"""Pretrained model entry points (counterpart of reference ``hubconf.py``).

The reference exposes torch.hub loaders (``tpr_a4_256x192`` /
``tph_a4_256x192``, one of which is broken — missing ``transpose_r``); here
every released configuration gets a loader that builds the model and, given
a checkpoint (Orbax dir or reference ``.pth``), returns ``(model,
variables)`` ready for ``model.apply``.

    from hub import i2rnet_w48_pure
    model, variables = i2rnet_w48_pure("coco", checkpoint="path/to/ckpt")
"""

from __future__ import annotations

from typing import Optional


def _load(cfg, checkpoint: Optional[str]):
    from i2rnet_tpu.registry import get_model_builder
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    variables = None
    if checkpoint:
        if checkpoint.endswith(".pth"):
            from i2rnet_tpu.convert.torch_import import convert_torch_checkpoint
            variables = convert_torch_checkpoint(checkpoint, cfg)
        else:
            from i2rnet_tpu.utils.checkpoint import load_variables
            variables = load_variables(checkpoint)
    return model, variables


def i2rnet_w48_pure(dataset: str = "coco", checkpoint: Optional[str] = None):
    """Vanilla I²R-Net (HRNet-W48-S), 256x192."""
    from i2rnet_tpu.presets import w48_pure_en6
    return _load(w48_pure_en6(dataset), checkpoint)


def i2rnet_tph(dataset: str = "coco", checkpoint: Optional[str] = None,
               max_patch: int = 4):
    """I²R-Net with TransPose-H first stage, 256x192."""
    from i2rnet_tpu.presets import tph_interformer
    return _load(tph_interformer(dataset, max_patch), checkpoint)


def transpose_h(dataset: str = "coco", checkpoint: Optional[str] = None):
    """Standalone TransPose-H single-person model."""
    from i2rnet_tpu.presets import tph_interformer
    cfg = tph_interformer(dataset).clone()
    cfg.MODEL.NAME = "transpose_h"
    return _load(cfg.freeze(), checkpoint)
