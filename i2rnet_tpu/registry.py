"""Explicit registries for models and datasets.

Replaces the reference's string-``eval`` resolution
(``eval('models.'+cfg.MODEL.NAME+'.get_pose_net')`` at reference
``tools/train.py:102`` and ``eval('dataset.'+cfg.DATASET.DATASET)`` at
``tools/train.py:129``) with explicit, typo-checked dictionaries.
"""

from __future__ import annotations

from typing import Callable, Dict

MODEL_REGISTRY: Dict[str, Callable] = {}
DATASET_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


def register_dataset(name: str):
    def deco(cls):
        DATASET_REGISTRY[name] = cls
        return cls
    return deco


def get_model_builder(name: str) -> Callable:
    # import for side-effect registration
    import i2rnet_tpu.models  # noqa: F401
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]


def get_dataset_class(name: str) -> Callable:
    import i2rnet_tpu.data  # noqa: F401
    if name not in DATASET_REGISTRY:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(DATASET_REGISTRY)}")
    return DATASET_REGISTRY[name]
