"""Train state + optimizer/schedule factories.

Optimizer semantics match the reference: Adam with TRAIN.LR (weight decay is
*not* applied for adam — reference ``lib/utils/utils.py:85-101``), or SGD
with momentum/WD/nesterov; LR follows per-epoch CosineAnnealingLR from LR to
LR_END over END_EPOCH epochs (reference ``tools/ddp_train.py:217-218``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default=None)


def cosine_epoch_schedule(lr: float, lr_end: float, end_epoch: int, steps_per_epoch: int):
    """Per-epoch cosine annealing (torch CosineAnnealingLR stepped each epoch).

    lr(t) = lr_end + (lr - lr_end) * (1 + cos(pi * epoch / T)) / 2
    """
    def schedule(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), end_epoch)
        return lr_end + (lr - lr_end) * 0.5 * (1 + jnp.cos(jnp.pi * epoch / end_epoch))
    return schedule


def make_optimizer(cfg, steps_per_epoch: int):
    t = cfg.TRAIN
    sched = cosine_epoch_schedule(t.LR, t.LR_END, t.END_EPOCH, steps_per_epoch)
    if t.OPTIMIZER == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(t.WD),
            optax.sgd(sched, momentum=t.MOMENTUM, nesterov=t.NESTEROV),
        )
    elif t.OPTIMIZER == "adam":
        tx = optax.adam(sched)  # WD intentionally unused, matching reference
    else:
        raise ValueError(f"unknown optimizer {t.OPTIMIZER!r}")
    return tx, sched


def create_train_state(model, variables, tx, frozen_predicate=None):
    """Build TrainState; optionally freeze params matching a predicate
    (the jax analog of ``requires_grad_(False)``/``SINGLEFORMER_FIX``)."""
    params = variables["params"]
    if frozen_predicate is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            param_labels=jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen" if frozen_predicate(path) else "train", params),
        )
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )
