"""Train-time PCK@0.5 accuracy on heatmaps, on-device.

Vectorized equivalent of reference ``lib/core/evaluate.py:16-71``:
argmax-decode pred and GT heatmaps, normalize distances by (h/10, w/10),
count joints within 0.5, ignoring joints whose GT argmax coords are <= 1.
"""

from __future__ import annotations

import jax.numpy as jnp

from i2rnet_tpu.ops.decode import get_max_preds


def pck_accuracy(output, target, person_valid=None, thr=0.5):
    """PCK accuracy.

    Args:
      output, target: [..., K, H, W] heatmaps (any leading batch dims).
      person_valid: optional [...] bool mask over leading dims (padded persons
        excluded — the static-shape analog of the reference operating on only
        sum(length) rows).
      thr: distance threshold (0.5).

    Returns (avg_acc scalar, per_joint_acc [K], cnt_joints_with_data).
    """
    h, w = output.shape[-2], output.shape[-1]
    pred, _ = get_max_preds(output)    # [..., K, 2]
    gt, _ = get_max_preds(target)

    norm = jnp.asarray([h / 10.0, w / 10.0], jnp.float32)
    dists = jnp.linalg.norm((pred - gt) / norm, axis=-1)  # [..., K]

    has_data = (gt[..., 0] > 1) & (gt[..., 1] > 1)
    if person_valid is not None:
        has_data = has_data & person_valid[..., None]

    lead_axes = tuple(range(dists.ndim - 1))
    cnt = jnp.sum(has_data, axis=lead_axes)                      # [K]
    hit = jnp.sum((dists < thr) & has_data, axis=lead_axes)      # [K]
    per_joint = jnp.where(cnt > 0, hit / jnp.maximum(cnt, 1), -1.0)

    joint_has = per_joint >= 0
    n_joints = jnp.sum(joint_has)
    avg = jnp.where(n_joints > 0,
                    jnp.sum(jnp.where(joint_has, per_joint, 0.0)) / jnp.maximum(n_joints, 1),
                    0.0)
    return avg, per_joint, n_joints
