"""Heatmap MSE losses under static person masking.

Masked equivalents of reference ``lib/core/loss.py:15-86``. The reference
computes, per joint, ``0.5 * MSELoss(mean)(pred*w, gt*w)`` over the
``[sum(length), H*W]`` rows then averages over joints. With static
``[B, N_max]`` batches the row count becomes the number of *valid* persons;
padded persons contribute exactly zero to both numerator and denominator —
bit-matching the ragged computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def joints_mse_loss(output, target, target_weight=None, person_valid=None):
    """Joints MSE loss.

    Args:
      output, target: [B, N, K, H, W] (or any leading dims + [K, H, W]).
      target_weight: [B, N, K] per-joint weights, or None.
      person_valid: [B, N] bool mask (True = real person).

    Returns scalar loss. Matches reference ``loss.py:21-41``:
    ``mean_j 0.5 * mean_{valid persons, pixels} (pred_j*w - gt_j*w)^2``.
    """
    k = output.shape[-3]
    hw = output.shape[-2] * output.shape[-1]
    lead = output.shape[:-3]

    pred = output.reshape(lead + (k, hw))
    gt = target.reshape(lead + (k, hw))
    if target_weight is not None:
        pred = pred * target_weight[..., None]
        gt = gt * target_weight[..., None]

    sq = (pred - gt) ** 2  # [..., K, HW]
    if person_valid is not None:
        mask = person_valid[..., None, None].astype(sq.dtype)
        sq = sq * mask
        n_rows = jnp.sum(person_valid)
    else:
        n_rows = 1
        for d in lead:
            n_rows *= d
        n_rows = jnp.asarray(n_rows, sq.dtype)

    lead_axes = tuple(range(len(lead)))
    per_joint = jnp.sum(sq, axis=lead_axes + (-1,)) / jnp.maximum(n_rows * hw, 1)  # [K]
    return 0.5 * jnp.mean(per_joint)


def joints_ohkm_mse_loss(output, target, target_weight=None, person_valid=None, topk=8):
    """Online hard-keypoint-mining MSE (reference ``loss.py:44-86``).

    Per sample: per-joint mean-squared error, keep the top-k hardest joints,
    average. Padded persons are excluded from the sample average.
    """
    k = output.shape[-3]
    hw = output.shape[-2] * output.shape[-1]
    lead = output.shape[:-3]

    pred = output.reshape(lead + (k, hw))
    gt = target.reshape(lead + (k, hw))
    if target_weight is not None:
        pred = pred * target_weight[..., None]
        gt = gt * target_weight[..., None]

    per_joint = 0.5 * jnp.mean((pred - gt) ** 2, axis=-1)  # [..., K]
    topv = jax.lax.top_k(per_joint, topk)[0]  # [..., topk]
    per_sample = jnp.sum(topv, axis=-1) / topk  # [...]

    if person_valid is not None:
        m = person_valid.astype(per_sample.dtype)
        return jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1)
    return jnp.mean(per_sample)
