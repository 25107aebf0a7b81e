"""Horizontal-flip utilities for flip-test and train-time augmentation.

On-device equivalents of reference ``lib/utils/transforms.py:16-47``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _flip_perm(num_joints: int, matched_parts: Sequence[Tuple[int, int]]) -> np.ndarray:
    perm = np.arange(num_joints)
    for a, b in matched_parts:
        perm[a], perm[b] = perm[b], perm[a]
    return perm


def flip_back(output_flipped, matched_parts):
    """Un-flip heatmaps predicted on a mirrored input.

    Matches reference ``transforms.py:16-30``: reverse the width axis, then
    swap left/right channel pairs. Accepts [..., K, H, W].
    """
    output_flipped = jnp.asarray(output_flipped)
    k = output_flipped.shape[-3]
    out = output_flipped[..., ::-1]
    perm = _flip_perm(k, matched_parts)
    return jnp.take(out, jnp.asarray(perm), axis=-3)


def fliplr_joints(joints, joints_vis, width, matched_parts):
    """Flip joint coords horizontally. Matches reference ``transforms.py:33-47``.

    joints [..., K, D>=2], joints_vis [..., K, V]. Returns (joints*vis, vis).
    """
    joints = jnp.asarray(joints, jnp.float32)
    joints_vis = jnp.asarray(joints_vis, jnp.float32)
    k = joints.shape[-2]
    flipped = joints.at[..., 0].set(width - joints[..., 0] - 1)
    perm = jnp.asarray(_flip_perm(k, matched_parts))
    flipped = jnp.take(flipped, perm, axis=-2)
    vis = jnp.take(joints_vis, perm, axis=-2)
    return flipped * vis, vis
