"""Gaussian heatmap target rendering, batched on-device.

Replaces the per-joint Python loop in the reference
``lib/dataset/JointsDataset.py:394-450`` (``generate_target`` +
``adjust_target_weight``) with one closed-form grid evaluation over
``[..., K]`` joints — no loops, static shapes, runs under jit.

Semantics matched exactly:
* ``target_weight`` starts as ``joints_vis[:, 0]``; a joint whose 3*sigma
  Gaussian support falls fully outside the heatmap gets weight 0
  (int-truncated bounds test, reference ``JointsDataset.py:438-450``).
* The heatmap is ``exp(-((x-mu_x)^2+(y-mu_y)^2)/(2 sigma^2))`` over the full
  grid for joints with weight > 0.5, else zeros (reference
  ``JointsDataset.py:421-430``).
"""

from __future__ import annotations

import jax.numpy as jnp


def generate_targets(joints, joints_vis, heatmap_size, sigma):
    """Render Gaussian targets.

    Args:
      joints: [..., K, 2] joint coords in heatmap pixels (float).
      joints_vis: [..., K] visibility (0/1 float) — the reference's
        ``joints_vis[:, 0]`` column.
      heatmap_size: (w, h) static ints.
      sigma: Gaussian sigma (static).

    Returns:
      target: [..., K, h, w] float32 heatmaps.
      target_weight: [..., K] float32 weights.
    """
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)

    mu_x = joints[..., 0]
    mu_y = joints[..., 1]

    # reference bounds check with int truncation: ul=int(mu-3s), br=int(mu+3s+1)
    tmp = 3.0 * sigma
    ul_x = jnp.trunc(mu_x - tmp)
    ul_y = jnp.trunc(mu_y - tmp)
    br_x = jnp.trunc(mu_x + tmp + 1.0)
    br_y = jnp.trunc(mu_y + tmp + 1.0)
    out_of_bounds = (ul_x >= w) | (ul_y >= h) | (br_x < 0) | (br_y < 0)
    weight = jnp.where(out_of_bounds, 0.0, vis)

    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    # [..., K, h, w]
    gx = xs - mu_x[..., None]
    gy = ys - mu_y[..., None]
    g = jnp.exp(-(gx[..., None, :] ** 2 + gy[..., :, None] ** 2) / (2.0 * sigma**2))
    target = jnp.where((weight > 0.5)[..., None, None], g, 0.0)
    return target.astype(jnp.float32), weight.astype(jnp.float32)
