"""Debug / demo visualization.

Counterparts of reference ``lib/utils/vis.py`` (debug grids of joints and
heatmaps, gated by DEBUG flags) and ``vis_demo.py`` (skeleton rendering from
a results JSON). cv2-based, host-side only — never in the compute path.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import cv2
import numpy as np

# COCO skeleton edges + per-limb colors (cf. reference vis_demo.py:30-54)
COCO_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]
_COLORS = [
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85), (255, 0, 0),
]


def draw_skeleton(image: np.ndarray, keypoints: np.ndarray,
                  skeleton: Optional[Sequence] = None,
                  conf_thresh: float = 0.2) -> np.ndarray:
    """Render one person's keypoints [K, 3] onto an image (BGR)."""
    img = image.copy()
    skeleton = skeleton if skeleton is not None else COCO_SKELETON
    k = len(keypoints)
    for j in range(k):
        x, y, c = keypoints[j]
        if c > conf_thresh:
            cv2.circle(img, (int(x), int(y)), 3, _COLORS[j % len(_COLORS)], -1)
    for ei, (a, b) in enumerate(skeleton):
        if a < k and b < k and keypoints[a, 2] > conf_thresh and keypoints[b, 2] > conf_thresh:
            cv2.line(img, (int(keypoints[a, 0]), int(keypoints[a, 1])),
                     (int(keypoints[b, 0]), int(keypoints[b, 1])),
                     _COLORS[ei % len(_COLORS)], 2)
    return img


def save_batch_image_with_joints(images, joints, joints_vis, file_name,
                                 nrow=8, padding=2):
    """Grid of crops with joints overlaid (reference vis.py:23-55).

    images [P, H, W, 3] float (normalized or 0-1); joints [P, K, 2];
    joints_vis [P, K].
    """
    imgs = np.asarray(images)
    imgs = imgs - imgs.min()
    imgs = (imgs / max(imgs.max(), 1e-6) * 255).astype(np.uint8)
    p, h, w = imgs.shape[:3]
    ncol = min(nrow, p)
    nrows = (p + ncol - 1) // ncol
    grid = np.zeros((nrows * (h + padding), ncol * (w + padding), 3), np.uint8)
    for i in range(p):
        r, c = divmod(i, ncol)
        img = cv2.cvtColor(imgs[i], cv2.COLOR_RGB2BGR)
        for j in range(joints.shape[1]):
            if joints_vis[i, j] > 0:
                cv2.circle(img, (int(joints[i, j, 0]), int(joints[i, j, 1])),
                           2, (255, 0, 0), 2)
        grid[r * (h + padding):r * (h + padding) + h,
             c * (w + padding):c * (w + padding) + w] = img
    cv2.imwrite(file_name, grid)


def save_batch_heatmaps(images, heatmaps, file_name, normalize=True):
    """Crop + per-joint heatmap strip (reference vis.py:100-162).

    images [P, H, W, 3]; heatmaps [P, K, h, w].
    """
    imgs = np.asarray(images)
    if normalize:
        imgs = imgs - imgs.min()
        imgs = imgs / max(imgs.max(), 1e-6)
    imgs = (imgs * 255).astype(np.uint8)
    hm = np.asarray(heatmaps)
    p, k, hh, hw = hm.shape
    grid = np.zeros((p * hh, (k + 1) * hw, 3), np.uint8)
    for i in range(p):
        resized = cv2.resize(cv2.cvtColor(imgs[i], cv2.COLOR_RGB2BGR), (hw, hh))
        grid[i * hh:(i + 1) * hh, :hw] = resized
        for j in range(k):
            m = hm[i, j]
            m = np.clip(m / max(m.max(), 1e-6) * 255, 0, 255).astype(np.uint8)
            colored = cv2.applyColorMap(m, cv2.COLORMAP_JET)
            blend = (colored * 0.7 + resized * 0.3).astype(np.uint8)
            grid[i * hh:(i + 1) * hh, (j + 1) * hw:(j + 2) * hw] = blend
    cv2.imwrite(file_name, grid)


def save_debug_images(cfg, batch, meta, target, heatmaps_pred, prefix):
    """DEBUG-flag-gated dump (reference vis.py:253-294)."""
    if not cfg.DEBUG.DEBUG:
        return
    imgs = np.asarray(batch["images"])
    b, n = imgs.shape[:2]
    flat = imgs.reshape(b * n, *imgs.shape[2:])
    joints = np.asarray(meta["joints"])[..., :2].reshape(b * n, -1, 2)
    vis = np.asarray(meta["joints_vis"])[..., 0].reshape(b * n, -1)
    if cfg.DEBUG.SAVE_BATCH_IMAGES_GT:
        save_batch_image_with_joints(flat, joints, vis, f"{prefix}_gt.jpg")
    if cfg.DEBUG.SAVE_HEATMAPS_GT:
        t = np.asarray(target).reshape(b * n, *np.asarray(target).shape[2:])
        save_batch_heatmaps(flat, t, f"{prefix}_hm_gt.jpg")
    if cfg.DEBUG.SAVE_HEATMAPS_PRED:
        hp = np.asarray(heatmaps_pred).reshape(b * n, *np.asarray(heatmaps_pred).shape[2:])
        save_batch_heatmaps(flat, hp, f"{prefix}_hm_pred.jpg")
