"""On-device batched preprocessing.

The TPU-first replacement for the reference's CPU/cv2 per-person hot path
(``lib/dataset/JointsDataset.py:207-357``): the host supplies raw padded
images + tiny affine/joint metadata; ONE jitted function does, on device:

* per-person affine crop (bilinear, zero border) of the shared image
  — replaces ``cv2.warpAffine`` per person (:299-303),
* optional horizontal pre-flip (whole-image flip augmentation, :245-249),
* ImageNet normalization (ToTensor + Normalize in the reference tools),
* analytic box-mask rendering for the position-embedding input — replaces
  rasterize + ``rotate_bound`` + ``cv2.resize`` (:323-325): the mask value at
  an output pixel is an inside-the-rotated-box test of its inverse-mapped
  source coordinate,
* Gaussian target rendering (ops.target).

Everything is static-shape [B, N, ...] with a validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from i2rnet_tpu.ops.target import generate_targets
from i2rnet_tpu.ops.transforms import bilinear_sample, invert_affine

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _crop_one(image, trans, out_w: int, out_h: int):
    """image [H,W,C] float; trans [2,3] src->dst. Returns [out_h,out_w,C]."""
    inv = invert_affine(trans)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv[0, 0] * gx + inv[0, 1] * gy + inv[0, 2]
    sy = inv[1, 0] * gx + inv[1, 1] * gy + inv[1, 2]
    return bilinear_sample(image, sx, sy)


def _interp_weights(src_coords, src_size: int):
    """[out] float src coords -> [out, src] bilinear weight rows.

    Row o holds ``max(0, 1 - |src_coords[o] - s|)`` over integer source
    positions s — exactly two nonzeros (floor/ceil taps) per in-range row,
    all-zero rows for coords outside [0, src_size-1] (matching the
    zero-outside convention of :func:`bilinear_sample`, including the
    half-open border taps: a coord of -0.5 weights source 0 by 0.5).
    """
    s = jnp.arange(src_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src_coords[:, None] - s[None, :]))


def _crop_one_axis_aligned(image, trans, out_w: int, out_h: int):
    """Axis-aligned (no-rotation) bilinear crop as two banded matmuls.

    Arbitrary 2-D gathers lower to scalar-ish HLO gather on TPU — measured
    599 ms for a [16, 7, 256, 192] crop batch from 512x640 canvases, 7x the
    full W48 flip-test forward. When the affine has zero off-diagonals
    (every eval/serving batch: rotation augmentation is train-only;
    whole-image flip and pre-scale fold into the DIAGONAL), the warp
    separates per axis and each 1-D interpolation is a one-hot-banded
    matmul that rides the MXU: ~0.1 GFLOP/person of dense f32 matmul
    replaces the gather (~3 ms/batch, ~200x). Numerics match
    :func:`_crop_one` to f32 roundoff (two-tap rows sum the same products).

    REQUIRES trans[0,1] == trans[1,0] == 0; callers assert on host.
    """
    inv = invert_affine(trans)
    h_in, w_in = image.shape[0], image.shape[1]
    xs = jnp.arange(out_w, dtype=jnp.float32) * inv[0, 0] + inv[0, 2]
    ys = jnp.arange(out_h, dtype=jnp.float32) * inv[1, 1] + inv[1, 2]
    wy = _interp_weights(ys, h_in)            # [out_h, H]
    wx = _interp_weights(xs, w_in)            # [out_w, W]
    rows = jnp.einsum("ys,swc->ywc", wy, image)
    return jnp.einsum("ywc,xw->yxc", rows, wx)


def _pos_mask_one(box, mask_affine, out_w: int, out_h: int):
    """Analytic single-box position mask with EXACT cv2 soft edges.

    The reference builds this mask by rasterizing the box into a full-size
    uint8 image and bilinearly resizing it to the model input
    (``JointsDataset.py:166-178, 323-325``) — so boundary output pixels get
    FRACTIONAL values. The closed form of "bilinear sample of a separable
    rectangle indicator" is a product of two 1-D ramps: an indicator that
    is 1 on integer pixels [a..b] interpolates to ``clip(min(s-(a-1),
    (b+1)-s), 0, 1)`` at source coordinate ``s``.

    box: [4] ramp bounds (lo_x, lo_y, hi_x, hi_y) built on host
    (``data/dataset.py``): lo = rasterized_edge - 1, hi = rasterized_edge
    + 1, saturated to ±1e9 when the rectangle touches the image border
    (cv2.resize clamps sample coordinates, so border-touching boxes have
    no ramp there). mask_affine: [2,3] source -> output (the composite of
    rotate_bound + resize, built on host). Output in [0,1]^[out_h,out_w,1].
    """
    inv = invert_affine(mask_affine)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv[0, 0] * gx + inv[0, 1] * gy + inv[0, 2]
    sy = inv[1, 0] * gx + inv[1, 1] * gy + inv[1, 2]
    fx = jnp.clip(jnp.minimum(sx - box[0], box[2] - sx), 0.0, 1.0)
    fy = jnp.clip(jnp.minimum(sy - box[1], box[3] - sy), 0.0, 1.0)
    return (fx * fy)[..., None]


def preprocess_inputs(images, crop_affines, boxes, mask_affines,
                      image_size: Tuple[int, int],
                      axis_aligned: bool = False):
    """The input half of :func:`device_preprocess` (no target rendering).

    images [B, maxH, maxW, 3] uint8 -> (crops [B, N, h, w, 3] normalized
    float32, pos_masks [B, N, h, w, 1]). Used directly by the serving
    export (``i2rnet_tpu/serving.py``), where no training targets exist.
    """
    w, h = int(image_size[0]), int(image_size[1])
    imgs = images.astype(jnp.float32) / 255.0
    crop_fn = _crop_one_axis_aligned if axis_aligned else _crop_one

    def per_image(img, affines, bxs, m_affines):
        crops = jax.vmap(lambda t: crop_fn(img, t, w, h))(affines)
        masks = jax.vmap(lambda b, t: _pos_mask_one(b, t, w, h))(bxs, m_affines)
        return crops, masks

    crops, pos_masks = jax.vmap(per_image)(imgs, crop_affines, boxes,
                                           mask_affines)
    crops = (crops - IMAGENET_MEAN) / IMAGENET_STD
    return crops, pos_masks


@partial(jax.jit, static_argnames=("image_size", "heatmap_size", "sigma",
                                   "joints_weight", "axis_aligned"))
def device_preprocess(raw, image_size: Tuple[int, int],
                      heatmap_size: Tuple[int, int], sigma: int,
                      joints_weight: Tuple[float, ...] = None,
                      axis_aligned: bool = False):
    """Raw host batch -> model batch, all on device.

    ``raw`` dict (host numpy):
      images:        [B, maxH, maxW, 3] uint8 (zero-padded raw images; any
                     flip augmentation and pre-scaling are already folded
                     into ``crop_affines`` on the host — the raster is never
                     flipped on device, which would drag padding into frame)
      crop_affines:  [B, N, 2, 3] raster->crop matrices
      boxes:         [B, N, 4] x1y1x2y2 (flip-adjusted working coords)
      mask_affines:  [B, N, 2, 3] working-coords->pos-mask-output matrices
      joints_hm:     [B, N, K, 2] joint coords in heatmap pixels
      joints_vis:    [B, N, K] visibility
      person_valid:  [B, N] bool

    Returns model batch dict: images (normalized float32 NHWC), pos_masks,
    target, target_weight, person_valid.
    """
    crops, pos_masks = preprocess_inputs(
        raw["images"], raw["crop_affines"], raw["boxes"],
        raw["mask_affines"], image_size, axis_aligned=axis_aligned)

    target, target_weight = generate_targets(
        raw["joints_hm"], raw["joints_vis"], heatmap_size, sigma)
    if joints_weight is not None:
        # LOSS.USE_DIFFERENT_JOINTS_WEIGHT: per-dataset limb up-weighting
        # (reference JointsDataset.py:432-433, tables at coco.py:106-112)
        target_weight = target_weight * jnp.asarray(joints_weight, jnp.float32)
    valid = raw["person_valid"]
    return {
        "images": crops,
        "pos_masks": pos_masks,
        "target": target * valid[:, :, None, None, None],
        "target_weight": target_weight * valid[:, :, None],
        "person_valid": valid,
    }


def np_rotate_bound_resize_affine(src_w: int, src_h: int, angle_deg: float,
                                  out_w: int, out_h: int) -> np.ndarray:
    """Host helper: the [2,3] source->output affine of
    ``rotate_bound(angle)`` followed by ``cv2.resize`` to (out_w, out_h)
    (reference ``JointsDataset.py:180-202,324-325``)."""
    cx, cy = src_w // 2, src_h // 2
    a = np.deg2rad(angle_deg)
    cos, sin = np.cos(a), np.sin(a)
    # cv2.getRotationMatrix2D uses alpha=cos, beta=sin with y-down sign flip
    m = np.array([[cos, sin, (1 - cos) * cx - sin * cy],
                  [-sin, cos, sin * cx + (1 - cos) * cy]], np.float32)
    n_w = int(src_h * abs(sin) + src_w * abs(cos))
    n_h = int(src_h * abs(cos) + src_w * abs(sin))
    m[0, 2] += n_w / 2 - cx
    m[1, 2] += n_h / 2 - cy
    # resize (nW, nH) -> (out_w, out_h): dst = src * out/n  (align-corners=False
    # pixel-center convention: u_dst = (u_src + 0.5) * out/n - 0.5)
    sx_r, sy_r = out_w / n_w, out_h / n_h
    r = np.array([[sx_r, 0, 0.5 * sx_r - 0.5],
                  [0, sy_r, 0.5 * sy_r - 0.5]], np.float32)
    # compose r ∘ m
    m3 = np.vstack([m, [0, 0, 1]]).astype(np.float32)
    return (r @ m3).astype(np.float32)
