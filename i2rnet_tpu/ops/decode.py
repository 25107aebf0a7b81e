"""Heatmap decoding: argmax + DARK-style Taylor refinement, fully on-device.

Replaces the per-batch D2H copy + per-joint numpy/cv2 loops of the reference
``lib/core/inference.py:20-112`` (``get_max_preds``, ``gaussian_blur``,
``taylor``, ``get_final_preds``) with vectorized jnp over ``[P, K]``.

Numerics matched:
* argmax over the flattened heatmap; coords masked to 0 where maxval <= 0
  (reference ``inference.py:20-48``).
* Gaussian blur = zero-padded separable convolution with the
  ``cv2.getGaussianKernel(kernel, sigma=0)`` coefficients
  (sigma = 0.3*((k-1)*0.5 - 1) + 0.8), then rescaled so each map's max equals
  its pre-blur max (reference ``inference.py:73-87``).
* log after clamping at 1e-10, then one 2nd-order Taylor step using
  finite-difference gradient/Hessian, applied only at interior maxima with a
  non-singular Hessian (reference ``inference.py:51-70,90-101``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from i2rnet_tpu.ops.transforms import transform_preds_batch


def get_max_preds(heatmaps):
    """Argmax decode. heatmaps [..., K, H, W] -> (coords [..., K, 2] xy, maxvals [..., K, 1])."""
    h = heatmaps.shape[-2]
    w = heatmaps.shape[-1]
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (h * w,))
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1, keepdims=True)
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    coords = jnp.stack([x, y], axis=-1)
    coords = jnp.where(maxvals > 0.0, coords, 0.0)
    return coords, maxvals


#: cv2's hardcoded small-kernel table: getGaussianKernel(ksize, sigma<=0)
#: does NOT use the sigma formula for ksize <= 7 — it returns these fixed
#: binomial-ish coefficients (OpenCV smoothing.cpp small_gaussian_tab).
_CV2_SMALL_GAUSSIAN = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def _cv2_gaussian_kernel1d(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, 0) coefficients, bit-matched.

    cv2 does NOT use the sigma formula for every size: ksize <= 7 hits the
    hardcoded small-kernel table, and some larger sizes (e.g. 9) come out of
    its bit-exact fixed-point path. Ask cv2 itself when available; fall back
    to table + sigma formula (exact for the released BLUR_KERNEL=11)."""
    try:
        import cv2
        return cv2.getGaussianKernel(ksize, 0).ravel().astype(np.float32)
    except ImportError:
        pass
    if ksize in _CV2_SMALL_GAUSSIAN:
        return np.asarray(_CV2_SMALL_GAUSSIAN[ksize], np.float32)
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("kernel",))
def gaussian_blur(heatmaps, kernel: int = 11):
    """Zero-padded separable Gaussian blur + max renormalization.

    heatmaps [..., H, W]. Matches reference ``inference.py:73-87`` (which pads
    each map into a zero border of (kernel-1)//2 before cv2.GaussianBlur).
    """
    k1d = jnp.asarray(_cv2_gaussian_kernel1d(kernel))
    border = (kernel - 1) // 2
    orig_max = jnp.max(heatmaps, axis=(-2, -1), keepdims=True)

    lead = heatmaps.shape[:-2]
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    x = heatmaps.reshape((-1, 1, h, w))  # NCHW with C=1

    kh = k1d.reshape(1, 1, kernel, 1)
    kw = k1d.reshape(1, 1, 1, kernel)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(border, border), (0, 0)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (border, border)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = x.reshape(lead + (h, w))
    new_max = jnp.max(x, axis=(-2, -1), keepdims=True)
    return x * orig_max / jnp.maximum(new_max, 1e-20)


def taylor_refine(log_hm, coords):
    """One 2nd-order Taylor refinement step on log heatmaps.

    log_hm [..., H, W]; coords [..., 2] integer-valued argmax positions (xy).
    Matches reference ``inference.py:51-70``.
    """
    h = log_hm.shape[-2]
    w = log_hm.shape[-1]
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)

    def samp(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        flat = log_hm.reshape(log_hm.shape[:-2] + (h * w,))
        return jnp.take_along_axis(flat, (yy * w + xx)[..., None], axis=-1)[..., 0]

    dx = 0.5 * (samp(0, 1) - samp(0, -1))
    dy = 0.5 * (samp(1, 0) - samp(-1, 0))
    dxx = 0.25 * (samp(0, 2) - 2.0 * samp(0, 0) + samp(0, -2))
    dxy = 0.25 * (samp(1, 1) - samp(-1, 1) - samp(1, -1) + samp(-1, -1))
    dyy = 0.25 * (samp(2, 0) - 2.0 * samp(0, 0) + samp(-2, 0))

    det = dxx * dyy - dxy * dxy
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    # -H^{-1} @ [dx, dy]
    off_x = -(dyy * dx - dxy * dy) * inv_det
    off_y = -(-dxy * dx + dxx * dy) * inv_det

    interior = (px > 1) & (px < w - 2) & (py > 1) & (py < h - 2)
    valid = interior & (det != 0.0)
    offset = jnp.stack([off_x, off_y], axis=-1)
    return coords + jnp.where(valid[..., None], offset, 0.0)


@partial(jax.jit, static_argnames=("blur_kernel", "heatmap_size",
                                   "transform_back", "post_process"))
def get_final_preds(heatmaps, centers, scales, blur_kernel: int = 11,
                    heatmap_size=None, transform_back: bool = True,
                    post_process: bool = True):
    """Full decode: argmax -> [blur -> log -> Taylor] -> inverse affine.

    Args:
      heatmaps: [P, K, H, W] float32.
      centers, scales: [P, 2].
      blur_kernel: TEST.BLUR_KERNEL.
      heatmap_size: (w, h); defaults to the trailing dims of ``heatmaps``.
      transform_back: map to source-image coordinates.
      post_process: TEST.POST_PROCESS — gate the DARK blur+Taylor refinement
        (reference ``inference.py:102-109``); False = raw argmax decode.

    Returns (preds [P, K, 2], maxvals [P, K, 1]).
    Matches reference ``inference.py:90-112``.
    """
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    if heatmap_size is None:
        heatmap_size = (w, h)
    coords, maxvals = get_max_preds(heatmaps)
    if post_process:
        hm = gaussian_blur(heatmaps, blur_kernel)
        hm = jnp.log(jnp.maximum(hm, 1e-10))
        coords = taylor_refine(hm, coords)
    if transform_back:
        coords = transform_preds_batch(coords, centers, scales, heatmap_size)
    return coords, maxvals
