"""Affine crop geometry + on-device bilinear warp.

Reimplements (without cv2, fully batched):

* ``get_affine_transform`` — reference ``lib/utils/transforms.py:58-90``
  (center/scale/rotation box -> output-patch 2x3 affine, pixel_std=200
  convention, third point at 90°).
* ``affine_transform`` / ``transform_preds`` — reference
  ``lib/utils/transforms.py:50-55,93-96``.
* ``affine_warp`` — the on-device replacement for ``cv2.warpAffine(...,
  INTER_LINEAR)`` (reference ``lib/dataset/JointsDataset.py:299-309``):
  bilinear sampling with zero border, vectorized over a batch of patches.
  This moves the per-person CPU warp hot loop onto the TPU.

All functions work under jit/vmap; the matrix constructors also accept numpy
inputs for host-side metadata work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rotate_2d(pt, rot_rad):
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    return jnp.stack([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs])


def _third_point(a, b):
    """Point completing a right angle: b + perp(a - b). Reference transforms.py:99-101."""
    direct = a - b
    return b + jnp.stack([-direct[1], direct[0]])


def _inv2x2(a):
    """Analytic [..., 2, 2] inverse (adjugate / det).

    Deliberately NOT ``jnp.linalg.inv``: LAPACK lowers to an FFI custom
    call that crashes when a ``jax.export``-serialized program is
    deserialized in a fresh process (jax 0.9.0; bisected in round 3) —
    and a closed form beats a getrf kernel launch for 2x2 anyway.
    """
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    adj = jnp.stack([
        jnp.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1),
        jnp.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def _solve_affine(src, dst):
    """Exact 3-point affine solve, replacing cv2.getAffineTransform.

    src, dst: [3, 2]. Returns [2, 3] matrix T with dst_i = T @ [src_i, 1].
    Closed form (no LAPACK — see :func:`_inv2x2`): the linear part A
    satisfies A [src0-src2, src1-src2] = [dst0-dst2, dst1-dst2].
    """
    s = jnp.stack([src[0] - src[2], src[1] - src[2]], axis=1)  # [2,2] cols
    d = jnp.stack([dst[0] - dst[2], dst[1] - dst[2]], axis=1)
    a_mat = d @ _inv2x2(s)
    t = dst[2] - a_mat @ src[2]
    return jnp.concatenate([a_mat, t[:, None]], axis=1)  # [2,3]


def get_affine_transform(center, scale, rot, output_size, shift=(0.0, 0.0), inv=False):
    """Build the crop affine matrix. Matches reference ``transforms.py:58-90``.

    Args:
      center: [2] box center in source-image pixels.
      scale: [2] box scale (pixels / 200, the pixel_std convention).
      rot: rotation in degrees.
      output_size: (w, h) of the destination patch — static python ints.
      inv: if True return the dst->src matrix.

    Returns [2, 3] float32 affine matrix.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == 0:
        scale = jnp.stack([scale, scale])
    shift = jnp.asarray(shift, jnp.float32)

    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w = float(output_size[0])
    dst_h = float(output_size[1])

    rot_rad = jnp.pi * jnp.asarray(rot, jnp.float32) / 180.0
    src_dir = _rotate_2d(jnp.stack([jnp.float32(0.0), (src_w - 1) * -0.5]), rot_rad)
    dst_dir = jnp.array([0.0, (dst_w - 1) * -0.5], jnp.float32)

    src0 = center + scale_tmp * shift
    src1 = center + src_dir + scale_tmp * shift
    src2 = _third_point(src0, src1)
    dst0 = jnp.array([(dst_w - 1) * 0.5, (dst_h - 1) * 0.5], jnp.float32)
    dst1 = dst0 + dst_dir
    dst2 = _third_point(dst0, dst1)

    src = jnp.stack([src0, src1, src2])
    dst = jnp.stack([dst0, dst1, dst2])
    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def invert_affine(t):
    """Invert a [..., 2, 3] affine matrix."""
    t = jnp.asarray(t)
    a = t[..., :2, :2]
    b = t[..., :2, 2]
    a_inv = _inv2x2(a)  # analytic — keeps exports LAPACK-free
    b_inv = -jnp.einsum("...ij,...j->...i", a_inv, b)
    return jnp.concatenate([a_inv, b_inv[..., None]], axis=-1)


def affine_transform(pts, t):
    """Apply [2,3] (or batched [...,2,3]) affine to points [..., 2]."""
    pts = jnp.asarray(pts, jnp.float32)
    return jnp.einsum("...ij,...j->...i", t[..., :2, :2], pts) + t[..., :2, 2]


def transform_preds(coords, center, scale, output_size):
    """Map heatmap coords back to source-image pixels.

    Matches reference ``transforms.py:50-55``: inverse affine of the
    (center, scale, rot=0) crop. coords [..., K, 2]; center/scale [..., 2];
    output_size (w, h) static.
    """
    t = get_affine_transform(center, scale, 0.0, output_size, inv=True)
    return affine_transform(coords, t)


# batched over leading axis: centers [P,2], scales [P,2] -> [P,2,3]
get_affine_transform_batch = jax.vmap(
    lambda c, s, r, out_w, out_h, inv: get_affine_transform(c, s, r, (out_w, out_h), inv=inv),
    in_axes=(0, 0, 0, None, None, None),
)


def transform_preds_batch(coords, centers, scales, output_size):
    """coords [P,K,2], centers/scales [P,2] -> [P,K,2] source-image coords."""
    def one(c, ctr, scl):
        return transform_preds(c, ctr, scl, output_size)
    return jax.vmap(one)(coords, centers, scales)


def affine_warp(image, trans, output_size):
    """Bilinear affine warp of one image, zero border.

    ``trans`` is the src->dst matrix (as from :func:`get_affine_transform`);
    the warp inverts it internally like ``cv2.warpAffine``.

    Args:
      image: [H, W, C] float array.
      trans: [2, 3] affine.
      output_size: (w, h) static ints.

    Returns [h, w, C].
    """
    out_w, out_h = int(output_size[0]), int(output_size[1])
    inv = invert_affine(trans)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # [h, w]
    src_x = inv[0, 0] * grid_x + inv[0, 1] * grid_y + inv[0, 2]
    src_y = inv[1, 0] * grid_x + inv[1, 1] * grid_y + inv[1, 2]
    return bilinear_sample(image, src_x, src_y)


def bilinear_sample(image, src_x, src_y):
    """Sample image [H,W,C] at float coords (zero outside), coords [h,w]."""
    h_in, w_in = image.shape[0], image.shape[1]
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    dx = src_x - x0
    dy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w_in) & (yi >= 0) & (yi < h_in)
        xi_c = jnp.clip(xi, 0, w_in - 1)
        yi_c = jnp.clip(yi, 0, h_in - 1)
        vals = image[yi_c, xi_c]  # [h, w, C]
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = dx[..., None]
    wy = dy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


# vmapped: images [P,H,W,C], trans [P,2,3] -> [P,h,w,C]
def affine_warp_batch(images, trans, output_size):
    return jax.vmap(lambda im, t: affine_warp(im, t, output_size))(images, trans)


def np_get_affine_transform(center, scale, rot, output_size, shift=(0.0, 0.0), inv=False):
    """Pure-numpy host version (for metadata paths that must not trace)."""
    center = np.asarray(center, np.float32)
    scale = np.asarray(scale, np.float32)
    if scale.ndim == 0:
        scale = np.array([scale, scale], np.float32)
    shift = np.asarray(shift, np.float32)

    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rot_rad = np.pi * rot / 180.0
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    sd = np.array([0, (src_w - 1) * -0.5], np.float32)
    src_dir = np.array([sd[0] * cs - sd[1] * sn, sd[0] * sn + sd[1] * cs], np.float32)
    dst_dir = np.array([0, (dst_w - 1) * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center + scale_tmp * shift
    src[1] = center + src_dir + scale_tmp * shift
    src[2] = third(src[0], src[1])
    dst[0] = [(dst_w - 1) * 0.5, (dst_h - 1) * 0.5]
    dst[1] = dst[0] + dst_dir
    dst[2] = third(dst[0], dst[1])

    if inv:
        src, dst = dst, src
    a = np.concatenate([src, np.ones((3, 1), np.float32)], axis=1)
    x = np.linalg.solve(a, dst)
    return x.T.astype(np.float32)
