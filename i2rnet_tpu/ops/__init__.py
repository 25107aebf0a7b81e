"""Numeric kernels: batched on-device equivalents of the reference's numpy/cv2 paths.

Every op in this package is pure JAX (CPU-testable, TPU-fast) and vectorized
over the static person/batch axes; none contain data-dependent Python control
flow. Parity targets cite the reference implementation.
"""

from i2rnet_tpu.ops.transforms import (  # noqa: F401
    get_affine_transform,
    affine_transform,
    transform_preds,
    invert_affine,
    affine_warp,
)
from i2rnet_tpu.ops.target import generate_targets  # noqa: F401
from i2rnet_tpu.ops.flip import flip_back, fliplr_joints  # noqa: F401
from i2rnet_tpu.ops.decode import get_max_preds, gaussian_blur, taylor_refine, get_final_preds  # noqa: F401
from i2rnet_tpu.ops.nms import oks_iou_matrix, oks_nms, soft_oks_nms, box_nms  # noqa: F401
from i2rnet_tpu.ops.accuracy import pck_accuracy  # noqa: F401
