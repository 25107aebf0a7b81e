"""Datasets. Importing registers all dataset classes."""

from i2rnet_tpu.data import coco  # noqa: F401
from i2rnet_tpu.data.coco import COCODataset  # noqa: F401
from i2rnet_tpu.data.dataset import PoseDataset  # noqa: F401
