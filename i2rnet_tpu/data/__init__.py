"""Datasets. Importing registers all dataset classes."""

from i2rnet_tpu.data import coco  # noqa: F401
from i2rnet_tpu.data import crowdpose  # noqa: F401
from i2rnet_tpu.data import mpii  # noqa: F401
from i2rnet_tpu.data import ochuman  # noqa: F401
from i2rnet_tpu.data.coco import COCODataset  # noqa: F401
from i2rnet_tpu.data.crowdpose import CROWDPOSEDataset  # noqa: F401
from i2rnet_tpu.data.dataset import PoseDataset  # noqa: F401
from i2rnet_tpu.data.mpii import MPIIDataset  # noqa: F401
from i2rnet_tpu.data.ochuman import CocoOCHumanDataset, OCHumanDataset  # noqa: F401
