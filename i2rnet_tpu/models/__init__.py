"""Model zoo. Importing this package registers all model builders."""

from i2rnet_tpu.models import hrformer  # noqa: F401
from i2rnet_tpu.models import interformer  # noqa: F401
from i2rnet_tpu.models import interformer_e2e  # noqa: F401
from i2rnet_tpu.models.hrformer import HRFormer  # noqa: F401
from i2rnet_tpu.models import pure_multi  # noqa: F401
from i2rnet_tpu.models import transpose_h  # noqa: F401
from i2rnet_tpu.models.interformer import InterFormer  # noqa: F401
from i2rnet_tpu.models.pure_multi import PureMultiInterFormer  # noqa: F401
from i2rnet_tpu.models.transpose_h import TransPoseH  # noqa: F401
