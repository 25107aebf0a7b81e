from i2rnet_tpu.utils.logging import AverageMeter, create_logger  # noqa: F401
from i2rnet_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    latest_checkpoint,
    save_checkpoint,
)
