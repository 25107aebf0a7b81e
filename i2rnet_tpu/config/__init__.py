from i2rnet_tpu.config.config import Config, default_config, load_config, update_config

__all__ = ["Config", "default_config", "load_config", "update_config"]
