from i2rnet_tpu.convert.torch_import import convert_torch_checkpoint  # noqa: F401
