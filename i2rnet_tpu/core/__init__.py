from i2rnet_tpu.core.loss import joints_mse_loss, joints_ohkm_mse_loss  # noqa: F401
