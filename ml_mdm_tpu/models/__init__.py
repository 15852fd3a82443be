from ml_mdm_tpu.models import layers, model_ema, nested_unet, unet  # noqa: F401
