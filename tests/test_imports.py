"""Import smoke tests for all modules (reference test_imports.py)."""
import importlib

import pytest

MODULES = [
    "ml_mdm_tpu",
    "ml_mdm_tpu.config",
    "ml_mdm_tpu.samplers",
    "ml_mdm_tpu.diffusion",
    "ml_mdm_tpu.trainer",
    "ml_mdm_tpu.lr_scaler",
    "ml_mdm_tpu.reader",
    "ml_mdm_tpu.distributed",
    "ml_mdm_tpu.helpers",
    "ml_mdm_tpu.generate_html",
    "ml_mdm_tpu.models",
    "ml_mdm_tpu.models.layers",
    "ml_mdm_tpu.models.unet",
    "ml_mdm_tpu.models.nested_unet",
    "ml_mdm_tpu.models.model_ema",
    "ml_mdm_tpu.ops",
    "ml_mdm_tpu.ops.attention",
    "ml_mdm_tpu.parallel",
    "ml_mdm_tpu.parallel.mesh",
    "ml_mdm_tpu.language_models.tokenizer",
    "ml_mdm_tpu.language_models.t5",
    "ml_mdm_tpu.language_models.factory",
    "ml_mdm_tpu.utils.torch_compat",
    "ml_mdm_tpu.utils.checkpoint",
    "ml_mdm_tpu.utils.simple_logger",
    "ml_mdm_tpu.clis.train_parallel",
    "ml_mdm_tpu.clis.generate_batch",
]


@pytest.mark.parametrize("name", MODULES)
def test_import(name):
    importlib.import_module(name)
