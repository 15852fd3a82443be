"""Demo CLI headless logic: setup_models + generate() with CFG and the
streaming path on the tiny hermetic config (the reference exercises this
surface only interactively through Gradio)."""
import os

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
YAML = os.path.join(HERE, "test_files", "tiny_train.yaml")


@pytest.fixture(scope="module")
def models():
    from ml_mdm_tpu.config import get_arguments
    from ml_mdm_tpu.clis import generate_sample as gs

    os.chdir(REPO)
    args = get_arguments(args=["--config_path", YAML], mode="demo")
    return gs.setup_models(args)


def test_generate_final_grid(models):
    from ml_mdm_tpu.clis.generate_sample import generate

    grid, info = generate(
        models,
        "a bird on a branch",
        negative_prompt="low quality",
        batch_size=2,
        guidance_scale=2.0,
        num_inference_steps=4,
        seed=3,
    )
    assert grid.ndim == 3 and grid.shape[-1] == 3
    assert np.isfinite(grid).all()
    assert grid.min() >= -1.0 and grid.max() <= 1.0
    assert info["steps"] == 4 and len(info["gammas"]) > 0


def test_generate_stream_yields_steps(models):
    from ml_mdm_tpu.clis.generate_sample import generate

    steps = list(
        generate(
            models,
            "a cat",
            batch_size=1,
            guidance_scale=1.0,
            num_inference_steps=3,
            stream=True,
        )
    )
    assert len(steps) == 3
    for grid, info in steps:
        assert np.isfinite(grid).all()
        assert "logsnr" in info
    # logSNR increases monotonically as t decreases toward 0
    snrs = [info["logsnr"] for _, info in steps]
    assert snrs[-1] > snrs[0]


def test_style_templates_apply(models):
    from ml_mdm_tpu.clis.generate_sample import STYLE_TEMPLATES

    assert "{prompt}" in STYLE_TEMPLATES["photo"]
    assert STYLE_TEMPLATES["photo"].format(prompt="x").startswith(
        "a photograph of x"
    )
