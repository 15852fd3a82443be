"""End-to-end training: the real CLI main() on the hermetic fixtures —
2 optimizer steps on CPU, checkpoint save, and a short sample afterwards.
(The reference only documents this flow manually via torchrun —
SURVEY.md §4; here it runs in CI.)"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
YAML = os.path.join(HERE, "test_files", "tiny_train.yaml")
INDEX = os.path.join(HERE, "test_files", "sample_training_0.tsv")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from ml_mdm_tpu.config import get_arguments
    from ml_mdm_tpu.clis import train_parallel

    out = tmp_path_factory.mktemp("train_out")
    args = get_arguments(
        args=[
            "--config_path", YAML,
            "--file-list", INDEX,
            "--output-dir", str(out),
            "--save-freq", "2",
        ],
        mode="trainer",
    )
    os.chdir(REPO)  # vocab paths in the YAML are repo-relative
    state = train_parallel.main(args)
    return args, state, out


def test_train_two_steps(trained):
    args, state, out = trained
    assert int(state.step) == 2


def test_checkpoints_written(trained):
    args, state, out = trained
    files = os.listdir(out)
    assert "vis_model_000002.pth" in files
    assert "vis_model_noema_000002.pth" in files
    assert any(f.startswith("train_state_") for f in files)


def test_pth_checkpoint_reloads(trained):
    """Saved .pth reloads through the converter (non-strict both ways)."""
    from ml_mdm_tpu.utils import checkpoint as ckpt

    args, state, out = trained
    params, other = ckpt.load_vision_model(
        os.path.join(out, "vis_model_000002.pth"),
        jax.device_get(state.ema_params),
    )
    assert other["batch_num"] == 2
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(jax.device_get(state.ema_params))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_sample_after_training(trained):
    from ml_mdm_tpu.config import get_model, get_pipeline
    from ml_mdm_tpu.language_models import factory

    args, state, out = trained
    tokenizer, lm = factory.create_lm(args)
    sample_tokens = np.asarray(
        [[4, 5, tokenizer.eos] + [tokenizer.pad] * 5], dtype=np.int64
    )
    lm_outputs, lm_mask = lm({"tokens": sample_tokens}, tokenizer)
    pipeline = get_pipeline(args.model)(
        get_model(args.model)(3, 3, args.unet_config), args.diffusion_config
    )
    key = jax.random.PRNGKey(0)
    out_img = pipeline.sample(
        state.ema_params,
        1,
        {"lm_outputs": lm_outputs, "lm_mask": lm_mask},
        16,
        key,
        num_inference_steps=4,
        resample_steps=True,
        ddim_eta=0.0,
    )
    assert out_img.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out_img).all())
    assert bool((jnp.abs(out_img) <= 1.0).all())
