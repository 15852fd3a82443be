"""Matryoshka progressive-training recipe plumbing:
- initialize_inner_with_pretrained warm-starts the inner-UNet subtree
  from a separate checkpoint (reference nested_unet.py:78-93,147-152);
- --resume-from-ema picks the EMA weights when resuming (reference
  config.py:172-176 defines the flag; we give it real semantics for
  both .pth sibling files and Orbax train-state resume)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_mdm_tpu.config import (
    get_model,
    get_model_config_cls,
    get_pipeline,
    get_pipeline_config_cls,
)
from ml_mdm_tpu.models.layers import ResNetConfig
from ml_mdm_tpu.models.unet import UNetConfig
from ml_mdm_tpu.samplers import SamplerConfig
from ml_mdm_tpu.utils import checkpoint as ckpt

import ml_mdm_tpu.diffusion  # noqa: F401 (registry)
import ml_mdm_tpu.models.nested_unet  # noqa: F401

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
YAML = os.path.join(HERE, "test_files", "tiny_train.yaml")
INDEX = os.path.join(HERE, "test_files", "sample_training_0.tsv")

RC = ResNetConfig(num_groups_norm=8, dropout=0.0, use_attention_ffn=False)


def _nested_cfg():
    inner = UNetConfig(
        nesting=True, num_resnets_per_resolution="1,1",
        resolution_channels="16,32", attention_levels="1",
        num_attention_layers="1", conditioning_feature_dim=16,
        masked_cross_attention=0, micro_conditioning="scale:8",
        resnet_config=RC,
    )
    return get_model_config_cls("nested_unet")(
        inner_config=inner, num_resnets_per_resolution="1,1",
        resolution_channels="8,16", attention_levels="",
        num_attention_layers="0", conditioning_feature_dim=16,
        masked_cross_attention=0, temporal_dim=64,
        micro_conditioning="scale:16", resnet_config=RC,
    )


def _nested_params(cfg, seed):
    pipe = get_pipeline("nested_unet")(
        get_model("nested_unet")(3, 3, cfg),
        get_pipeline_config_cls("nested_unet")(
            sampler_config=SamplerConfig(num_diffusion_steps=20)
        ),
    )
    return pipe.init_params(
        jax.random.PRNGKey(seed), image_side=16, lm_dim=16, seq_len=4,
        batch=4,
    )


def _max_leaf_diff(a, b):
    diffs = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                           - y.astype(jnp.float32)))),
        a, b,
    )
    return max(jax.tree_util.tree_leaves(diffs))


def test_inner_warm_start_from_pth(tmp_path):
    """Inner subtree is replaced by the pretrained checkpoint; outer
    shell params (incl. zero-init adapters) are untouched."""
    cfg = _nested_cfg()
    donor = _nested_params(cfg, seed=0)
    pth = str(tmp_path / "inner_donor.pth")
    ckpt.save_vision_model(pth, jax.device_get(donor["inner_unet"]))

    cfg.initialize_inner_with_pretrained = pth
    fresh = _nested_params(cfg, seed=7)
    assert _max_leaf_diff(fresh["inner_unet"], donor["inner_unet"]) > 1e-3

    warm = ckpt.apply_inner_warm_start(fresh, cfg)
    assert _max_leaf_diff(warm["inner_unet"], donor["inner_unet"]) < 1e-6
    # outer shell untouched by the warm start
    for k in warm:
        if k == "inner_unet":
            continue
        assert _max_leaf_diff(warm[k], fresh[k]) == 0.0
    # zero-init bridge adapters stay zero (reference nested_unet.py:108-128)
    assert float(jnp.abs(warm["out_adapter"]["kernel"]).max()) == 0.0


def test_inner_warm_start_from_orbax(tmp_path):
    cfg = _nested_cfg()
    donor = _nested_params(cfg, seed=1)
    path = str(tmp_path / "inner_orbax")
    ckpt.save_vision_model(path, jax.device_get(donor["inner_unet"]),
                           format="orbax")

    cfg.initialize_inner_with_pretrained = path
    fresh = _nested_params(cfg, seed=9)
    warm = ckpt.apply_inner_warm_start(fresh, cfg)
    assert _max_leaf_diff(warm["inner_unet"], donor["inner_unet"]) < 1e-6


def test_inner_warm_start_missing_file_raises():
    cfg = _nested_cfg()
    cfg.initialize_inner_with_pretrained = "/nonexistent/inner.pth"
    fresh = _nested_params(cfg, seed=3)
    with pytest.raises(FileNotFoundError, match="initialize_inner"):
        ckpt.apply_inner_warm_start(fresh, cfg)


def test_select_resume_checkpoint(tmp_path):
    ema = tmp_path / "vis_model_000010.pth"
    raw = tmp_path / "vis_model_noema_000010.pth"
    ema.write_bytes(b"x")
    raw.write_bytes(b"x")
    # flag off: path unchanged
    assert ckpt.select_resume_checkpoint(str(raw), False) == str(raw)
    # flag on: raw redirected to EMA sibling
    assert ckpt.select_resume_checkpoint(str(raw), True) == str(ema)
    # already EMA: unchanged
    assert ckpt.select_resume_checkpoint(str(ema), True) == str(ema)
    # sibling missing: falls back to given path with a warning
    os.remove(ema)
    assert ckpt.select_resume_checkpoint(str(raw), True) == str(raw)


def test_resume_from_ema_train_state(tmp_path):
    """Orbax resume with --resume-from-ema continues FROM the EMA
    weights (params <- ema_params)."""
    from ml_mdm_tpu.clis import train_parallel
    from ml_mdm_tpu.config import get_arguments

    os.chdir(REPO)
    out = tmp_path / "run1"
    args = get_arguments(
        args=["--config_path", YAML, "--file-list", INDEX,
              "--output-dir", str(out), "--save-freq", "2",
              "--num-training-steps", "2"],
        mode="trainer",
    )
    state1 = train_parallel.main(args)
    # EMA decay is warmup-zeroed early, so ema != params after 2 steps
    assert _max_leaf_diff(state1.params, state1.ema_params) > 0

    def resume(extra):
        args2 = get_arguments(
            args=["--config_path", YAML, "--file-list", INDEX,
                  "--output-dir", str(tmp_path / "run2"),
                  "--num-training-steps", "2",  # == saved step: no training
                  "--resume-from-train-state",
                  str(out / "train_state_000002")] + extra,
            mode="trainer",
        )
        return train_parallel.main(args2)

    with_flag = resume(["--resume-from-ema"])
    np.testing.assert_allclose(
        _max_leaf_diff(with_flag.params, state1.ema_params), 0.0
    )
    without_flag = resume([])
    np.testing.assert_allclose(
        _max_leaf_diff(without_flag.params, state1.params), 0.0
    )
    assert _max_leaf_diff(without_flag.params, with_flag.params) > 0
