"""Config system: reference YAMLs load through every parser mode
(reference test_configs.py pattern), including the real shipped reference
YAML files read directly from /root/reference."""
import glob
import os

import pytest

from ml_mdm_tpu.config import get_arguments
from ml_mdm_tpu.samplers import PredictionType, ScheduleType

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
REF_CONFIGS = "/root/reference/ml-mdm-matryoshka/configs/models"

OUR_YAMLS = sorted(glob.glob(os.path.join(REPO, "configs/models/*.yaml")))
REF_YAMLS = sorted(glob.glob(os.path.join(REF_CONFIGS, "*.yaml")))


@pytest.mark.parametrize("mode", ["trainer", "sampler", "demo", "evaluator"])
@pytest.mark.parametrize("yaml_path", OUR_YAMLS)
def test_our_yamls_parse(yaml_path, mode):
    args = get_arguments(args=["--config_path", yaml_path], mode=mode)
    assert args.unet_config is not None
    assert args.diffusion_config is not None


@pytest.mark.parametrize("yaml_path", OUR_YAMLS)
def test_our_yamls_semantics(yaml_path):
    """Our shipped recipes express the same architectures as the
    reference ones (same invariants as test_reference_yamls_parse)."""
    args = get_arguments(args=["--config_path", yaml_path], mode="trainer")
    name = os.path.basename(yaml_path)
    sc = args.diffusion_config.sampler_config
    if "256" in name:
        assert args.model == "nested_unet"
        assert args.unet_config.inner_config.resolution_channels == [256, 512, 768]
        assert args.diffusion_config.mixed_ratio == "2:1"
        assert sc.schedule_shifted
    if "1024" in name:
        assert args.model == "nested2_unet"
        inner2 = args.unet_config.inner_config.inner_config
        assert inner2.resolution_channels == [256, 512, 768]
        assert args.diffusion_config.multi_res_weights == "16:4:1"
        assert sc.schedule_shifted_power == 2
        assert args.fp16


@pytest.mark.skipif(not REF_YAMLS, reason="reference configs absent")
@pytest.mark.parametrize("yaml_path", REF_YAMLS)
def test_reference_yamls_parse(yaml_path):
    """North-star: shipped reference YAMLs load unchanged."""
    args = get_arguments(args=["--config_path", yaml_path], mode="trainer")
    sc = args.diffusion_config.sampler_config
    assert sc.num_diffusion_steps == 1000
    assert sc.schedule_type == ScheduleType.DEEPFLOYD
    assert sc.prediction_type == PredictionType.V_PREDICTION
    # quirk #4: HA_STYLE loss target resolves to the eps target
    assert isinstance(sc.loss_target_type, PredictionType)

    name = os.path.basename(yaml_path)
    if "256" in name:
        assert args.model == "nested_unet"
        assert args.unet_config.inner_config is not None
        assert args.diffusion_config.mixed_ratio == "2:1"
        assert sc.schedule_shifted
    if "1024" in name:
        assert args.model == "nested2_unet"
        inner2 = args.unet_config.inner_config.inner_config
        assert inner2.resolution_channels == [256, 512, 768]
        assert args.diffusion_config.multi_res_weights == "16:4:1"
        assert sc.schedule_shifted_power == 2


def test_cli_overrides_beat_yaml():
    yaml_path = os.path.join(REPO, "configs/models/cc12m_64x64.yaml")
    args = get_arguments(
        args=[
            "--config_path", yaml_path,
            "--batch-size", "7",
            "--reader_config.max_token_length", "64",
        ],
        mode="trainer",
    )
    assert args.batch_size == 7
    assert args.reader_config.max_token_length == 64


def test_registry_builds_all_models():
    """Registry smoke test (reference test_models.py:16-42): every
    registered arch instantiates with default configs."""
    from ml_mdm_tpu.config import (
        MODEL_CONFIG_REGISTRY,
        get_model,
        get_model_config_cls,
        get_pipeline,
        get_pipeline_config_cls,
    )
    import ml_mdm_tpu.diffusion  # noqa: F401
    import ml_mdm_tpu.models  # noqa: F401

    assert set(MODEL_CONFIG_REGISTRY) >= {
        "unet", "nested_unet", "nested2_unet", "nested3_unet",
        "nested4_unet",
    }
    for arch in MODEL_CONFIG_REGISTRY:
        cfg = get_model_config_cls(arch)()
        module = get_model(arch)(3, 3, cfg)
        pipe_cfg = get_pipeline_config_cls(arch)()
        pipeline = get_pipeline(arch)(module, pipe_cfg)
        assert pipeline.vision_module is module


def test_cifar10_categorical_recipe():
    """cifar10_32x32: categorical (one-hot) conditioning end to end —
    config parse, LM build, one loss evaluation."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ml_mdm_tpu.config import get_model, get_pipeline
    from ml_mdm_tpu.language_models import factory

    os.chdir(REPO)
    args = get_arguments(
        args=["--config_path", "configs/models/cifar10_32x32.yaml"],
        mode="trainer",
    )
    assert args.categorical_conditioning == 1
    tokenizer, lm = factory.create_lm(args)
    assert lm.embed_dim == tokenizer.vocab_size == 13

    args.unet_config.conditioning_feature_dim = lm.embed_dim
    # shrink for CPU: one resnet per level, no attention
    args.unet_config.num_resnets_per_resolution = [1, 1]
    args.unet_config.resolution_channels = [32, 64]
    args.unet_config.attention_levels = []
    args.unet_config.num_attention_layers = [0, 0]
    module = get_model(args.model)(3, 3, args.unet_config)
    pipe = get_pipeline(args.model)(module, args.diffusion_config)
    params = pipe.init_params(
        jax.random.PRNGKey(0), image_side=32, lm_dim=13, seq_len=1, batch=2
    )
    out, mask = lm({"tokens": np.array([[1, 5], [1, 9]])}, tokenizer)
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)),
        "lm_outputs": jnp.asarray(out),
        "lm_mask": jnp.ones(out.shape[:2]),
    }
    losses, *_ = pipe.get_loss(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(losses)).all()


def test_no_silently_unwired_fields():
    """Every field of every registered config dataclass must either be
    referenced somewhere in the package source (wired) or be explicitly
    declared inert in config.INERT_COMPAT_FIELDS (which warns loudly at
    parse time). Guards against accepted-but-no-op knobs (VERDICT r1)."""
    import dataclasses
    import pathlib
    import re

    import ml_mdm_tpu.config as C
    import ml_mdm_tpu.diffusion  # noqa: F401 (registry)
    import ml_mdm_tpu.models  # noqa: F401
    from ml_mdm_tpu.reader import ReaderConfig

    pkg = pathlib.Path(C.__file__).parent
    src = "".join(
        p.read_text() for p in pkg.rglob("*.py")
    ) + (pkg.parent / "bench.py").read_text()

    classes = set()
    for entry in C.MODEL_CONFIG_REGISTRY.values():
        classes.add(entry["config"])
    classes |= set(C.PIPELINE_CONFIG_REGISTRY.values())
    classes.add(ReaderConfig)
    # include nested config dataclass types (sampler_config, resnet_config)
    for cls in list(classes):
        for f in dataclasses.fields(cls):
            t = C._dataclass_target(cls, f)
            if t is not None:
                classes.add(t)

    unwired = []
    for cls in classes:
        inert = C.INERT_COMPAT_FIELDS.get(cls.__name__, set())
        for f in dataclasses.fields(cls):
            if f.name in inert:
                continue
            # wired = attribute access or string-key access anywhere
            pat = r"\.%s\b|[\"']%s[\"']" % (
                re.escape(f.name), re.escape(f.name)
            )
            if not re.search(pat, src):
                unwired.append(f"{cls.__name__}.{f.name}")
    assert not unwired, (
        "config fields with no implementation and not declared inert: "
        f"{sorted(set(unwired))}"
    )


def test_inert_field_warns(caplog):
    import logging as _logging

    from ml_mdm_tpu.config import warn_inert_fields
    from ml_mdm_tpu.diffusion import NestedDiffusionConfig

    cfg = NestedDiffusionConfig(use_random_interp=True)
    with caplog.at_level(_logging.WARNING):
        hits = warn_inert_fields(cfg)
    assert any("use_random_interp" in h for h in hits)
    assert any("NO effect" in r.message for r in caplog.records)
