"""Perf-gate matrix sweep: every combination of the fast-path gates
(fused Pallas conv x space-to-depth packing x struct taps x wcache x
proj/pipelined variants) computes the SAME function end-to-end.

All gates are exact rewrites by construction (ml_mdm_tpu/perf.py), but
the combinations cross module boundaries — this sweeps the matrix on a
small nested pipeline so no combination can silently diverge. The
struct-tap kernel is exercised implicitly: every packed+fused combo
routes through fused_resnet._struct_dots (packed_struct=True).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_mdm_tpu.diffusion import NestedDiffusion, NestedDiffusionConfig
from ml_mdm_tpu.models.layers import ResNetConfig
from ml_mdm_tpu.models.nested_unet import NestedUNet, NestedUNetConfig
from ml_mdm_tpu.models.unet import UNetConfig
from ml_mdm_tpu.samplers import SamplerConfig


def _pipeline(pack: bool):
    inner = dict(
        resolution_channels=[16, 32],
        num_resnets_per_resolution=[1, 1],
        attention_levels=[1],
        num_attention_layers=[0, 1],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        nesting=True,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0),
    )
    outer = dict(
        resolution_channels=[8, 8, 16],
        num_resnets_per_resolution=[2, 2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0, 0],
        conditioning_feature_dim=16,
        num_lm_head_layers=0,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=True,
        skip_normalization=True,
        temporal_dim=64,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0),
    )
    ps = 16 if pack else 0
    module = NestedUNet(3, 3, NestedUNetConfig(
        pack_min_side=ps,
        inner_config=UNetConfig(pack_min_side=ps, **inner), **outer))
    return NestedDiffusion(
        module,
        NestedDiffusionConfig(
            sampler_config=SamplerConfig(num_diffusion_steps=8),
            no_use_residual=True,
        ),
    )


# (packed-module, env overrides) per combination; the first is the
# all-gates-off baseline every other combo must match.
_COMBOS = [
    ("baseline", False, {"ML_MDM_TPU_FUSED": "0"}),
    ("fused", False, {
        "ML_MDM_TPU_FUSED": "interpret",
        "ML_MDM_TPU_FUSED_MIN_SIDE": "8",
    }),
    ("fused-noproj-nopipe", False, {
        "ML_MDM_TPU_FUSED": "interpret",
        "ML_MDM_TPU_FUSED_MIN_SIDE": "8",
        "ML_MDM_TPU_FUSED_PROJ": "0",
        "ML_MDM_TPU_FUSED_PIPELINED": "0",
    }),
    ("packed", True, {
        "ML_MDM_TPU_FUSED": "0",
        "ML_MDM_TPU_WCACHE": "0",
        "ML_MDM_TPU_PACK64_MIN_SIDE": "16",
    }),
    ("packed-wcache", True, {
        "ML_MDM_TPU_FUSED": "0",
        "ML_MDM_TPU_WCACHE": "1",
        "ML_MDM_TPU_PACK64_MIN_SIDE": "16",
    }),
    ("packed-fused-struct", True, {
        "ML_MDM_TPU_FUSED": "interpret",
        "ML_MDM_TPU_FUSED_MIN_SIDE": "8",
        "ML_MDM_TPU_WCACHE": "0",
        "ML_MDM_TPU_PACK64_MIN_SIDE": "16",
    }),
    ("packed-fused-struct-wcache", True, {
        # the production 1024px sampling combo, scaled down
        "ML_MDM_TPU_FUSED": "interpret",
        "ML_MDM_TPU_FUSED_MIN_SIDE": "8",
        "ML_MDM_TPU_WCACHE": "1",
        "ML_MDM_TPU_PACK64_MIN_SIDE": "16",
    }),
    ("packed-fused-wcache-nopipe-noproj", True, {
        "ML_MDM_TPU_FUSED": "interpret",
        "ML_MDM_TPU_FUSED_MIN_SIDE": "8",
        "ML_MDM_TPU_WCACHE": "1",
        "ML_MDM_TPU_PACK64_MIN_SIDE": "16",
        "ML_MDM_TPU_FUSED_PROJ": "0",
        "ML_MDM_TPU_FUSED_PIPELINED": "0",
    }),
]


@pytest.fixture(scope="module")
def shared_setup():
    pipe_plain = _pipeline(False)
    params = pipe_plain.init_params(
        jax.random.PRNGKey(0), image_side=32, lm_dim=16, seq_len=4
    )
    lm = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    sample = {"lm_outputs": lm, "lm_mask": jnp.ones((2, 4))}
    return pipe_plain, _pipeline(True), params, sample


_BASE = {}


def _run(shared_setup, packed_module, env, monkeypatch):
    pipe_plain, pipe_packed, params, sample = shared_setup
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    pipe = pipe_packed if packed_module else pipe_plain
    return np.asarray(pipe.sample(
        params, 2, sample, 32, jax.random.PRNGKey(2),
        num_inference_steps=2, resample_steps=True, ddim_eta=0.0,
    ))


@pytest.mark.parametrize(
    "name,packed_module,env", _COMBOS, ids=[c[0] for c in _COMBOS]
)
def test_perf_gate_matrix(shared_setup, name, packed_module, env,
                          monkeypatch):
    out = _run(shared_setup, packed_module, env, monkeypatch)
    assert np.isfinite(out).all(), name
    if name == "baseline":
        _BASE["out"] = out
        return
    assert "out" in _BASE, "baseline combo must run first"
    np.testing.assert_allclose(
        out, _BASE["out"], rtol=2e-5, atol=2e-5,
        err_msg=f"gate combo {name} diverged from baseline",
    )
