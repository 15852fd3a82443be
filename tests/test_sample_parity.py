"""End-to-end DDIM sample parity: the reference torch denoise loop vs our
fused lax.scan, same converted weights, same initial noise, eta=0
(deterministic) — the 'bit-comparable samples' north star (SURVEY.md §7
hard parts) at test scale."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference

ml_mdm = load_reference()
from ml_mdm import samplers as r_samplers  # noqa: E402

from ml_mdm_tpu import samplers as j_samplers  # noqa: E402
from tests.test_unet_parity import _build_pair, _small_cfg_kwargs  # noqa: E402


def _sampler_pair(n_steps=40):
    r_cfg = r_samplers.SamplerConfig(
        num_diffusion_steps=n_steps,
        schedule_type=r_samplers.ScheduleType.DEEPFLOYD,
        prediction_type=r_samplers.PredictionType.V_PREDICTION,
        threshold_function=r_samplers.ThresholdType.CLIP,
    )
    rs = r_samplers.Sampler(r_cfg)
    j_cfg = j_samplers.SamplerConfig(
        num_diffusion_steps=n_steps,
        schedule_type="DEEPFLOYD",
        prediction_type="V_PREDICTION",
        threshold_function="CLIP",
    )
    js = j_samplers.Sampler(j_cfg)
    np.testing.assert_allclose(
        np.asarray(js.gammas), rs.gammas.numpy(), rtol=1e-6, atol=1e-7
    )
    return rs, js


@pytest.mark.parametrize("num_inference_steps", [40, 10])
def test_ddim_sample_parity(num_inference_steps):
    tm, jm, params = _build_pair(_small_cfg_kwargs())
    rs, js = _sampler_pair(40)

    rng = np.random.default_rng(7)
    b, side, L, cdim = 2, 16, 5, 32
    x_T = rng.standard_normal((b, 3, side, side)).astype(np.float32)
    lm = rng.standard_normal((b, L, cdim)).astype(np.float32)
    mask = np.ones((b, L), dtype=np.float32)

    def torch_model(x, t, lm_, mask_, micros={}):
        out = tm(x, t.float(), lm_, mask_, micros=micros)
        return out, out

    with torch.no_grad():
        ref = rs.sample(
            torch_model,
            torch.from_numpy(x_T),
            torch.from_numpy(lm),
            torch.from_numpy(mask),
            {},
            num_inference_steps=num_inference_steps,
            resample_steps=(num_inference_steps != 40),
            ddim_eta=0.0,
        ).numpy()

    def jax_model(x, t, lm_, mask_, micros):
        return jm.apply({"params": params}, x, t, lm_, mask_, micros)

    out = js.sample(
        jax_model,
        jnp.asarray(np.transpose(x_T, (0, 2, 3, 1))),
        jnp.asarray(lm),
        jnp.asarray(mask),
        {},
        jax.random.PRNGKey(0),  # unused at eta=0
        num_inference_steps=num_inference_steps,
        resample_steps=(num_inference_steps != 40),
        ddim_eta=0.0,
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)


def test_nested_ddim_sample_parity():
    """Nested lockstep multi-res sampling: reference torch loop vs our
    fused scan, same weights, same per-scale initial noise, eta=0."""
    from tests.test_unet_parity import test_nested_unet_parity  # noqa: F401
    from ml_mdm import models  # noqa: F401 (ensures ref import worked)
    from tests import test_unet_parity as tup

    # rebuild the same tiny nested pair used by the forward parity test
    r_nested = tup.r_nested
    r_unet = tup.r_unet
    j_nested = tup.j_nested
    j_unet = tup.j_unet

    inner_kw = tup._small_cfg_kwargs(
        nesting=True, micro_conditioning="scale:16"
    )
    outer_kw = dict(
        num_resnets_per_resolution=[1, 1],
        attention_levels=[],
        num_attention_layers=[0, 0],
        conditioning_feature_dim=32,
        conditioning_feature_proj_dim=-1,
        num_lm_head_layers=0,
        masked_cross_attention=1,
        micro_conditioning="scale:64",
        resolution_channels=[16, 32],
        skip_mid_blocks=True,
        skip_cond_emb=True,
        skip_normalization=False,
        temporal_dim=128,
        resnet_config=dict(
            num_channels=-1, output_channels=-1, num_groups_norm=8,
            dropout=0.0, use_attention_ffn=False,
        ),
    )
    r_inner = r_unet.UNetConfig(
        **{k: (r_unet.ResNetConfig(**v) if k == "resnet_config" else v)
           for k, v in inner_kw.items()}
    )
    r_cfg = r_nested.NestedUNetConfig(
        inner_config=r_inner,
        **{k: (r_unet.ResNetConfig(**v) if k == "resnet_config" else v)
           for k, v in outer_kw.items()},
    )
    tm = r_nested.NestedUNet(3, 3, r_cfg).eval()
    j_cfg = j_nested.NestedUNetConfig(
        inner_config=j_unet.UNetConfig(**inner_kw), **outer_kw
    )
    jm = j_nested.NestedUNet(3, 3, j_cfg)

    b, side = 2, 32
    lo = side // jm.nest_ratio[0]
    xs0 = [jnp.zeros((b, side, side, 3)), jnp.zeros((b, lo, lo, 3))]
    template = jax.jit(jm.init)(
        jax.random.PRNGKey(0), xs0, jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, 5, 32)), jnp.ones((b, 5)), {}
    )["params"]
    from ml_mdm_tpu.utils.torch_compat import torch_state_dict_to_params

    params, unmatched, unfilled = torch_state_dict_to_params(
        tm.state_dict(), template
    )
    assert unmatched == [] and unfilled == []

    n_steps = 20
    r_scfg = r_samplers.SamplerConfig(
        num_diffusion_steps=n_steps,
        schedule_type=r_samplers.ScheduleType.DEEPFLOYD,
        prediction_type=r_samplers.PredictionType.V_PREDICTION,
        threshold_function=r_samplers.ThresholdType.CLIP,
        schedule_shifted=True,
    )
    rs = r_samplers.NestedSampler(r_scfg)
    j_scfg = j_samplers.SamplerConfig(
        num_diffusion_steps=n_steps,
        schedule_type="DEEPFLOYD",
        prediction_type="V_PREDICTION",
        threshold_function="CLIP",
        schedule_shifted=True,
    )
    js = j_samplers.NestedSampler(j_scfg)

    rng = np.random.default_rng(11)
    x_hi = rng.standard_normal((b, 3, side, side)).astype(np.float32)
    x_lo = rng.standard_normal((b, 3, lo, lo)).astype(np.float32)
    lm = rng.standard_normal((b, 5, 32)).astype(np.float32)
    mask = np.ones((b, 5), dtype=np.float32)

    class RefModel:
        vision_model = tm

        def __call__(self, xs, t, lm_, mask_, micros={}):
            with torch.no_grad():
                return tm(xs, t.float(), lm_, mask_, micros=micros)

    # reference _sample only accepts a single hi-res tensor (it renoises
    # the low-res levels with torch RNG) — to pin the initial noise on
    # both sides, drive its per-step get_xt_minus_1 directly with the
    # same list (the loop body of samplers.py:552-569, eta=0)
    timesteps = rs.set_timesteps(n_steps)
    x_ref = [torch.from_numpy(x_hi), torch.from_numpy(x_lo)]
    for t_now in timesteps[:-1]:
        x_ref = rs.get_xt_minus_1(
            RefModel(),
            int(t_now),
            x_ref,
            torch.from_numpy(lm),
            torch.from_numpy(mask),
            {},
            time_step_last=None,
            ddim_eta=0.0,
        )
    ref = torch.clip(x_ref[0], -1, 1).numpy()

    def jax_model(xs, t, lm_, mask_, micros):
        return jm.apply({"params": params}, list(xs), t, lm_, mask_, micros)

    out = js.sample(
        jax_model,
        [
            jnp.asarray(np.transpose(x_hi, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(x_lo, (0, 2, 3, 1))),
        ],
        jnp.asarray(lm),
        jnp.asarray(mask),
        {},
        jax.random.PRNGKey(0),
        scales=list(jm.nest_ratio) + [1],
        num_inference_steps=n_steps,
        ddim_eta=0.0,
    )
    out = out[0] if isinstance(out, (list, tuple)) else out
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=3e-3)
