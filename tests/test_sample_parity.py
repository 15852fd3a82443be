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
