"""Numerical parity of the JAX diffusion math vs the torch reference.

Every test draws random inputs, runs the reference sampler (torch, CPU) and
our JAX sampler, and asserts allclose — the `test_unet_mlx.py` parity
pattern from the reference applied to the diffusion math core.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_mdm_tpu import samplers as S

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference

ml_mdm = load_reference()
from ml_mdm import samplers as RS  # noqa: E402


def make_pair(schedule="DDPM", n_steps=50, prediction_type="DDPM", **kw):
    ref_cfg = RS.SamplerConfig(
        num_diffusion_steps=n_steps,
        schedule_type=RS.ScheduleType[schedule],
        prediction_type=RS.PredictionType[prediction_type],
        **{k: v for k, v in kw.items() if hasattr(RS.SamplerConfig, k)},
    )
    ref = RS.Sampler(ref_cfg)
    cfg = S.SamplerConfig(
        num_diffusion_steps=n_steps,
        schedule_type=schedule,
        prediction_type=prediction_type,
        **kw,
    )
    ours = S.Sampler(cfg)
    return ref, ours


@pytest.mark.parametrize("schedule", ["COSINE", "DDPM", "DEEPFLOYD"])
def test_gamma_tables_match(schedule):
    ref, ours = make_pair(schedule, n_steps=100)
    np.testing.assert_allclose(
        np.asarray(ours.gammas), ref.gammas.numpy(), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(ours.vdm_loss_weights),
        ref.vdm_loss_weights.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


def test_sigmoid_schedule_is_wired():
    # The reference defines SIGMOID but raises on dispatch (quirk #3); we
    # support it and it must be a valid monotone gamma table.
    cfg = S.SamplerConfig(num_diffusion_steps=64, schedule_type="SIGMOID")
    smp = S.Sampler(cfg)
    g = np.asarray(smp.gammas)
    assert g[0] == 1.0
    assert np.all(np.diff(g) <= 0)
    assert g[-1] > 0


def test_schedule_shifted():
    ref, ours = make_pair("DDPM", 64)
    g = ref.gammas.clone()
    ref._config.schedule_shifted_power = 2.0
    shifted_ref = ref.get_schedule_shifted(g, 4.0)
    shifted_ours = S.shift_gammas(jnp.asarray(g.numpy()), 4.0, power=2.0)
    np.testing.assert_allclose(
        np.asarray(shifted_ours), shifted_ref.numpy(), rtol=1e-5, atol=1e-6
    )


def _rand_imgs(rng, b=4, h=16, w=16, c=3):
    x = rng.standard_normal((b, c, h, w)).astype(np.float32)
    return x  # NCHW for torch; transpose for jax


def _to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@pytest.mark.parametrize("pt", ["DDPM", "V_PREDICTION"])
def test_forward_diffusion_and_targets(pt):
    rng = np.random.default_rng(0)
    ref, ours = make_pair("DDPM", 50, prediction_type=pt)
    x = _rand_imgs(rng)
    eps = rng.standard_normal(x.shape).astype(np.float32)
    t = rng.integers(0, 50, size=(4,))

    tx, teps = torch.from_numpy(x), torch.from_numpy(eps)
    tt = torch.from_numpy(t).long()
    g_ref = ref.read_gamma(tt + 1, tx)
    gl_ref = ref.read_gamma(tt, tx)
    xt_ref = ref.get_xt(tx, teps, g_ref)
    tgt_ref = ref.get_prediction_targets(tx, teps, g_ref, gl_ref)

    jt = jnp.asarray(t)
    g = ours.read_gamma(jt + 1)
    gl = ours.read_gamma(jt)
    xt = ours.get_xt(_to_nhwc(x), _to_nhwc(eps), g)
    tgt = ours.get_prediction_targets(_to_nhwc(x), _to_nhwc(eps), g, gl)

    np.testing.assert_allclose(
        _from_nhwc(xt), xt_ref.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        _from_nhwc(tgt), tgt_ref.numpy(), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("pt", ["DDPM", "V_PREDICTION"])
def test_x0_eps_roundtrip(pt):
    rng = np.random.default_rng(1)
    ref, ours = make_pair("DDPM", 50, prediction_type=pt)
    x_t = _rand_imgs(rng)
    pred = rng.standard_normal(x_t.shape).astype(np.float32)
    t = rng.integers(1, 50, size=(4,))

    tx, tp = torch.from_numpy(x_t), torch.from_numpy(pred)
    tt = torch.from_numpy(t).long()
    g_ref = ref.read_gamma(tt, tx)
    x0_ref, eps_ref = ref.get_x0_eps_from_pred(tx, tp, g_ref)
    pred_back_ref = ref.get_pred_from_x0_xt(tx, x0_ref, g_ref)

    g = ours.read_gamma(jnp.asarray(t))
    x0, eps = ours.get_x0_eps_from_pred(_to_nhwc(x_t), _to_nhwc(pred), g)
    pred_back = ours.get_pred_from_x0_xt(_to_nhwc(x_t), x0, g)

    np.testing.assert_allclose(_from_nhwc(x0), x0_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_from_nhwc(eps), eps_ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        _from_nhwc(pred_back), pred_back_ref.numpy(), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize(
    "pt,eta", [("DDPM", None), ("DDPM", 0), ("DDPM", 1), ("V_PREDICTION", None)]
)
def test_ancestral_step(pt, eta):
    """DDPM/DDIM step parity, deterministic part (no injected noise)."""
    rng = np.random.default_rng(2)
    ref, ours = make_pair("DEEPFLOYD", 100, prediction_type=pt)
    x_t = _rand_imgs(rng)
    pred = 0.1 * rng.standard_normal(x_t.shape).astype(np.float32)
    t = rng.integers(2, 100, size=(4,))

    tx, tp = torch.from_numpy(x_t), torch.from_numpy(pred)
    tt = torch.from_numpy(t).long()
    g_ref, gl_ref = ref.read_gamma(tt, tx), ref.read_gamma(tt - 1, tx)
    x0_ref, xs_ref, eps_ref = ref.get_prediction_xt_last(
        tx, tp, g_ref, gl_ref, need_noise=False, ddim_eta=eta,
        clip_fn=ref.clip_sample,
    )

    jt = jnp.asarray(t)
    g, gl = ours.read_gamma(jt), ours.read_gamma(jt - 1)
    x0, xs, eps = ours.get_prediction_xt_last(
        _to_nhwc(x_t), _to_nhwc(pred), g, gl, need_noise=False, ddim_eta=eta,
        clip_fn=ours.clip_sample,
    )
    np.testing.assert_allclose(_from_nhwc(x0), x0_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_from_nhwc(xs), xs_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_from_nhwc(eps), eps_ref.numpy(), rtol=1e-3, atol=1e-4)


def test_stochastic_step_noise_scaling():
    """With noise injected, x_s = deterministic + sqrt(beta_tilde)*noise."""
    rng = np.random.default_rng(3)
    _, ours = make_pair("DDPM", 50)
    x_t = _to_nhwc(_rand_imgs(rng))
    pred = 0.1 * x_t
    t = jnp.asarray([5, 10, 20, 40])
    g, gl = ours.read_gamma(t), ours.read_gamma(t - 1)
    noise = jnp.asarray(rng.standard_normal(x_t.shape).astype(np.float32))
    _, xs_det, _ = ours.get_prediction_xt_last(
        x_t, pred, g, gl, need_noise=False, input_noise=noise
    )
    _, xs_noisy, _ = ours.get_prediction_xt_last(
        x_t, pred, g, gl, need_noise=True, input_noise=noise
    )
    alpha = g / gl
    beta_tilde = (1 - alpha) * (1 - gl) / (1 - g)
    np.testing.assert_allclose(
        np.asarray(xs_noisy - xs_det),
        np.asarray(jnp.sqrt(beta_tilde) * noise),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize(
    "tf,ref_tf",
    [("CLIP", "CLIP"), ("DYNAMIC", "DYNAMIC"), ("DYNAMIC_IF", "DYNAMIC_IF"),
     ("NONE", "NONE")],
)
def test_thresholding(tf, ref_tf):
    rng = np.random.default_rng(4)
    ref, ours = make_pair("DDPM", 50, threshold_function=tf)
    ref._config.threshold_function = RS.ThresholdType[ref_tf]
    x = (3.0 * rng.standard_normal((4, 3, 16, 16))).astype(np.float32)
    out_ref = ref.clip_sample(torch.from_numpy(x), image_scale=2.0)
    out = ours.clip_sample(_to_nhwc(x), image_scale=2.0)
    np.testing.assert_allclose(
        _from_nhwc(out), out_ref.numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("n,k", [(1000, 50), (1000, 250), (100, 100), (32, 10)])
def test_set_timesteps(n, k):
    ref, ours = make_pair("DDPM", n)
    np.testing.assert_array_equal(ours.set_timesteps(k), ref.set_timesteps(k))


def test_fused_sample_runs_and_matches_stream():
    """The scan-fused sampler equals the per-step streaming sampler."""
    cfg = S.SamplerConfig(
        num_diffusion_steps=8, schedule_type="DDPM", prediction_type="V_PREDICTION"
    )
    smp = S.Sampler(cfg)

    def model_fn(x, t, lm, mask, micros):
        return 0.1 * x  # dummy net

    key = jax.random.PRNGKey(0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    lm = jnp.zeros((2, 4, 8))
    mask = jnp.ones((2, 4))

    out = jax.jit(
        lambda x, k: smp.sample(model_fn, x, lm, mask, {}, k, ddim_eta=0)
    )(x_T, key)
    stream_out = None
    for _, x_t, _ in smp.sample_stream(model_fn, x_T, lm, mask, {}, key, ddim_eta=0):
        stream_out = x_t
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(stream_out), rtol=1e-5, atol=1e-5
    )
    assert out.shape == (2, 8, 8, 3)
    assert bool(jnp.all(jnp.abs(out) <= 1.0))


def test_cfg_guidance():
    cfg = S.SamplerConfig(num_diffusion_steps=8)
    smp = S.Sampler(cfg)

    calls = {}

    def model_fn(x, t, lm, mask, micros):
        calls["batch"] = x.shape[0]
        # pred depends on lm so cond/uncond differ
        return x * 0 + lm[:, 0, 0].reshape(-1, 1, 1, 1)

    x = jnp.ones((2, 4, 4, 3))
    t = jnp.zeros((2,), dtype=jnp.int32)
    lm = jnp.concatenate(
        [jnp.zeros((2, 4, 8)), jnp.ones((2, 4, 8))], axis=0
    )  # [uncond; cond]
    mask = jnp.ones((4, 4))
    pred = smp.forward_model(model_fn, x, t, lm, mask, {}, guidance_scale=3.0)
    assert calls["batch"] == 4
    # uncond=0, cond=1 -> 0 + 3*(1-0) = 3
    np.testing.assert_allclose(np.asarray(pred), 3.0 * np.ones((2, 4, 4, 3)))


def test_nested_sampler_gammas_and_xt():
    ref_cfg = RS.SamplerConfig(
        num_diffusion_steps=50,
        schedule_type=RS.ScheduleType.DEEPFLOYD,
        prediction_type=RS.PredictionType.V_PREDICTION,
        schedule_shifted=True,
    )
    ref = RS.NestedSampler(ref_cfg)
    ours = S.NestedSampler(
        S.SamplerConfig(
            num_diffusion_steps=50,
            schedule_type="DEEPFLOYD",
            prediction_type="V_PREDICTION",
            schedule_shifted=True,
        )
    )
    rng = np.random.default_rng(5)
    scales = [4, 1]
    x_hi = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    x_lo = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    e_hi = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    e_lo = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    t = np.asarray([3, 40])

    tt = torch.from_numpy(t).long()
    timgs = [torch.from_numpy(x_hi), torch.from_numpy(x_lo)]
    teps = [torch.from_numpy(e_hi), torch.from_numpy(e_lo)]
    g_ref = ref.get_gammas(ref.read_gamma(tt + 1, timgs[0]), scales, timgs)
    xt_ref = ref.get_xt(timgs, teps, g_ref, scales)

    jt = jnp.asarray(t)
    g = ours.get_gammas(ours.read_gamma(jt + 1), scales)
    xt = ours.get_xt(
        [_to_nhwc(x_hi), _to_nhwc(x_lo)], [_to_nhwc(e_hi), _to_nhwc(e_lo)], g, scales
    )
    for i in range(2):
        # reference materialises full-size gamma maps; ours broadcast
        np.testing.assert_allclose(
            np.asarray(g[i]).ravel(),
            g_ref[i][:, :1, :1, :1].numpy().ravel(),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            _from_nhwc(xt[i]), xt_ref[i].numpy(), rtol=1e-4, atol=1e-5
        )


def test_chunked_sample_matches_fused():
    """sample_chunked (host-driven bounded chunks) is numerically
    identical to the one-scan sample: same timestep table, same keys."""
    cfg = S.SamplerConfig(
        num_diffusion_steps=11, schedule_type="DDPM",
        prediction_type="V_PREDICTION",
    )
    smp = S.Sampler(cfg)
    theta = jnp.float32(0.1)

    def model_apply(p, x, t, lm, mask, micros):
        return p * x

    def model_fn(x, t, lm, mask, micros):
        return model_apply(theta, x, t, lm, mask, micros)

    key = jax.random.PRNGKey(0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    lm = jnp.zeros((2, 4, 8))
    mask = jnp.ones((2, 4))

    fused = jax.jit(
        lambda x, k: smp.sample(model_fn, x, lm, mask, {}, k, ddim_eta=0)
    )(x_T, key)
    for chunk_steps in (4, 11, 64):  # ragged, exact, oversized
        chunked = smp.sample_chunked(
            theta, model_apply, x_T, lm, mask, {}, key,
            ddim_eta=0, chunk_steps=chunk_steps,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(chunked), rtol=1e-5, atol=1e-5
        )


def test_nested_chunked_sample_matches_fused():
    cfg = S.SamplerConfig(
        num_diffusion_steps=9, schedule_type="DEEPFLOYD",
        prediction_type="V_PREDICTION", schedule_shifted=True,
    )
    smp = S.NestedSampler(cfg)
    scales = [4, 1]
    theta = jnp.float32(0.05)

    def model_apply(p, xs, t, lm, mask, micros):
        return [p * x for x in xs]

    def model_fn(xs, t, lm, mask, micros):
        return model_apply(theta, xs, t, lm, mask, micros)

    key = jax.random.PRNGKey(3)
    xs = smp.init_noise(jax.random.PRNGKey(4), 2, 3, 16, scales)
    lm = jnp.zeros((2, 4, 8))
    mask = jnp.ones((2, 4))

    fused = jax.jit(
        lambda x0, x1, k: smp.sample(
            model_fn, [x0, x1], lm, mask, {}, k, scales=scales, ddim_eta=0
        )
    )(xs[0], xs[1], key)
    chunked = smp.sample_chunked(
        theta, model_apply, xs, lm, mask, {}, key,
        scales=scales, ddim_eta=0, chunk_steps=4,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(chunked), rtol=1e-5, atol=1e-5
    )
