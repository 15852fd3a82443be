"""Pallas kernel correctness: flash attention (interpret mode on CPU)
against the einsum reference path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_mdm_tpu.ops import attention as att


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("lq,lk", [(256, 256), (128, 384)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_matches_einsum(lq, lk, dtype, monkeypatch):
    b, h, d = 2, 4, 32
    q = _rand((b, lq, h, d), 0, dtype)
    k = _rand((b, lk, h, d), 1, dtype)
    v = _rand((b, lk, h, d), 2, dtype)

    ref = att._einsum_attention(q, k, v)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = att.flash_attention(q, k, v)

    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_flash_gating():
    """dot_product_attention only routes to flash when supported."""
    q = _rand((1, 100, 2, 16), 0)  # 100 not a multiple of 128
    assert not att._flash_supported(q, q)
    q = _rand((1, 256, 2, 16), 0)
    # on CPU backend flash is still refused (kernel is TPU-only)
    assert att._flash_supported(q, q) == (
        jax.default_backend() == "tpu"
    )


@pytest.mark.parametrize("l,d", [(256, 64), (1024, 96)])
def test_official_flash_matches_einsum(l, d, monkeypatch):
    """jax's pallas TPU flash kernel through our layout adapter."""
    from jax.experimental.pallas import tpu as pltpu

    b, h = 2, 4
    q = _rand((b, l, h, d), 0, jnp.float32)
    k = _rand((b, l, h, d), 1, jnp.float32)
    v = _rand((b, l, h, d), 2, jnp.float32)
    ref = att._einsum_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = att.tpu_flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_gn_stats_kernel_matches_jnp():
    """Pallas spatial-sums kernel (interpret mode) == jnp reductions,
    and the custom-vjp backward == autodiff of the jnp form."""
    from ml_mdm_tpu.ops.gn_stats import spatial_sums

    x32 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12, 8)) * 2
    x = x32.astype(jnp.bfloat16)
    s1, s2 = spatial_sums(x, True)
    r1 = jnp.sum(x, axis=(1, 2), dtype=jnp.float32)
    r2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                 dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(r1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2),
                               rtol=1e-5, atol=1e-3)

    def f_kernel(v):
        a, b = spatial_sums(v.astype(jnp.bfloat16), True)
        return (a.sum() + (b * 0.3).sum()).astype(jnp.float32)

    def f_jnp(v):
        vb = v.astype(jnp.bfloat16)
        a = jnp.sum(vb, axis=(1, 2), dtype=jnp.float32)
        b = jnp.sum(jnp.square(vb.astype(jnp.float32)), axis=(1, 2),
                    dtype=jnp.float32)
        return (a.sum() + (b * 0.3).sum()).astype(jnp.float32)

    g = jax.grad(f_kernel)(x32)
    ref = jax.grad(f_jnp)(x32)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-2, atol=2e-2)


def test_gn_kernel_group_norm_coeffs_parity(monkeypatch):
    """group_norm_coeffs with the Pallas stats kernel (interpret) ==
    the plain jnp path, bf16 input."""
    from ml_mdm_tpu.models.layers import group_norm_coeffs

    x = (jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16)) * 3
         + 0.7).astype(jnp.bfloat16)
    scale = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(3), (16,)) * 0.1

    monkeypatch.setenv("ML_MDM_TPU_FUSED_MIN_SIDE", "8")  # pass the gate
    monkeypatch.setenv("ML_MDM_TPU_GN_KERNEL", "0")
    a0, b0 = group_norm_coeffs(x, scale, bias, 4)
    monkeypatch.setenv("ML_MDM_TPU_GN_KERNEL", "interpret")
    a1, b1 = group_norm_coeffs(x, scale, bias, 4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-4, atol=1e-4)
