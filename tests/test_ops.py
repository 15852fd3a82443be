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
