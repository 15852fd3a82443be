"""Attention kernels.

The numerics follow the reference attention (unet.py:276-294): the scale
1/sqrt(sqrt(d)) is applied to BOTH q and k before the logits einsum (better
bf16 stability than scaling the product), softmax runs in fp32, and masked
key positions get -inf logits.

Execution paths:

- ``dot_product_attention`` (DEFAULT): einsum form with bf16 logits
  storage under bf16 compute. Measured fastest end-to-end for this
  model's sequence lengths (<= 1024 tokens) — beats both flash kernels
  below; see docs/performance.md.
- ``tpu_flash_attention``: jax's pipelined Pallas TPU kernel, routed to
  by ``use_flash(True)`` / ML_MDM_TPU_FLASH=1 — the opt-in path for
  genuinely long sequences (never materialises the (L, L) logits).
- ``flash_attention``: the in-repo teaching kernel (blocked online
  softmax). NOT on any production path — kept as a worked Pallas
  example with interpret-mode tests.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# default OFF: measured on TPU v5e with the 64px flagship (L<=1024), the
# XLA-fused einsum path is ~25% faster end-to-end (5.69 vs 4.46
# samples/s) — see flash_attention docstring. Opt in for long sequences.
# Declared in ml_mdm_tpu.perf; use_flash() forces programmatically.
_FLASH_OVERRIDE = None


def use_flash(enabled: bool):
    global _FLASH_OVERRIDE
    _FLASH_OVERRIDE = bool(enabled)


def _use_flash() -> bool:
    if _FLASH_OVERRIDE is not None:
        return _FLASH_OVERRIDE
    from ml_mdm_tpu.perf import perf

    return perf().flash


# materialise the (L, L) logits in bf16 instead of f32 under bf16
# compute (the MXU still accumulates the QK dot in f32 internally; only
# the stored rounding changes — consistent with the rest of the bf16
# path). Halves attention's dominant HBM traffic at 1024 tokens:
# measured +6.6% end-to-end on the 64px flagship (5.82 -> 6.21
# samples/s). Opt out with ML_MDM_TPU_BF16_LOGITS=0; f32 models are
# unaffected. Declared in ml_mdm_tpu.perf.


def _einsum_attention(q, k, v, mask=None):
    """q: (B, Lq, H, D), k/v: (B, Lk, H, D), mask: (B, Lk) or None."""
    from ml_mdm_tpu.perf import perf

    d = q.shape[-1]
    scale = 1.0 / (d ** 0.25)
    logits_dtype = (
        jnp.bfloat16
        if (perf().bf16_logits and q.dtype == jnp.bfloat16)
        else jnp.float32
    )
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k * scale,
        preferred_element_type=logits_dtype,
    )
    if mask is not None:
        m = mask[:, None, None, :]
        logits = jnp.where(m == 0, -jnp.inf, logits)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        v.dtype
    )
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, L, H, D) attention with optional key-padding mask (B, Lk)."""
    if _use_flash() and mask is None and _flash_supported(q, k):
        return tpu_flash_attention(q, k, v)
    return _einsum_attention(q, k, v, mask)


def tpu_flash_attention(q, k, v):
    """jax's pipelined Pallas TPU flash attention (never materialises the
    (L, L) logits — the einsum path writes them to HBM in f32, which is
    ~22% of the flagship forward at 1024 tokens). Layout adapters:
    model uses (B, L, H, D), kernel wants (B, H, L, D); the reference
    scale q*k/sqrt(d) maps to sm_scale."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as _fa,
    )

    d = q.shape[-1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _fa(qt, kt, vt, sm_scale=1.0 / (d ** 0.5))
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Pallas flash attention (TPU)
# ---------------------------------------------------------------------------


def _flash_supported(q, k):
    # kernel requires seq lengths multiple of block size and TPU backend
    try:
        if jax.default_backend() not in ("tpu",):
            return False
    except Exception:
        return False
    lq, lk = q.shape[1], k.shape[1]
    return lq % 128 == 0 and lk % 128 == 0 and q.shape[-1] <= 256


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, block_q: int = 128, block_k: int = 128):
    """Blocked online-softmax attention. q,k,v: (B, L, H, D).

    Heads fold into the batch/grid axis (Mosaic requires the last two
    block dims to be (8,128)-divisible or full-size, which rules out a
    singleton head axis in the block). Measured on TPU v5e with the
    flagship 64px model (L in {256, 1024}, D in {64, 96}), XLA's fused
    einsum attention is ~25% faster end-to-end than this kernel — the
    fold transposes cost more than the fusion saves — so the kernel is
    opt-in (ML_MDM_TPU_FLASH=1) and pays off only for sequence lengths
    well beyond this model family's (>= 4k tokens).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / (d ** 0.25)

    # fold heads into batch; kernel operates on (L, D) tiles
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, lq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, lk, d)

    num_q_blocks = lq // block_q
    num_k_blocks = lk // block_k

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
        m = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
        l = jnp.zeros((block_q, 1), dtype=jnp.float32)
        acc = jnp.zeros((block_q, d), dtype=jnp.float32)

        def body(i, carry):
            m, l, acc = carry
            kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(
                jnp.float32
            ) * scale
            vb = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
            s = jnp.dot(qb, kb.T, preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.dot(
                p, vb, preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m, l, acc))
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, num_q_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, lq, d).transpose(0, 2, 1, 3)
