"""Pallas TPU kernel: fused affine + SiLU + 3x3 conv (+bias, +residual).

Computes  y = conv3x3(silu(x * a + b), w) + bias [+ residual]  in ONE pass
over the activation, NHWC, bf16 compute with f32 accumulation.

Why this exists: XLA lowers the thin-shell convolutions of the Matryoshka
models through a spatial-tiled internal layout ([H, tiles, W+halo, C]);
every non-conv consumer (GroupNorm statistics, elementwise epilogues,
residual adds) then pays a full-tensor relayout copy. Profiled on v5e
(r2), those copies were >50% of the 1024px forward — more than the conv
math itself. This kernel keeps the activation in its plain NHWC layout:
the halo rows arrive as shifted grid blocks, the 9 kernel taps run as
MXU dots from a zero-framed VMEM scratch, and the normalise/SiLU/
residual epilogues ride along for free.

Forward-only by design: the training path keeps the XLA convolution
(jax.checkpoint + autodiff work there); the sampling path — where the
1024px preset lives — routes here. See ResNet._forward.

Reference semantics being fused (cites into /root/reference):
ml-mdm-matryoshka/ml_mdm/models/unet.py:193-238 (ResNet block:
GN -> SiLU -> conv, FiLM time injection folded into the GN affine).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_mode():
    """Whether (and how) to run the fused Pallas conv kernels.

    ML_MDM_TPU_FUSED=0 disables; =interpret forces the pallas
    interpreter (CPU testing); default: compiled kernel on TPU, plain
    XLA path elsewhere."""
    v = os.environ.get("ML_MDM_TPU_FUSED", "auto")
    if v == "0":
        return None
    if v == "interpret":
        return "interpret"
    return "tpu" if jax.default_backend() == "tpu" else None


def conv3x3_fast(x, w, bias, residual=None):
    """Plain 3x3 stride-1 conv via the fused kernel (no affine/silu),
    falling back to XLA when the kernel is disabled on this backend."""
    mode = fused_mode()
    if mode is None:
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        if residual is not None:
            y = y + residual
        return y
    bsz, c = x.shape[0], x.shape[-1]
    ones = jnp.ones((bsz, c), jnp.float32)
    zeros = jnp.zeros((bsz, c), jnp.float32)
    if bias is None:
        bias = jnp.zeros((w.shape[-1],), jnp.float32)
    return affine_silu_conv3x3(
        x, ones, zeros, w, bias, residual,
        apply_silu=False, interpret=mode == "interpret",
    )


def _kernel(prev_ref, cur_ref, next_ref, a_ref, b_ref, w_ref, bias_ref,
            res_ref, out_ref, st_ref, s_ref, *,
            th: int, apply_silu: bool, with_residual: bool,
            emit_stats: bool, halo_rows: bool = True):
    """One grid step computes TH output rows of one batch element.

    cur_ref:  (1, TH, W, C) row block i
    prev/next_ref: (1, 1, W, C) SINGLE-row halos — the last row of
        block i-1 / first row of block i+1 (index maps clamp at the
        image border; the duplicated edge rows are masked to zero
        below, matching conv padding=1). Fetching one-row halos rather
        than whole neighbour blocks keeps HBM input reads at
        (1 + 2/TH)x instead of 3x.
    a_ref, b_ref: (B, C) f32 whole-array — per-(batch, channel) affine
    w_ref:   (3, 3, C, Cout)
    bias_ref:(1, Cout) whole-array
    res_ref: (1, TH, W, Cout) residual to add (zeros block when unused)
    out_ref: (1, TH, W, Cout)
    st_ref: (1, 8, Cout) f32 — accumulated stats of the OUTPUT for the
        next GroupNorm: row 0 the sum, row 1 the sum of squares (the
        block revisits across row-block grid steps, accumulating in
        VMEM; a separate stats pass over the activation never runs)
    s_ref:   (TH+2, W+2, C) VMEM scratch: silu(x*a+b), zero-framed
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    w_len = cur_ref.shape[2]

    a = a_ref[bi, :].astype(jnp.float32)
    b = b_ref[bi, :].astype(jnp.float32)

    def act(rows):
        v = rows.astype(jnp.float32) * a + b
        if apply_silu:
            v = jax.nn.silu(v)
        return v.astype(s_ref.dtype)

    # zero frame: one halo row top/bottom, one halo column left/right
    s_ref[:, :, :] = jnp.zeros_like(s_ref)
    s_ref[1:th + 1, 1:w_len + 1, :] = act(cur_ref[0])

    @pl.when(i > 0)
    def _():
        s_ref[0, 1:w_len + 1, :] = act(
            prev_ref[0, 0 if halo_rows else th - 1, :, :]
        )

    @pl.when(i < n_i - 1)
    def _():
        s_ref[th + 1, 1:w_len + 1, :] = act(next_ref[0, 0, :, :])

    # 9 taps as MXU dots; accumulate in registers, one VMEM write.
    # (A/B note: pre-shifting the three dx column windows into aligned
    # scratch buffers to avoid sublane-offset reads measured NO change
    # on v5e — Mosaic already handles the offset slices well.)
    acc = None
    for dy in range(3):
        for dx in range(3):
            tile = s_ref[dy:dy + th, dx:dx + w_len, :]
            part = jax.lax.dot_general(
                tile.reshape(th * w_len, tile.shape[-1]),
                w_ref[dy, dx, :, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part

    y = acc.reshape(th, w_len, -1) + bias_ref[0, :].astype(jnp.float32)
    if with_residual:
        y = y + res_ref[0].astype(jnp.float32)
    out_ref[0, :, :, :] = y.astype(out_ref.dtype)
    if emit_stats:
        # stats of the stored (rounded) output with the same dtype
        # semantics as group_norm_coeffs' bf16 branch: square in the
        # storage dtype, accumulate in f32 — the next norm sees exactly
        # what it would have computed from the activation itself
        @pl.when(i == 0)
        def _():
            st_ref[0, :, :] = jnp.zeros_like(st_ref[0])

        yb = out_ref[0, :, :, :]
        st_ref[0, 0, :] += jnp.sum(yb, axis=(0, 1), dtype=jnp.float32)
        st_ref[0, 1, :] += jnp.sum(yb * yb, axis=(0, 1),
                                   dtype=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("apply_silu", "tile_h", "interpret", "emit_stats",
                     "halo_rows"),
)
def affine_silu_conv3x3(x, a, b, w, bias, residual=None, *,
                        apply_silu: bool = True, tile_h: int = 8,
                        interpret: bool = False, emit_stats: bool = False,
                        halo_rows: bool = True):
    """y = conv3x3(silu(x*a+b), w, padding=1) + bias [+ residual].

    x: (B, H, W, C); a, b: (B, C) f32; w: (3, 3, C, Cout);
    bias: (Cout,); residual: optional (B, H, W, Cout).
    Returns (B, H, W, Cout) in x.dtype; with emit_stats additionally
    (s1, s2): (B, Cout) f32 sum / sum-of-squares of the output over the
    spatial axes (for the consumer GroupNorm — no separate stats pass).
    """
    bsz, h, w_len, c = x.shape
    cout = w.shape[-1]
    th = min(tile_h, h)
    while h % th:
        th //= 2
    n_i = h // th

    with_residual = residual is not None
    if residual is None:
        residual = jnp.zeros((bsz, 1, 1, 1), x.dtype)
        res_spec = pl.BlockSpec((1, 1, 1, 1), lambda bi, ii: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        res_spec = pl.BlockSpec((1, th, w_len, cout),
                                lambda bi, ii: (bi, ii, 0, 0),
                                memory_space=pltpu.VMEM)

    cur_spec = pl.BlockSpec(
        (1, th, w_len, c),
        lambda bi, ii: (bi, ii, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if halo_rows:
        # one-row halo blocks (block shape 1 on the row axis => the
        # block index IS the row index): last row of block ii-1, first
        # of ii+1 — HBM input reads (1 + 2/TH)x instead of 3x
        prev_spec = pl.BlockSpec(
            (1, 1, w_len, c),
            lambda bi, ii: (bi, jnp.maximum(ii * th - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )
        next_spec = pl.BlockSpec(
            (1, 1, w_len, c),
            lambda bi, ii: (bi, jnp.minimum((ii + 1) * th, h - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        # whole neighbour blocks (3x input reads, larger DMAs)
        prev_spec = pl.BlockSpec(
            (1, th, w_len, c),
            lambda bi, ii: (bi, jnp.maximum(ii - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )
        next_spec = pl.BlockSpec(
            (1, th, w_len, c),
            lambda bi, ii: (bi, jnp.minimum(ii + 1, n_i - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _kernel, th=th, apply_silu=apply_silu,
        with_residual=with_residual, emit_stats=emit_stats,
        halo_rows=halo_rows,
    )
    scratch_shapes = [pltpu.VMEM((th + 2, w_len + 2, c), x.dtype)]
    # the stats block revisits (constant index over ii): partial sums
    # accumulate in VMEM and flush to HBM once per batch row
    stat_spec = pl.BlockSpec((1, 8, cout), lambda bi, ii: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = pl.pallas_call(
        kernel,
        grid=(bsz, n_i),
        in_specs=[
            prev_spec,
            cur_spec,
            next_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias, whole array
            res_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, th, w_len, cout),
                         lambda bi, ii: (bi, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            stat_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, w_len, cout), x.dtype),
            jax.ShapeDtypeStruct((bsz, 8, cout), jnp.float32),
        ),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w_len * 9 * c * cout,
            bytes_accessed=(
                (th + 2) * bsz * n_i * w_len * c * x.dtype.itemsize
                + bsz * h * w_len * cout * x.dtype.itemsize
            ),
            transcendentals=bsz * h * w_len * c if apply_silu else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    y, st = kernel(
        x, x, x,  # prev/cur/next row blocks of the same array
        a.astype(jnp.float32), b.astype(jnp.float32),
        w.astype(x.dtype), bias.reshape(1, -1).astype(jnp.float32),
        residual,
    )
    if not emit_stats:
        return y
    return y, st[:, 0, :], st[:, 1, :]


def fused_train_mode():
    """Whether the TRAINING path routes ResNet convs through the fused
    kernel (custom_vjp below). Default: on for TPU (measured +11% on
    the 256px train step — XLA's thin-channel large-spatial convs run
    far below roofline there); ML_MDM_TPU_FUSED_TRAIN=0 disables,
    =interpret forces the pallas interpreter (CPU tests)."""
    v = os.environ.get("ML_MDM_TPU_FUSED_TRAIN", "auto")
    if v == "0":
        return None
    if v == "interpret":
        return "interpret"
    return "tpu" if jax.default_backend() == "tpu" else None


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def affine_silu_conv3x3_vjp(x, a, b, w, bias, residual,
                            apply_silu=True, interpret=False):
    """Differentiable wrapper of the fused kernel for training paths.

    Forward = affine_silu_conv3x3 (Pallas). Backward: the data gradient
    is itself a 3x3 stride-1 conv (flipped, channel-transposed kernel),
    so it reuses the same Pallas kernel; the weight gradient uses XLA's
    conv-grad; affine/bias gradients are spatial reductions. The silu
    input is recomputed from x (cheap elementwise) — no activation
    stash beyond the primals.
    """
    return affine_silu_conv3x3(
        x, a, b, w, bias, residual,
        apply_silu=apply_silu, interpret=interpret,
    )


def _vjp_fwd(x, a, b, w, bias, residual, apply_silu, interpret):
    y = affine_silu_conv3x3(
        x, a, b, w, bias, residual,
        apply_silu=apply_silu, interpret=interpret,
    )
    return y, (x, a, b, w, residual is not None)


def _vjp_bwd(apply_silu, interpret, saved, dy):
    x, a, b, w, has_res = saved
    f32 = jnp.float32
    # A/B note (v5e, train256): computing this chain in bf16 measured
    # SLOWER than f32 (5.28 vs 5.52 steps/s) — XLA fuses the f32 chain
    # into the consuming reductions better than it handles the extra
    # converts the bf16 version adds at the Pallas boundaries.
    cd = jnp.float32
    a_c = a.astype(cd)[:, None, None, :]
    b_c = b.astype(cd)[:, None, None, :]
    v = x.astype(cd) * a_c + b_c
    if apply_silu:
        sig = jax.nn.sigmoid(v)
        s_store = v * sig
        dact = sig * (1.0 + v * (1.0 - sig))
    else:
        s_store = v
        dact = None

    # data gradient: conv3x3 of dy with the flipped, channel-transposed
    # kernel — same Pallas kernel as the forward
    wT = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    if interpret or fused_mode() is not None:
        ds = affine_silu_conv3x3(
            dy,
            jnp.ones((dy.shape[0], dy.shape[-1]), f32),
            jnp.zeros((dy.shape[0], dy.shape[-1]), f32),
            wT, jnp.zeros((w.shape[2],), f32), None,
            apply_silu=False, interpret=interpret,
        )
    else:
        ds = jax.lax.conv_general_dilated(
            dy, wT.astype(dy.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    dv = ds.astype(cd) * dact if dact is not None else ds.astype(cd)
    dx = (dv * a_c).astype(x.dtype)
    da = jnp.sum(dv * x.astype(cd), axis=(1, 2), dtype=f32).astype(a.dtype)
    db = jnp.sum(dv, axis=(1, 2), dtype=f32).astype(b.dtype)
    dbias = jnp.sum(dy, axis=(0, 1, 2), dtype=f32)

    # weight gradient via XLA's conv-grad (correlation of the stored
    # activation with dy); runs in the primal dtype — the MXU still
    # accumulates in f32 internally
    _, pull = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            s_store.astype(x.dtype), w_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        w.astype(x.dtype),
    )
    (dw,) = pull(dy.astype(x.dtype))
    dres = dy if has_res else None
    return dx, da, db, dw.astype(w.dtype), dbias.astype(f32), dres


affine_silu_conv3x3_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def reference_affine_silu_conv3x3(x, a, b, w, bias, residual=None,
                                  apply_silu=True):
    """Pure-XLA reference used for testing the kernel."""
    v = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    if apply_silu:
        v = jax.nn.silu(v)
    y = jax.lax.conv_general_dilated(
        v.astype(x.dtype), w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)
