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
    XLA path elsewhere. Declared in ml_mdm_tpu.perf (single source of
    truth for all perf gates)."""
    from ml_mdm_tpu.perf import perf, resolve_kernel_mode

    return resolve_kernel_mode(perf().fused)


def conv3x3_fast(x, w, bias, residual=None, packed_struct=False):
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
        packed_struct=packed_struct,
    )


# scratch column frame width. The data columns start at _F so the act
# phase's scratch STORES are sublane-aligned (a frame of 1 put every
# store at sublane offset 1 — measured ~0.1-0.25 ms/call of pure VPU
# rotation work at 512^2x128 on v5e). Only cols _F-1 and w+_F need the
# zero, but the whole frames are zeroed once per kernel launch anyway.
_F = 8


def _struct_masks(th, w_len, c, dtype=jnp.int32):
    """Lane-parity masks for the structured packed-tap dots. Packed
    channel order is c*4 + ei*2 + ej (space_to_depth.py): ei (sub-row)
    is lane bit 1, ej (sub-col) lane bit 0."""
    lane_row = jax.lax.broadcasted_iota(dtype, (th, w_len + 2, c), 2)
    lane_col = jax.lax.broadcasted_iota(dtype, (th, w_len, c), 2)
    ei_mask = ((lane_row >> 1) & 1) == 1
    ej_mask = (lane_col & 1) == 1
    return ei_mask, ej_mask


def _struct_dots(s_block, wq, th, w_len, acc):
    """4 structured dots over a zero-framed activated block.

    A space-to-depth packed 3x3 kernel (space_to_depth.pack_conv3x3_
    kernel) is 75% structural zeros: tap ky=-1 only maps input sub-row
    ei=1 to output sub-row di=0, ky=+1 the reverse, and likewise for
    columns. The three row taps therefore collapse to TWO — the dense
    centre tap, and a combined boundary tap whose input row is a
    lane-parity SELECT of the rows above/below (the weights simply add
    because their nonzero lanes are disjoint) — and the same again for
    columns: 4 MXU dots instead of 9, all at full 128-lane width.
    ``wq`` is the (2, 2, C, Cout) pre-combined kernel from
    _struct_weights; s_block is scratch rows [0, th+2) with the one-row
    halos at 0 and th+1 and the zero column frame.
    """
    c = s_block.shape[-1]
    ei_mask, ej_mask = _struct_masks(th, w_len, c)
    buf_a = s_block[1:th + 1, :, :]
    buf_b = jnp.where(ei_mask, s_block[0:th, :, :],
                      s_block[2:th + 2, :, :])
    for widx, buf in ((0, buf_a), (1, buf_b)):
        xc = buf[:, 1:w_len + 1, :]
        part = jax.lax.dot_general(
            xc.reshape(th * w_len, c), wq[widx, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
        xb = jnp.where(ej_mask, buf[:, 0:w_len, :],
                       buf[:, 2:w_len + 2, :])
        acc = acc + jax.lax.dot_general(
            xb.reshape(th * w_len, c), wq[widx, 1],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _struct_weights(wp):
    """(3, 3, C, Cout) packed kernel -> (2, 2, C, Cout) combined taps
    for _struct_dots. Exact for kernels from pack_conv3x3_kernel (and
    their spatial-flip/io-transpose, which preserves the structure)."""
    return jnp.stack([
        jnp.stack([wp[1, 1], wp[1, 0] + wp[1, 2]]),
        jnp.stack([wp[0, 1] + wp[2, 1],
                   wp[0, 0] + wp[0, 2] + wp[2, 0] + wp[2, 2]]),
    ])


def _kernel(*args, th: int, n_ops: int, apply_silu: bool,
            with_residual: bool, emit_stats: bool, emit_proj: bool,
            halo_rows: bool = True, packed_struct: bool = False):
    """One grid step computes TH output rows of one batch element.

    Generalised over N input operands (N=2 executes a skip-concat conv
    as summed per-operand dots — the concatenated tensor never exists
    in HBM). Ref layout (positional, per the in_specs assembly in
    affine_silu_conv3x3):

      per op k: prev_k, cur_k, next_k — (1, TH, W, Ck) row block i and
          (1, 1, W, Ck) SINGLE-row halos (the last row of block i-1 /
          first row of block i+1; index maps clamp at the image border
          and the duplicated edge rows are masked to zero, matching
          conv padding=1). One-row halos keep HBM input reads at
          (1 + 2/TH)x instead of 3x.
      per op k: a_k, b_k — (B, Ck) f32 whole-array per-(batch, channel)
          affine
      per op k: w_k — (3, 3, Ck, Cout)
      bias_ref: (1, Cout) whole-array
      res_ref:  (1, TH, W, Cout) residual to add (zeros when unused)
      per op k (emit_proj): rk_k — (Ck, Cout2) 1x1-conv kernel applied
          to the RAW input (the ResNet conv3 shortcut projection rides
          the same pass instead of re-reading the operands)
      rbias_ref (emit_proj): (1, Cout2)
    Outputs:
      out_ref:  (1, TH, W, Cout)
      st_ref:   (1, 8, Cout) f32 — accumulated stats of the OUTPUT for
          the next GroupNorm: row 0 the sum, row 1 the sum of squares
          (the block revisits across row-block grid steps, accumulating
          in VMEM; a separate stats pass over the activation never runs)
      proj_ref (emit_proj): (1, TH, W, Cout2)
    Scratch:
      s_k per op: (TH+2, W+2*_F, Ck) VMEM: silu(x*a+b), data columns at
          [_F, W+_F) so stores stay sublane-aligned, zero-framed. Only
          the BORDER is zeroed (columns once — scratch persists across
          grid steps — halo rows per step); zeroing the whole block
          each step was pure VPU/VMEM waste.
    """
    idx = 0
    prevs = []
    curs = []
    nexts = []
    for _ in range(n_ops):
        prevs.append(args[idx])
        curs.append(args[idx + 1])
        nexts.append(args[idx + 2])
        idx += 3
    a_refs = []
    b_refs = []
    for _ in range(n_ops):
        a_refs.append(args[idx])
        b_refs.append(args[idx + 1])
        idx += 2
    w_refs = args[idx:idx + n_ops]
    idx += n_ops
    bias_ref = args[idx]
    res_ref = args[idx + 1]
    idx += 2
    if emit_proj:
        rk_refs = args[idx:idx + n_ops]
        rbias_ref = args[idx + n_ops]
        idx += n_ops + 1
    out_ref = args[idx]
    st_ref = args[idx + 1]
    idx += 2
    if emit_proj:
        proj_ref = args[idx]
        idx += 1
    s_refs = args[idx:idx + n_ops]

    bi = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    w_len = curs[0].shape[2]
    first = jnp.logical_and(bi == 0, i == 0)

    acc = None
    acc2 = None
    for k in range(n_ops):
        a = a_refs[k][bi, :].astype(jnp.float32)
        b = b_refs[k][bi, :].astype(jnp.float32)
        s_ref = s_refs[k]

        def act(rows, a=a, b=b, s_ref=s_ref):
            v = rows.astype(jnp.float32) * a + b
            if apply_silu:
                v = jax.nn.silu(v)
            return v.astype(s_ref.dtype)

        # border columns: zeroed ONCE (nothing else writes them; the
        # corner cells of the halo rows stay zero for the same reason)
        @pl.when(first)
        def _(s_ref=s_ref):
            s_ref[:, 0:_F, :] = jnp.zeros_like(s_ref[:, 0:_F, :])
            s_ref[:, w_len + _F:w_len + 2 * _F, :] = jnp.zeros_like(
                s_ref[:, 0:_F, :]
            )

        s_ref[1:th + 1, _F:w_len + _F, :] = act(curs[k][0])

        zero_row = jnp.zeros_like(s_ref[0, _F:w_len + _F, :])

        @pl.when(i > 0)
        def _(k=k, act=act, s_ref=s_ref):
            s_ref[0, _F:w_len + _F, :] = act(
                prevs[k][0, 0 if halo_rows else th - 1, :, :]
            )

        @pl.when(i == 0)
        def _(s_ref=s_ref, zero_row=zero_row):
            s_ref[0, _F:w_len + _F, :] = zero_row

        @pl.when(i < n_i - 1)
        def _(k=k, act=act, s_ref=s_ref):
            s_ref[th + 1, _F:w_len + _F, :] = act(nexts[k][0, 0, :, :])

        @pl.when(i == n_i - 1)
        def _(s_ref=s_ref, zero_row=zero_row):
            s_ref[th + 1, _F:w_len + _F, :] = zero_row

        # 9 taps as MXU dots; accumulate in registers, one VMEM write.
        # (A/B note: pre-shifting the three dx column windows into
        # aligned scratch buffers to avoid sublane-offset READS measured
        # NO change on v5e — Mosaic handles the offset slices well. The
        # offset STORES were not free, hence the _F-aligned frame.)
        if packed_struct:
            acc = _struct_dots(
                s_ref[0:th + 2, _F - 1:w_len + _F + 1, :], w_refs[k],
                th, w_len, acc)
        else:
            for dy in range(3):
                for dx in range(3):
                    tile = s_ref[dy:dy + th,
                                 _F - 1 + dx:_F - 1 + dx + w_len, :]
                    part = jax.lax.dot_general(
                        tile.reshape(th * w_len, tile.shape[-1]),
                        w_refs[k][dy, dx, :, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part

        if emit_proj:
            raw = curs[k][0]
            part2 = jax.lax.dot_general(
                raw.reshape(th * w_len, raw.shape[-1]).astype(s_ref.dtype),
                rk_refs[k][:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc2 = part2 if acc2 is None else acc2 + part2

    y = acc.reshape(th, w_len, -1) + bias_ref[0, :].astype(jnp.float32)
    if with_residual:
        y = y + res_ref[0].astype(jnp.float32)
    out_ref[0, :, :, :] = y.astype(out_ref.dtype)
    if emit_proj:
        p = acc2.reshape(th, w_len, -1) + rbias_ref[0, :].astype(
            jnp.float32
        )
        proj_ref[0, :, :, :] = p.astype(proj_ref.dtype)
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


def _kernel_pipelined(*args, th: int, n_ops: int, apply_silu: bool,
                      with_residual: bool, emit_stats: bool,
                      emit_proj: bool, packed_struct: bool = False):
    """Software-pipelined variant: the grid has ONE extra step; step ii
    activates row block ii into scratch buffer ii%2 (VPU work) while the
    9 conv taps dot row block ii-1 out of the OTHER buffer (MXU work).
    The two phases are independent and live in ONE straight-line region
    (buffer selection by dynamic index, boundaries by mask multiplies,
    never pl.when), so Mosaic's scheduler co-issues the silu chain with
    the matmuls. Measured on v5e (512^2 x 128ch): a standalone probe
    fully hides an independent act behind the dots (1.61 vs 1.61+0.86
    ms); the same probe with the phases split into pl.when parity
    branches overlaps NOTHING — predicated regions are scheduling
    barriers, which is why the first cut of this kernel (two scratch
    refs + parity branches) measured at serial speed.

    Boundary handling is branch-free: the act of the final (drained)
    step re-activates the last block into the dead buffer, the dot of
    step 0 reads uninitialised scratch into output block 0 (rewritten at
    step 1) and into the stats accumulator (reset via a NaN-safe
    jnp.where at step 1), and the halo rows are masked by multiply
    instead of predication.

    Argument layout is the serial kernel's, with one addition: when
    emit_proj, each operand contributes a 4th block ref ``raw`` — the
    UN-activated row block ii-1, re-delivered for the 1x1 shortcut dot
    (the activated scratch holds silu(x*a+b), not x).
    """
    idx = 0
    prevs, curs, nexts, raws = [], [], [], []
    for _ in range(n_ops):
        prevs.append(args[idx])
        curs.append(args[idx + 1])
        nexts.append(args[idx + 2])
        idx += 3
        if emit_proj:
            raws.append(args[idx])
            idx += 1
    a_refs = []
    b_refs = []
    for _ in range(n_ops):
        a_refs.append(args[idx])
        b_refs.append(args[idx + 1])
        idx += 2
    w_refs = args[idx:idx + n_ops]
    idx += n_ops
    bias_ref = args[idx]
    res_ref = args[idx + 1]
    idx += 2
    if emit_proj:
        rk_refs = args[idx:idx + n_ops]
        rbias_ref = args[idx + n_ops]
        idx += n_ops + 1
    out_ref = args[idx]
    st_ref = args[idx + 1]
    idx += 2
    if emit_proj:
        proj_ref = args[idx]
        idx += 1
    # one double-buffered scratch per operand: (2, th+2, w+2*_F, c)
    s_refs = args[idx:idx + n_ops]

    bi = pl.program_id(0)
    ii = pl.program_id(1)
    n_i = pl.num_programs(1) - 1
    w_len = curs[0].shape[2]
    first = jnp.logical_and(bi == 0, ii == 0)
    par = jax.lax.rem(ii, 2)

    @pl.when(first)
    def _():
        for s_ref in s_refs:
            s_ref[:, :, 0:_F, :] = jnp.zeros_like(s_ref[:, :, 0:_F, :])
            s_ref[:, :, w_len + _F:w_len + 2 * _F, :] = jnp.zeros_like(
                s_ref[:, :, 0:_F, :]
            )

    # --- act phase: activate block min(ii, n_i-1) into buffer ``par``
    # for the NEXT step's dots (dead work at the ii==n_i drain step) ---
    cdt = s_refs[0].dtype
    top_mask = (ii > 0).astype(cdt)
    bot_mask = (ii < n_i - 1).astype(cdt)
    for k in range(n_ops):
        a = a_refs[k][bi, :].astype(jnp.float32)
        b = b_refs[k][bi, :].astype(jnp.float32)

        def act(rows, a=a, b=b):
            v = rows.astype(jnp.float32) * a + b
            if apply_silu:
                v = jax.nn.silu(v)
            return v.astype(cdt)

        s_ref = s_refs[k]
        s_ref[par, 1:th + 1, _F:w_len + _F, :] = act(curs[k][0])
        # halo rows: index maps clamp at the borders; the duplicated
        # edge rows zero out via the mask multiply (conv padding=1)
        s_ref[par, 0, _F:w_len + _F, :] = act(prevs[k][0, 0]) * top_mask
        s_ref[par, th + 1, _F:w_len + _F, :] = (
            act(nexts[k][0, 0]) * bot_mask
        )

    # --- dot phase: output block ii-1 from buffer ``1-par`` (filled by
    # the previous step; garbage at ii==0, rewritten at ii==1) ---
    acc = None
    acc2 = None
    for k in range(n_ops):
        if packed_struct:
            acc = _struct_dots(
                s_refs[k][1 - par, :, _F - 1:w_len + _F + 1, :],
                w_refs[k], th, w_len, acc)
        else:
            for dy in range(3):
                for dx in range(3):
                    tile = s_refs[k][1 - par, dy:dy + th,
                                     _F - 1 + dx:_F - 1 + dx + w_len, :]
                    part = jax.lax.dot_general(
                        tile.reshape(th * w_len, tile.shape[-1]),
                        w_refs[k][dy, dx, :, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
        if emit_proj:
            raw = raws[k][0]
            part2 = jax.lax.dot_general(
                raw.reshape(th * w_len, raw.shape[-1]).astype(cdt),
                rk_refs[k][:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc2 = part2 if acc2 is None else acc2 + part2

    y = acc.reshape(th, w_len, -1) + bias_ref[0, :].astype(jnp.float32)
    if with_residual:
        y = y + res_ref[0].astype(jnp.float32)
    out_ref[0, :, :, :] = y.astype(out_ref.dtype)
    if emit_proj:
        p = acc2.reshape(th, w_len, -1) + rbias_ref[0, :].astype(
            jnp.float32
        )
        proj_ref[0, :, :, :] = p.astype(proj_ref.dtype)
    if emit_stats:
        # reset (NaN-safe: step 0 accumulated uninitialised-scratch
        # garbage) at the first REAL output step of each batch row
        yb = out_ref[0, :, :, :]
        s1 = jnp.sum(yb, axis=(0, 1), dtype=jnp.float32)
        s2 = jnp.sum(yb * yb, axis=(0, 1), dtype=jnp.float32)
        keep = ii != 1
        st_ref[0, 0, :] = jnp.where(keep, st_ref[0, 0, :], 0.0) + s1
        st_ref[0, 1, :] = jnp.where(keep, st_ref[0, 1, :], 0.0) + s2


def _pipelined_mode() -> bool:
    from ml_mdm_tpu.perf import perf

    return perf().fused_pipelined


@functools.partial(
    jax.jit,
    static_argnames=("apply_silu", "tile_h", "interpret", "emit_stats",
                     "halo_rows", "pipelined", "packed_struct"),
)
def affine_silu_conv3x3(x, a, b, w, bias, residual=None, *,
                        apply_silu: bool = True, tile_h=None,
                        interpret: bool = False, emit_stats: bool = False,
                        halo_rows: bool = True, proj_kernel=None,
                        proj_bias=None, pipelined=None,
                        packed_struct: bool = False):
    """y = conv3x3(silu(x*a+b), w, padding=1) + bias [+ residual].

    x: (B, H, W, C); a, b: (B, C) f32; w: (3, 3, C, Cout);
    bias: (Cout,); residual: optional (B, H, W, Cout).

    Each of x/a/b/w (and proj_kernel) may instead be a TUPLE of N
    per-operand values: the op then computes the conv of the CHANNEL
    CONCATENATION silu(concat_k(x_k * a_k + b_k)) without ever
    materialising the concatenated tensor — the up-path skip concats of
    the U-Net (reference unet.py:548-560) execute as summed per-operand
    MXU dots.

    proj_kernel (optional, (C_k, Cout2) per operand) additionally emits
    proj = concat_k(x_k) @ proj_kernel + proj_bias — the ResNet conv3
    1x1 shortcut (reference unet.py:213-215) computed from the operands
    already in VMEM instead of a separate XLA conv that re-reads them.

    packed_struct: set ONLY when w is a space-to-depth packed kernel
    (space_to_depth.pack_conv3x3_kernel, c-major lane order) or its
    flip/io-transpose: exploits the 75% structural zeros by collapsing
    the 9 taps to 4 full-width dots (see _struct_dots) — 2.25x less
    MXU work for the SAME result.

    Returns (B, H, W, Cout) in x.dtype; with emit_stats additionally
    (s1, s2): (B, Cout) f32 sum / sum-of-squares of the output over the
    spatial axes (for the consumer GroupNorm — no separate stats pass);
    with proj_kernel additionally the (B, H, W, Cout2) projection.
    """
    xs = x if isinstance(x, (tuple, list)) else (x,)
    a_s = a if isinstance(a, (tuple, list)) else (a,)
    b_s = b if isinstance(b, (tuple, list)) else (b,)
    ws = w if isinstance(w, (tuple, list)) else (w,)
    n_ops = len(xs)
    emit_proj = proj_kernel is not None
    rks = ()
    if emit_proj:
        rks = (
            proj_kernel
            if isinstance(proj_kernel, (tuple, list))
            else (proj_kernel,)
        )
        assert len(rks) == n_ops
    assert len(a_s) == len(b_s) == len(ws) == n_ops

    x0 = xs[0]
    bsz, h, w_len, _ = x0.shape
    cs = [xi.shape[-1] for xi in xs]
    cout = ws[0].shape[-1]
    want_pipe = (
        _pipelined_mode() if pipelined is None else bool(pipelined)
    )
    if tile_h is None:
        # v5e tile sweep: pipelined best at 16 across 256^2-512^2 and
        # 64-256 channels; the serial kernel was tuned at 8
        tile_h = 16 if want_pipe else 8
    th = min(tile_h, h)
    while h % th:
        th //= 2
    n_i = h // th
    # pipelined variant: overlap act (VPU) with the dots (MXU) — only
    # worth the one-step drain when the grid has a few row blocks
    if pipelined is None:
        pipelined = want_pipe and n_i >= 4
    else:
        pipelined = want_pipe
    pipelined = bool(pipelined) and n_i >= 2

    def blk(ii):
        # row-block index activated at pipeline step ii (clamped drain)
        return jnp.minimum(ii, n_i - 1) if pipelined else ii

    def out_blk(ii):
        # row-block index written at pipeline step ii
        return jnp.maximum(ii - 1, 0) if pipelined else ii

    with_residual = residual is not None
    if residual is None:
        residual = jnp.zeros((bsz, 1, 1, 1), x0.dtype)
        res_spec = pl.BlockSpec((1, 1, 1, 1), lambda bi, ii: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        res_spec = pl.BlockSpec((1, th, w_len, cout),
                                lambda bi, ii: (bi, out_blk(ii), 0, 0),
                                memory_space=pltpu.VMEM)

    in_specs = []
    for c in cs:
        cur_spec = pl.BlockSpec(
            (1, th, w_len, c),
            lambda bi, ii: (bi, blk(ii), 0, 0),
            memory_space=pltpu.VMEM,
        )
        if halo_rows or pipelined:
            # one-row halo blocks (block shape 1 on the row axis => the
            # block index IS the row index): last row of block ii-1,
            # first of ii+1 — HBM input reads (1 + 2/TH)x instead of 3x
            prev_spec = pl.BlockSpec(
                (1, 1, w_len, c),
                lambda bi, ii: (bi, jnp.maximum(blk(ii) * th - 1, 0),
                                0, 0),
                memory_space=pltpu.VMEM,
            )
            next_spec = pl.BlockSpec(
                (1, 1, w_len, c),
                lambda bi, ii: (bi, jnp.minimum((blk(ii) + 1) * th, h - 1),
                                0, 0),
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
        in_specs.extend([prev_spec, cur_spec, next_spec])
        if pipelined and emit_proj:
            # the raw (un-activated) block for the 1x1 shortcut dot runs
            # one step behind the activation — re-delivered per step
            in_specs.append(pl.BlockSpec(
                (1, th, w_len, c),
                lambda bi, ii: (bi, out_blk(ii), 0, 0),
                memory_space=pltpu.VMEM,
            ))
    # a_k, b_k whole-array, then w_k whole-array
    in_specs.extend(
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_ops + n_ops)
    )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # bias
    in_specs.append(res_spec)
    if emit_proj:
        in_specs.extend(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_ops + 1)
        )

    if pipelined:
        kernel = functools.partial(
            _kernel_pipelined, th=th, n_ops=n_ops, apply_silu=apply_silu,
            with_residual=with_residual, emit_stats=emit_stats,
            emit_proj=emit_proj, packed_struct=packed_struct,
        )
        scratch_shapes = [
            pltpu.VMEM((2, th + 2, w_len + 2 * _F, c), x0.dtype)
            for c in cs
        ]
    else:
        kernel = functools.partial(
            _kernel, th=th, n_ops=n_ops, apply_silu=apply_silu,
            with_residual=with_residual, emit_stats=emit_stats,
            emit_proj=emit_proj, halo_rows=halo_rows,
            packed_struct=packed_struct,
        )
        scratch_shapes = [
            pltpu.VMEM((th + 2, w_len + 2 * _F, c), x0.dtype) for c in cs
        ]
    # the stats block revisits (constant index over ii): partial sums
    # accumulate in VMEM and flush to HBM once per batch row
    stat_spec = pl.BlockSpec((1, 8, cout), lambda bi, ii: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, th, w_len, cout),
                     lambda bi, ii: (bi, out_blk(ii), 0, 0),
                     memory_space=pltpu.VMEM),
        stat_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, h, w_len, cout), x0.dtype),
        jax.ShapeDtypeStruct((bsz, 8, cout), jnp.float32),
    ]
    if emit_proj:
        cout2 = rks[0].shape[-1]
        out_specs.append(
            pl.BlockSpec((1, th, w_len, cout2),
                         lambda bi, ii: (bi, out_blk(ii), 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, h, w_len, cout2), x0.dtype)
        )

    c_tot = sum(cs)
    call = pl.pallas_call(
        kernel,
        grid=(bsz, n_i + 1 if pipelined else n_i),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w_len * (
                (4 if packed_struct else 9) * c_tot * cout
                + (c_tot * rks[0].shape[-1] if emit_proj else 0)
            ),
            bytes_accessed=(
                (th + 2) * bsz * n_i * w_len * c_tot * x0.dtype.itemsize
                + bsz * h * w_len * cout * x0.dtype.itemsize
            ),
            transcendentals=bsz * h * w_len * c_tot if apply_silu else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    operands = []
    for xi in xs:
        operands.extend([xi, xi, xi])  # prev/cur/next blocks, same array
        if pipelined and emit_proj:
            operands.append(xi)  # raw block for the shortcut dot
    for ai, bi_ in zip(a_s, b_s):
        operands.extend([ai.astype(jnp.float32), bi_.astype(jnp.float32)])
    if packed_struct:
        # accept pre-combined (2, 2, C, Cout) weights (wcached callers
        # hoist _struct_weights out of the denoise scan)
        ws = tuple(
            wi if wi.shape[0] == 2 else _struct_weights(wi) for wi in ws
        )
    operands.extend([wi.astype(x0.dtype) for wi in ws])
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    operands.append(bias.reshape(1, -1).astype(jnp.float32))
    operands.append(residual)
    if emit_proj:
        operands.extend([rk.astype(x0.dtype) for rk in rks])
        pb = (
            proj_bias
            if proj_bias is not None
            else jnp.zeros((rks[0].shape[-1],), jnp.float32)
        )
        operands.append(pb.reshape(1, -1).astype(jnp.float32))
    outs = call(*operands)
    y, st = outs[0], outs[1]
    ret = [y]
    if emit_stats:
        ret.extend([st[:, 0, :], st[:, 1, :]])
    if emit_proj:
        ret.append(outs[2])
    return ret[0] if len(ret) == 1 else tuple(ret)


def fused_train_mode():
    """Whether the TRAINING path routes ResNet convs through the fused
    kernel (custom_vjp below). Default: on for TPU (measured +11% on
    the 256px train step — XLA's thin-channel large-spatial convs run
    far below roofline there); ML_MDM_TPU_FUSED_TRAIN=0 disables,
    =interpret forces the pallas interpreter (CPU tests)."""
    from ml_mdm_tpu.perf import perf, resolve_kernel_mode

    return resolve_kernel_mode(perf().fused_train)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def affine_silu_conv3x3_vjp(x, a, b, w, bias, residual,
                            apply_silu=True, interpret=False,
                            emit_stats=False, packed_struct=False):
    """Differentiable wrapper of the fused kernel for training paths.

    Forward = affine_silu_conv3x3 (Pallas). Backward: the data gradient
    is itself a 3x3 stride-1 conv (flipped, channel-transposed kernel),
    so it reuses the same Pallas kernel; the weight gradient uses XLA's
    conv-grad; affine/bias gradients are spatial reductions. The silu
    input is recomputed from x (cheap elementwise) — no activation
    stash beyond the primals.

    With ``emit_stats`` the kernel's ride-along per-channel sum /
    sum-of-squares outputs are returned too (for the consumer
    GroupNorm), and their cotangents fold into dy in the backward
    (d s1 = broadcast, d s2 = 2y) — the training path previously
    re-read the full activation with jnp.sum reductions to get these.
    """
    return affine_silu_conv3x3(
        x, a, b, w, bias, residual,
        apply_silu=apply_silu, interpret=interpret,
        emit_stats=emit_stats, packed_struct=packed_struct,
    )


def _vjp_fwd(x, a, b, w, bias, residual, apply_silu, interpret,
             emit_stats, packed_struct):
    out = affine_silu_conv3x3(
        x, a, b, w, bias, residual,
        apply_silu=apply_silu, interpret=interpret,
        emit_stats=emit_stats, packed_struct=packed_struct,
    )
    # the stashed y for the stats cotangent is the kernel OUTPUT, which
    # downstream vjps stash as their input anyway — no extra memory
    y_saved = out[0] if emit_stats else None
    return out, (x, a, b, w, residual is not None, y_saved)


def _vjp_bwd(apply_silu, interpret, emit_stats, packed_struct, saved, g):
    x, a, b, w, has_res, y_saved = saved
    if emit_stats:
        dy, ds1, ds2 = g
        dy = (
            dy.astype(jnp.float32)
            + ds1[:, None, None, :]
            + 2.0 * y_saved.astype(jnp.float32) * ds2[:, None, None, :]
        ).astype(dy.dtype)
    else:
        dy = g
    f32 = jnp.float32
    # A/B note (v5e, train256, <=256px sides): computing this chain in
    # bf16 measured SLOWER than f32 (5.28 vs 5.52 steps/s) — XLA fuses
    # the f32 chain into the consuming reductions better than it handles
    # the extra converts the bf16 version adds at the Pallas boundaries.
    # At 1024px-scale sides the f32 intermediates are 0.5GB each and the
    # trade flips to pure HBM traffic; perf.vjp_chain_bf16_min_side
    # switches the chain to the primal dtype at large sides.
    from ml_mdm_tpu.perf import perf

    _ms = perf().vjp_chain_bf16_min_side
    cd = (
        x.dtype
        if (_ms > 0 and min(x.shape[1], x.shape[2]) >= _ms)
        else jnp.float32
    )
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
    # kernel — same Pallas kernel as the forward (the flip/io-transpose
    # of a packed kernel keeps the packed-struct zero pattern)
    wT = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    if interpret or fused_mode() is not None:
        ds = affine_silu_conv3x3(
            dy,
            jnp.ones((dy.shape[0], dy.shape[-1]), f32),
            jnp.zeros((dy.shape[0], dy.shape[-1]), f32),
            wT, jnp.zeros((w.shape[2],), f32), None,
            apply_silu=False, interpret=interpret,
            packed_struct=packed_struct,
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

    if packed_struct:
        # struct-tap weight gradient: the forward only reads the packed
        # kernel through the linear combine L = _struct_weights (4
        # combined taps), so dw = L^T(d wq) where d wq needs just FOUR
        # tall MXU dots over the same lane-parity-selected buffers the
        # forward uses — the XLA conv-grad here computed the DENSE
        # 9-tap gradient of the 4x-padded packed kernel (2.25x the
        # FLOPs, at thin-shell conv-grad efficiency). Exact: the
        # composite d/dW [struct(x, L(pack(W)))] == d/dW [conv(x,
        # pack(W))] because the functions agree on pack's image.
        dw = _struct_wgrad(s_store.astype(x.dtype), dy.astype(x.dtype))
    else:
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


def _struct_wgrad(s, dy):
    """(3, 3, C, Cout) packed-kernel cotangent from 4 MXU dots.

    s: (B, H, W, C) activated input (silu(x*a+b)); dy: (B, H, W, Cout).
    Computes d wq for the 4 combined struct taps (same lane-parity
    selected buffers as _struct_dots, shifts zero-padded == conv
    padding 1), then scatters through L^T (_struct_weights' transpose):
    each packed tap that L summed into a combined tap receives that
    combined tap's cotangent."""
    c = s.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (c,), 0)
    ei = ((lane >> 1) & 1) == 1  # packed sub-row bit
    ej = (lane & 1) == 1         # packed sub-col bit

    def up(t):     # t[r-1], zero top row
        return jnp.pad(t, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]

    def down(t):   # t[r+1], zero bottom row
        return jnp.pad(t, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]

    def left(t):   # t[:, j-1], zero first col
        return jnp.pad(t, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]

    def right(t):  # t[:, j+1], zero last col
        return jnp.pad(t, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]

    buf_a = s
    buf_b = jnp.where(ei, up(s), down(s))
    dwq = []
    for buf in (buf_a, buf_b):
        xc = buf
        xb = jnp.where(ej, left(buf), right(buf))
        dwq.append([
            jnp.einsum("bhwc,bhwo->co", xc, dy,
                       preferred_element_type=jnp.float32),
            jnp.einsum("bhwc,bhwo->co", xb, dy,
                       preferred_element_type=jnp.float32),
        ])
    # L^T: dwp[1,1]=dwq[a,center]; dwp[1,0]=dwp[1,2]=dwq[a,bound];
    # dwp[0,1]=dwp[2,1]=dwq[b,center]; corners = dwq[b,bound]
    ac, ab = dwq[0]
    bc, bb = dwq[1]
    return jnp.stack([
        jnp.stack([bb, bc, bb]),
        jnp.stack([ab, ac, ab]),
        jnp.stack([bb, bc, bb]),
    ])


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
