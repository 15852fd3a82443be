"""Exact space-to-depth execution of small-channel 3x3 convolutions.

TPU matrix units contract over 128-lane channel blocks; the thin outer
shells of the Matryoshka models (32-64 channels at 512-1024px,
cc12m_1024x1024.yaml) pad both conv operands 2-4x, capping those layers
near 6% of peak. Folding a 2x2 spatial block into channels
((B,H,W,C) -> (B,H/2,W/2,4C)) and rewriting each stride-1 3x3 conv with
an equivalent sparse (3,3,4C_in,4C_out) kernel computes the SAME
function with full-width MXU operands — ~4x fewer padded FLOPs.

Packed channel order is c*4 + (di*2+dj) (c-major), chosen so that:
- GroupNorm groups stay contiguous (group [c0,c1) -> [4c0,4c1)), making
  packed GroupNorm statistics exactly the original statistics;
- per-channel FiLM scale/shift and conv biases pack as jnp.repeat(v, 4).

Derivation of the kernel transform: an output pixel at original row
y=2i+di reads original rows y+dy, dy in {-1,0,1}. In packed space that
row lives in packed cell i+ky with sub-position ei, where
dy = 2*ky + ei - di. Hence for every (ky, ei, di) with dy in {-1,0,1},
W_packed[ky+1, kx+1, cin*4 + ei*2+ej, cout*4 + di*2+dj]
    = W[dy+1, dx+1, cin, cout],  (and 0 elsewhere).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/2,W/2,4C), channel order c*4 + di*2 + dj."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h/2, w/2, c, di, dj)
    return x.reshape(b, h // 2, w // 2, c * 4)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    b, hh, ww, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, hh, ww, c, 2, 2)
    y = y.transpose(0, 1, 4, 2, 5, 3)  # (b, h/2, di, w/2, dj, c)
    return y.reshape(b, hh * 2, ww * 2, c)


def _pack_index(c: int, di: int, dj: int) -> int:
    return c * 4 + di * 2 + dj


def _tap_pick(kernel: jnp.ndarray, pad: int):
    """Returns pick(dy, dx) -> (Cin, Cout) tap of the zero-padded
    kernel — a STATIC slice. All kernel-transform builders below use
    static picks + stack + transpose only: the previous .at[].set
    formulation lowered to sort-based scatters which XLA re-ran per
    conv call (profiled ~10% of the 1024px forward)."""
    kpad = jnp.pad(kernel, ((pad, pad), (pad, pad), (0, 0), (0, 0)))

    def pick(dy: int, dx: int):
        return kpad[dy + 1 + pad, dx + 1 + pad]

    return pick


def pack_conv3x3_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) HWIO -> (3,3,4Cin,4Cout) packed equivalent."""
    _, _, cin, cout = kernel.shape
    pick = _tap_pick(kernel, 2)
    rows = []
    for ky in (-1, 0, 1):
        cols = []
        for kx in (-1, 0, 1):
            sub = []
            for ei in (0, 1):
                for ej in (0, 1):
                    for di in (0, 1):
                        for dj in (0, 1):
                            sub.append(
                                pick(2 * ky + ei - di, 2 * kx + ej - dj)
                            )
            cols.append(jnp.stack(sub))  # (16, Cin, Cout)
        rows.append(jnp.stack(cols))
    t = jnp.stack(rows).reshape(3, 3, 2, 2, 2, 2, cin, cout)
    # -> (ky, kx, cin, ei, ej, cout, di, dj): row = cin*4 + ei*2+ej,
    # col = cout*4 + di*2+dj
    t = t.transpose(0, 1, 6, 2, 3, 7, 4, 5)
    return t.reshape(3, 3, 4 * cin, 4 * cout)


def pack_conv1x1_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(1,1,Cin,Cout) -> (1,1,4Cin,4Cout): block-diagonal per
    sub-position (a 1x1 conv never crosses pixels)."""
    _, _, cin, cout = kernel.shape
    eye = jnp.eye(4, dtype=kernel.dtype)
    out = jnp.einsum("io,ab->iaob", kernel[0, 0], eye)
    return out.reshape(1, 1, 4 * cin, 4 * cout)


def pack_channel_vector(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector (bias / FiLM scale / GN scale) -> packed."""
    return jnp.repeat(v, 4, axis=-1)


def packed_conv(x_packed: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray = None, fast: bool = False,
                pk: jnp.ndarray = None) -> jnp.ndarray:
    """3x3 (or 1x1) conv on the packed representation. kernel is the
    ORIGINAL unpacked HWIO kernel; transform happens here unless ``pk``
    provides it precomputed (wcached callers hoist the transform out of
    the denoise scan — XLA re-ran it every step otherwise). ``fast``
    routes the 3x3 case through the Pallas fused-conv kernel
    (forward-only — no autodiff; eval paths only); its ``pk`` may be
    the (2, 2, ...) struct form.

    INVARIANT: a 3x3 ``pk`` must be the output of pack_conv3x3_kernel
    (or its _struct_weights combination) for THIS ``kernel`` — the fast
    path assumes the packed structural-zero pattern (packed_struct=True)
    and silently computes the wrong function for a generic dense packed
    kernel."""
    if kernel.shape[0] == 1:
        pk = pack_conv1x1_kernel(kernel) if pk is None else pk
        pad = "VALID"
    else:
        if fast:
            from ml_mdm_tpu.ops.fused_resnet import conv3x3_fast

            return conv3x3_fast(
                x_packed,
                pack_conv3x3_kernel(kernel) if pk is None else pk,
                None if bias is None else pack_channel_vector(bias),
                packed_struct=True,
            )
        pk = pack_conv3x3_kernel(kernel) if pk is None else pk
        pad = [(1, 1), (1, 1)]
    y = jax.lax.conv_general_dilated(
        x_packed, pk.astype(x_packed.dtype),
        window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + pack_channel_vector(bias).astype(y.dtype)
    return y


def pack_strided_conv_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 3x3 conv (downsample, flax padding 1) executed on the
    packed input: (3,3,Cin,Cout) -> (2,2,4Cin,Cout). Output lands
    directly on the packed grid (stride 1 there), channels UNPACKED.

    out(i,j) = sum_{dy,dx in [-1,1]} W[dy,dx] * x(2i+dy, 2j+dx); the
    source pixel sits in packed cell (i+ky, j+kx) sub-position (ei,ej)
    with dy = 2*ky + ei, so only ky,kx in {-1,0} contribute."""
    _, _, cin, cout = kernel.shape
    pick = _tap_pick(kernel, 2)
    rows = []
    for ky in (-1, 0):
        cols = []
        for kx in (-1, 0):
            sub = []
            for ei in (0, 1):
                for ej in (0, 1):
                    sub.append(pick(2 * ky + ei, 2 * kx + ej))
            cols.append(jnp.stack(sub))  # (4, Cin, Cout)
        rows.append(jnp.stack(cols))
    t = jnp.stack(rows).reshape(2, 2, 2, 2, cin, cout)
    t = t.transpose(0, 1, 4, 2, 3, 5)  # row = cin*4 + ei*2+ej
    return t.reshape(2, 2, 4 * cin, cout)


def packed_strided_conv(x_packed, kernel, bias=None, pk=None):
    """Downsample conv on the packed rep: (B,S/2,S/2,4Cin) ->
    (B,S/2,S/2,Cout) == stride-2 3x3 conv of the unpacked (B,S,S,Cin)."""
    if pk is None:
        pk = pack_strided_conv_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        x_packed, pk.astype(x_packed.dtype),
        window_strides=(1, 1), padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def upsample_fold_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """The packed-upsample conv kernel: pack_conv3x3_kernel summed over
    the input sub-positions (a conv of a channel-REPEATED input equals
    a conv of the plain input with the kernel pre-summed over repeats).
    Split out so wcached callers can hoist it out of the denoise scan."""
    pk = pack_conv3x3_kernel(kernel)
    kh, kw, cin4, cout4 = pk.shape
    return pk.reshape(kh, kw, cin4 // 4, 4, cout4).sum(axis=3)


def packed_upsample_conv(x, kernel, bias=None, in_packed=False,
                         out_packed=False, fast: bool = False,
                         pk_fold=None):
    """nearest-2x upsample + 3x3 conv, computed packed: x (B,S,S,C) ->
    (B,2S,2S,Cout). The upsampled image packed at the S grid is just a
    4x channel repeat (all four sub-pixels of a cell equal x[i,j]) —
    and a conv of a channel-REPEATED input equals a conv of the plain
    input with the kernel pre-summed over the repeat positions
    (sum_{c4} Wp[c*4+d] xrep[c*4+d] = sum_c (sum_d Wp[c*4+d]) x[c]), so
    the 4x-wide intermediate never materialises: the repeat broadcast
    and 4x the conv input reads were ~1ms/step of the 1024px profile.

    in_packed: x is (B,S/2,S/2,4C), the packed form of the S-side image.
    out_packed: return (B,S,S,4Cout) (the 2S-side image packed at the S
    grid) instead of unpacking — lets the consumer stage run packed with
    zero extra layout moves."""
    if in_packed:
        x = depth_to_space(x)
    if pk_fold is None:
        pk_fold = upsample_fold_kernel(kernel)
    pb = None if bias is None else pack_channel_vector(bias)
    if fast:
        from ml_mdm_tpu.ops.fused_resnet import conv3x3_fast

        y = conv3x3_fast(x, pk_fold, pb)
    else:
        y = jax.lax.conv_general_dilated(
            x, pk_fold.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if pb is not None:
            y = y + pb.astype(y.dtype)
    return y if out_packed else depth_to_space(y)


def pack_strided_conv_kernel_p2p(kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 3x3 conv (downsample) executed packed-in -> packed-out:
    (3,3,Cin,Cout) -> (3,3,4Cin,4Cout), applied with stride 2 on the
    input packed grid.

    Output packed cell i holds downsampled rows I in {2i, 2i+1};
    D(I) = sum_dy W[dy] x(2I+dy); source original row r = 4i+2di+dy
    lives in input packed cell p = 2i+ky sub-position ei with
    dy = 2(ky-di)+ei. For |dy|<=1 that gives ky in {-1,0,1}: a 3x3
    stride-2 conv over packed cells."""
    _, _, cin, cout = kernel.shape
    pick = _tap_pick(kernel, 4)
    rows = []
    for ky in (-1, 0, 1):
        cols = []
        for kx in (-1, 0, 1):
            sub = []
            for ei in (0, 1):
                for ej in (0, 1):
                    for di in (0, 1):
                        for dj in (0, 1):
                            sub.append(pick(2 * (ky - di) + ei,
                                            2 * (kx - dj) + ej))
            cols.append(jnp.stack(sub))  # (16, Cin, Cout)
        rows.append(jnp.stack(cols))
    t = jnp.stack(rows).reshape(3, 3, 2, 2, 2, 2, cin, cout)
    t = t.transpose(0, 1, 6, 2, 3, 7, 4, 5)
    return t.reshape(3, 3, 4 * cin, 4 * cout)


def packed_strided_conv_p2p(x_packed, kernel, bias=None, pk=None):
    """Downsample conv, packed to packed: (B,S/2,S/2,4Cin) ->
    (B,S/4,S/4,4Cout) == packed(stride-2 3x3 conv of the (B,S,S,Cin)
    image). One MXU conv, no layout moves on either side."""
    if pk is None:
        pk = pack_strided_conv_kernel_p2p(kernel)
    y = jax.lax.conv_general_dilated(
        x_packed, pk.astype(x_packed.dtype),
        window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + pack_channel_vector(bias).astype(y.dtype)
    return y
