"""Building blocks for the TPU U-Net (Flax linen, NHWC).

Semantics match the reference blocks (cited per class against
/root/reference/ml-mdm-matryoshka/ml_mdm/models/unet.py) but the
implementation is TPU-first:

- NHWC layout (native for TPU convolutions);
- attention runs as batched einsums over (B, L, H, D) with fp32 softmax —
  swap-in Pallas flash attention via ``ml_mdm_tpu.ops.attention``;
- norm statistics computed in fp32 regardless of compute dtype;
- zero-initialised output projections (same trick the reference uses:
  residual branches start as identity).

Parameter tree naming deliberately mirrors the torch module names with
dots flattened to underscores (``down_blocks.0.resnets.1.conv1`` →
``down_blocks_0 / resnets_1 / conv1``) so checkpoint conversion is a
mechanical rename + layout transpose (see utils/torch_compat.py).
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ml_mdm_tpu.ops.attention import dot_product_attention

Dtype = Any

zeros_init = nn.initializers.zeros
default_kernel_init = nn.initializers.lecun_normal()


def _fused_resnet_mode():
    """See ops/fused_resnet.fused_mode (eval-only Pallas conv path)."""
    from ml_mdm_tpu.ops.fused_resnet import fused_mode

    return fused_mode()


def _fused_proj_enabled() -> bool:
    """Whether the ResNet conv3 1x1 shortcut rides the fused conv1
    kernel (emit_proj) instead of running as a separate XLA conv that
    re-reads the input. ML_MDM_TPU_FUSED_PROJ=0 disables."""
    from ml_mdm_tpu.perf import perf

    return perf().fused_proj


def _fused_min_side() -> int:
    """Minimum spatial side for the fused conv / Pallas GN-stats paths
    (ML_MDM_TPU_FUSED_MIN_SIDE; see ml_mdm_tpu.perf)."""
    from ml_mdm_tpu.perf import perf

    return perf().fused_min_side


def conv_tag(y):
    """Tag a conv output with its PHYSICAL spatial side for the
    selective remat policy (trainer.make_remat_policy): under
    `jax.checkpoint`, small-side conv outputs (the compute-dense inner
    towers of a nested model) are SAVED while the huge thin-shell
    activations rematerialise — memory lives in the big tensors, FLOPs
    in the small ones, so this recovers most of no-remat's speed at a
    fraction of its memory. Identity (and free) outside jax.checkpoint.
    """
    from jax.ad_checkpoint import checkpoint_name

    side = min(int(y.shape[1]), int(y.shape[2])) if y.ndim >= 3 else 0
    return checkpoint_name(y, f"conv_s{side}")


def _channel_offsets(cs):
    """[c0, c1, ...] -> [0, c0, c0+c1, ...] (operand split bounds)."""
    offs = [0]
    for c in cs:
        offs.append(offs[-1] + c)
    return offs


def wcached(mod, key: str, fn):
    """Read-through cache for packed-weight transforms ('wcache'
    collection). Inside a jitted denoise scan XLA re-materialises the
    space-to-depth kernel transforms EVERY step (profiled r4 at 1024px:
    ~5 ms/step of reshape/copy once the 64ch stages packed). Samplers
    build the collection once per program via Model.build_wcache — a
    pre-scan forward under mutable=['wcache'] whose model compute XLA
    dead-code-eliminates, leaving only the transforms — and pass it
    back in, so in-scan applies just read the cached tensors. Uncached
    callers (training, standalone evals) compute inline: identical
    values either way."""
    if mod.has_variable("wcache", key):
        return mod.get_variable("wcache", key)
    val = fn()
    if not mod.is_initializing() and mod.is_mutable_collection("wcache"):
        mod.put_variable("wcache", key, val)
    return val


@dataclass
class ResNetConfig:
    """Mirrors reference ResNetConfig (unet.py:44-59)."""

    num_channels: int = -1
    output_channels: int = -1
    num_groups_norm: int = 32
    dropout: float = 0.0
    use_attention_ffn: bool = False


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbour upsample in NHWC (== F.interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


class Conv3x3(nn.Module):
    features: int
    stride: int = 1
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = zeros_init if self.zero_init else default_kernel_init
        return nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            kernel_init=init,
            bias_init=zeros_init,
            dtype=self.dtype,
            name=None,
        )(x)


class GroupNormF32(nn.Module):
    """GroupNorm restructured for TPU memory traffic (profiled on v5e:
    GN stats + elementwise were 74% of the flagship forward, convs 18%).

    - statistics in ONE pass over the activation: mean and mean-of-
      squares are sibling reductions over the same input (XLA fuses
      them into a single read), accumulated in fp32 via reduction
      dtype — no fp32 copy of the activation is ever materialised;
    - the normalise itself collapses to a single fused multiply-add in
      the input dtype: y = x*a + b with per-(batch, channel) fp32
      coefficients a = scale/std, b = bias - mean*scale/std (tiny
      tensors). ``affine_coeffs`` exposes (a, b) so callers (ResNet)
      can fold FiLM time-conditioning into the same FMA."""

    num_groups: int = 32

    def __call__(self, x):
        a, b = self.affine_coeffs(x)
        return (x * a.astype(x.dtype) + b.astype(x.dtype)).astype(x.dtype)

    @nn.compact
    def affine_coeffs(self, x):
        """(a, b) with y = x*a + b == GroupNorm(x)*scale + bias.
        Shapes: (B, 1, ..., C) fp32."""
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_coeffs(x, scale, bias, self.num_groups)


def group_norm_coeffs(x, scale, bias, g, eps: float = 1e-5):
    """Pure-function core of GroupNormF32.affine_coeffs (also used by the
    space-to-depth packed ResNet path with repeated scale/bias).

    Variance strategy is dtype-principled: for bf16 inputs the one-pass
    E[x^2]-mean^2 form (single fused HBM read for both reductions) is as
    accurate as the data allows — bf16 quantisation already exceeds the
    f32 cancellation error. For f32 inputs the centered two-pass form is
    used: there the cancellation at large mean/std WOULD lose real
    precision, and f32 models are the CPU/parity path where bandwidth
    does not matter."""
    c = x.shape[-1]
    b_, cg = x.shape[0], c // g
    ones = (1,) * (len(x.shape) - 2)
    spatial = tuple(range(1, x.ndim - 1))
    n = cg
    for ax in spatial:
        n *= x.shape[ax]
    if x.dtype == jnp.bfloat16:
        # Two-stage reduction that never reshapes the big tensor: sum
        # over the spatial axes of the plain NHWC activation (f32
        # accumulation over bf16 reads), then group-fold the tiny (B,C)
        # partials. Reshaping (B,H,W,C)->(B,H,W,g,c') before reducing
        # forces XLA to materialise (and relayout) the activation out of
        # its conv-tiled layout — profiled as the dominant HBM cost of
        # the packed 1024px shells. The square runs in bf16 (~2^-9
        # relative noise per element, averaged down by the huge group
        # size); both accumulations stay f32 via the reduction dtype.
        # On TPU the sums run as a Pallas streaming kernel: XLA's own
        # fused spatial reduce measured ~7% of HBM peak, ~23% of the
        # 64px sampling step (ops/gn_stats.py).
        from ml_mdm_tpu.ops.gn_stats import gn_stats_mode, spatial_sums

        # same large-spatial gate as the fused conv path: at 64px XLA's
        # native reduce is competitive and Pallas boundaries cost layout
        # copies; at >=128px sides (packed shells are all-Pallas, plain
        # layout) the streaming kernel wins
        big = (
            x.ndim == 4
            and min(x.shape[1], x.shape[2]) >= _fused_min_side()
        )
        mode = gn_stats_mode() if big else None
        if mode is not None:
            s1, s2 = spatial_sums(x, mode == "interpret")
        else:
            # NOTE: do NOT split these reductions out of the producing
            # conv's fusion (e.g. with optimization_barrier): A/B on
            # v5e measured the fused conv+stats epilogue FASTER than
            # conv + separate stats pass (7.32 vs 7.00 samples/s on the
            # 64px preset) — the epilogue rides the conv's output
            # writeback instead of re-reading the activation.
            s1 = jnp.sum(x, axis=spatial, dtype=jnp.float32)  # (B, C)
            s2 = jnp.sum(
                jnp.square(x.astype(jnp.float32)), axis=spatial,
                dtype=jnp.float32,
            )
        mean = s1.reshape(b_, g, cg).sum(-1, keepdims=True) / n  # (B,g,1)
        msq = s2.reshape(b_, g, cg).sum(-1, keepdims=True) / n
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
    else:
        # centered two-pass form: f32 inputs are the CPU/parity path
        # where the E[x^2]-mean^2 cancellation WOULD lose real precision
        # and bandwidth does not matter
        xg = x.reshape(x.shape[:-1] + (g, cg))
        red = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean4 = jnp.mean(xg, axis=red, keepdims=True, dtype=jnp.float32)
        var4 = jnp.mean(
            jnp.square(xg.astype(jnp.float32) - mean4),
            axis=red, keepdims=True, dtype=jnp.float32,
        )
        mean = mean4.reshape(b_, g, 1)
        var = var4.reshape(b_, g, 1)
    return _gn_affine_from_moments(mean, var, scale, bias, b_, g, cg,
                                   ones, eps)


def _gn_affine_from_moments(mean, var, scale, bias, b_, g, cg, ones,
                            eps: float):
    """(B,g,1) moments -> broadcastable (a, b) affine coefficients."""
    c = g * cg
    inv = jax.lax.rsqrt(var + eps)  # (B, g, 1)
    inv_c = jnp.broadcast_to(inv, (b_, g, cg)).reshape((b_,) + ones + (c,))
    mean_c = jnp.broadcast_to(mean, (b_, g, cg)).reshape(
        (b_,) + ones + (c,)
    )
    a = inv_c * scale
    b = bias - mean_c * a
    return a, b


def group_norm_coeffs_concat(xs, scale, bias, g, eps: float = 1e-5):
    """GroupNorm affine coefficients of the CHANNEL CONCATENATION of
    ``xs`` — without materialising it. Per-operand spatial sums feed the
    shared group moments (E[x^2]-mean^2 form, f32 accumulation — the
    consumers are the bf16 fused eval paths, where this matches
    group_norm_coeffs' bf16 branch numerics). Used by the lazy
    skip-concat path: the up-path U-Net concat (reference
    unet.py:548-560) never exists in HBM."""
    from ml_mdm_tpu.ops.gn_stats import gn_stats_mode, spatial_sums

    s1s, s2s = [], []
    for x in xs:
        spatial = tuple(range(1, x.ndim - 1))
        big = (
            x.dtype == jnp.bfloat16
            and x.ndim == 4
            and min(x.shape[1], x.shape[2]) >= _fused_min_side()
        )
        mode = gn_stats_mode() if big else None
        if mode is not None:
            s1, s2 = spatial_sums(x, mode == "interpret")
        else:
            s1 = jnp.sum(x, axis=spatial, dtype=jnp.float32)
            s2 = jnp.sum(
                jnp.square(x.astype(jnp.float32)), axis=spatial,
                dtype=jnp.float32,
            )
        s1s.append(s1)
        s2s.append(s2)
    n_spatial = 1
    for ax in range(1, xs[0].ndim - 1):
        n_spatial *= xs[0].shape[ax]
    return group_norm_coeffs_from_sums(
        jnp.concatenate(s1s, axis=-1), jnp.concatenate(s2s, axis=-1),
        n_spatial, scale, bias, g, eps=eps, ndim=xs[0].ndim,
    )


def group_norm_coeffs_from_sums(s1, s2, n_spatial, scale, bias, g,
                                eps: float = 1e-5, ndim: int = 4):
    """GroupNorm affine coefficients from per-channel spatial sums.

    s1, s2: (B, C) f32 sum / sum-of-squares over the spatial axes (e.g.
    emitted by the fused resnet kernel); n_spatial: number of spatial
    positions summed. Numerically matches group_norm_coeffs' bf16
    branch (same E[x^2]-mean^2 form, f32 accumulation)."""
    b_, c = s1.shape
    cg = c // g
    n = n_spatial * cg
    mean = s1.reshape(b_, g, cg).sum(-1, keepdims=True) / n
    msq = s2.reshape(b_, g, cg).sum(-1, keepdims=True) / n
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    return _gn_affine_from_moments(mean, var, scale, bias, b_, g, cg,
                                   (1,) * (ndim - 2), eps)


class LayerNormF32(nn.Module):
    """LayerNorm with fp32 statistics via reduction dtype — same
    no-fp32-materialisation treatment as GroupNormF32."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        # same dtype-principled variance strategy as group_norm_coeffs
        if x.dtype == jnp.bfloat16:
            msq = jnp.mean(
                jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True,
                dtype=jnp.float32,
            )
            var = jnp.maximum(msq - jnp.square(mean), 0.0)
        else:
            var = jnp.mean(
                jnp.square(x.astype(jnp.float32) - mean),
                axis=-1, keepdims=True, dtype=jnp.float32,
            )
        inv = jax.lax.rsqrt(var + 1e-5)
        a = (inv * scale).astype(x.dtype)
        b = (bias - mean * inv * scale).astype(x.dtype)
        return x * a + b


def gelu(x):
    """GELU with dtype-principled lowering (reference nn.GELU,
    unet.py:319-334 ffn / :425-436 MLP — exact-erf form).

    Under f32 (the CPU/torch-parity path) the exact erf form is kept.
    Under bf16 the tanh approximation is used: its max absolute error
    (~3e-4, near |x|=2) is below bf16 rounding (ULP 1.6e-2 at 2.0), so
    the results are bit-comparable after the bf16 round — while XLA
    lowers exact erf on TPU into a ~20-op f32 polynomial with bit-packed
    branch masks, re-evaluated in every consuming fusion (profiled r2:
    the attention-FFN GELU chains alone were ~7% of the 64px sampling
    step). tanh is a single native transcendental."""
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


def _maybe_repeat_temb(h: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Repeat per-example time features when the spatial batch was tiled
    (temporal mode packs (b t) into the batch — reference unet.py:229-232)."""
    if h.shape[0] > t.shape[0]:
        n = h.shape[0] // t.shape[0]
        t = jnp.repeat(t, n, axis=0)
    return t


class ResNet(nn.Module):
    """GN+SiLU+3x3 conv ResNet with FiLM time injection (unet.py:193-238)."""

    config: ResNetConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.norm1 = GroupNormF32(cfg.num_groups_norm)
        self.conv1 = nn.Conv(
            cfg.output_channels, (3, 3), padding=1, dtype=self.dtype
        )
        self.time_layer = nn.Dense(cfg.output_channels * 2, dtype=self.dtype)
        self.norm2 = GroupNormF32(cfg.num_groups_norm)
        self.drop = nn.Dropout(cfg.dropout)
        self.conv2 = nn.Conv(
            cfg.output_channels,
            (3, 3),
            padding=1,
            kernel_init=zeros_init,
            bias_init=zeros_init,
            dtype=self.dtype,
        )
        if cfg.output_channels != cfg.num_channels:
            self.conv3 = nn.Conv(
                cfg.output_channels, (1, 1), dtype=self.dtype
            )

    def __call__(self, x, temb, train: bool = False, packed: bool = False):
        """One body for both execution layouts: the packed
        (space-to-depth, ops/space_to_depth.py) path substitutes conv
        and per-channel-vector primitives; all the math lives once in
        _forward so the two layouts cannot drift apart.

        ``x`` may be a TUPLE (x, skip): the lazy skip-concat. When the
        fused eval path engages, the operands feed the Pallas kernel
        separately (the concatenated tensor never exists in HBM —
        profiled r3: the concat dynamic-update-slices plus the 1x1
        shortcut conv on the concat were ~25% of the 1024px forward);
        otherwise the concat happens right here and nothing changes."""
        if isinstance(x, (tuple, list)):
            x = tuple(x)
            engages = (
                not train
                and not self.is_initializing()
                and _fused_resnet_mode() is not None
                and (
                    packed
                    or min(x[0].shape[1], x[0].shape[2])
                    >= _fused_min_side()
                )
            )
            if not engages:
                x = jnp.concatenate(x, axis=-1)
        if packed and not self.is_initializing():
            from ml_mdm_tpu.ops import space_to_depth as s2d

            p = self.variables["params"]
            g = self.config.num_groups_norm
            rep = s2d.pack_channel_vector

            def conv(name, h):
                return s2d.packed_conv(
                    h, p[name]["kernel"], p[name].get("bias")
                )

            def coeffs(name, h):
                if isinstance(h, tuple):
                    return group_norm_coeffs_concat(
                        h, rep(p[name]["scale"]), rep(p[name]["bias"]), g
                    )
                return group_norm_coeffs(
                    h, rep(p[name]["scale"]), rep(p[name]["bias"]), g
                )

            fused = None
            gn_params = None
            fused_proj = False
            from ml_mdm_tpu.ops import fused_resnet as fr

            p_eval_mode = None if train else _fused_resnet_mode()
            p_train_mode = (
                fr.fused_train_mode()
                if train and self.config.dropout == 0.0 else None
            )
            if (p_eval_mode or p_train_mode) is not None:
                p_interp = (p_eval_mode or p_train_mode) == "interpret"

                if p_eval_mode is not None:
                    fused_proj = _fused_proj_enabled()

                    def fused(name, h, a, b, residual,  # noqa: F811
                              proj=None, **kw):
                        a = a.reshape(a.shape[0], a.shape[-1])
                        b = b.reshape(b.shape[0], b.shape[-1])
                        pk = pb = None
                        if isinstance(h, tuple):
                            # channel-major packing: pack(concat) ==
                            # concat(pack), so slicing the UNPACKED
                            # kernel at the operand boundary and packing
                            # each slice is exact. Kernel transforms
                            # (pack + struct-combine) go through wcached
                            # so the denoise scan reads them precomputed.
                            offs = _channel_offsets(
                                [hi.shape[-1] // 4 for hi in h]
                            )

                            def mk_k(name=name, offs=offs):
                                kk = p[name]["kernel"]
                                return tuple(
                                    fr._struct_weights(
                                        s2d.pack_conv3x3_kernel(
                                            kk[:, :, lo:hi, :]
                                        )
                                    )
                                    for lo, hi in zip(offs, offs[1:])
                                )

                            k = wcached(self, f"{name}_ps", mk_k)
                            a = tuple(
                                a[:, 4 * lo:4 * hi]
                                for lo, hi in zip(offs, offs[1:])
                            )
                            b = tuple(
                                b[:, 4 * lo:4 * hi]
                                for lo, hi in zip(offs, offs[1:])
                            )
                            if proj is not None:
                                def mk_pk(proj=proj, offs=offs):
                                    kp = p[proj]["kernel"]
                                    return tuple(
                                        s2d.pack_conv1x1_kernel(
                                            kp[:, :, lo:hi, :]
                                        )[0, 0]
                                        for lo, hi in zip(offs, offs[1:])
                                    )

                                pk = wcached(self, f"{name}_pj", mk_pk)
                        else:
                            k = wcached(
                                self, f"{name}_ps",
                                lambda name=name: fr._struct_weights(
                                    s2d.pack_conv3x3_kernel(
                                        p[name]["kernel"]
                                    )
                                ),
                            )
                            if proj is not None:
                                pk = wcached(
                                    self, f"{name}_pj",
                                    lambda proj=proj:
                                        s2d.pack_conv1x1_kernel(
                                            p[proj]["kernel"]
                                        )[0, 0],
                                )
                        if proj is not None:
                            pb = rep(p[proj].get("bias"))
                        return fr.affine_silu_conv3x3(
                            h, a, b, k,
                            rep(p[name].get("bias")),
                            residual,
                            interpret=p_interp,
                            proj_kernel=pk, proj_bias=pb,
                            packed_struct=True,
                            **kw,
                        )
                else:
                    # training: custom_vjp wrapper; gradients flow
                    # through pack_conv3x3_kernel/pack_channel_vector
                    # (plain jnp transforms outside the custom_vjp)
                    def fused(name, h, a, b, residual,  # noqa: F811
                              emit_stats=False):
                        # stats ride the kernel (cotangents handled by
                        # the custom_vjp) — no post-hoc jnp.sum re-read
                        return fr.affine_silu_conv3x3_vjp(
                            h,
                            a.reshape(a.shape[0], a.shape[-1]),
                            b.reshape(b.shape[0], b.shape[-1]),
                            s2d.pack_conv3x3_kernel(p[name]["kernel"]),
                            rep(p[name].get("bias")),
                            residual,
                            True,
                            p_interp,
                            emit_stats,
                            True,  # packed_struct
                        )

                def gn_params(name):  # noqa: F811
                    return rep(p[name]["scale"]), rep(p[name]["bias"])

            return self._forward(x, temb, train, conv, coeffs, rep,
                                 fused=fused, gn_params=gn_params,
                                 fused_proj=fused_proj)

        def conv(name, h):
            return getattr(self, name)(h)

        def coeffs(name, h):
            if isinstance(h, tuple):
                pn = self.variables["params"][name]
                return group_norm_coeffs_concat(
                    h, pn["scale"], pn["bias"],
                    self.config.num_groups_norm,
                )
            return getattr(self, name).affine_coeffs(h)

        min_side = _fused_min_side()
        fused = None
        gn_params = None
        fused_proj = False
        from ml_mdm_tpu.ops import fused_resnet as fr

        eval_mode = None if train else _fused_resnet_mode()
        train_mode = (
            fr.fused_train_mode()
            if train and self.config.dropout == 0.0 else None
        )
        x0 = x[0] if isinstance(x, tuple) else x
        if (
            not self.is_initializing()
            and min(x0.shape[1], x0.shape[2]) >= min_side
            and (eval_mode or train_mode) is not None
        ):
            # large-spatial unpacked stages (e.g. the 256px shell) hit
            # the same XLA conv-layout round-trips as the packed ones;
            # the fused kernel applies unchanged with the raw kernels.
            # Training routes through the custom_vjp wrapper (dropout-0
            # stages only — the fused path has no dropout site).
            p = self.variables["params"]
            interp = (eval_mode or train_mode) == "interpret"

            if eval_mode is not None:
                fused_proj = _fused_proj_enabled()

                def fused(name, h, a, b, residual,  # noqa: F811
                          proj=None, **kw):
                    a = a.reshape(a.shape[0], a.shape[-1])
                    b = b.reshape(b.shape[0], b.shape[-1])
                    k = p[name]["kernel"]
                    pk = pb = None
                    if isinstance(h, tuple):
                        offs = _channel_offsets(
                            [hi.shape[-1] for hi in h]
                        )
                        k = tuple(
                            k[:, :, lo:hi, :]
                            for lo, hi in zip(offs, offs[1:])
                        )
                        a = tuple(
                            a[:, lo:hi] for lo, hi in zip(offs, offs[1:])
                        )
                        b = tuple(
                            b[:, lo:hi] for lo, hi in zip(offs, offs[1:])
                        )
                        if proj is not None:
                            kp = p[proj]["kernel"][0, 0]
                            pk = tuple(
                                kp[lo:hi, :]
                                for lo, hi in zip(offs, offs[1:])
                            )
                    elif proj is not None:
                        pk = p[proj]["kernel"][0, 0]
                    if proj is not None:
                        pb = p[proj].get("bias")
                    return fr.affine_silu_conv3x3(
                        h, a, b, k,
                        p[name].get("bias"),
                        residual,
                        interpret=interp,
                        proj_kernel=pk, proj_bias=pb,
                        **kw,
                    )
            else:
                def fused(name, h, a, b, residual,  # noqa: F811
                          emit_stats=False):
                    # stats ride the kernel (cotangents handled by the
                    # custom_vjp) — no post-hoc jnp.sum re-read
                    return fr.affine_silu_conv3x3_vjp(
                        h,
                        a.reshape(a.shape[0], a.shape[-1]),
                        b.reshape(b.shape[0], b.shape[-1]),
                        p[name]["kernel"],
                        p[name].get("bias"),
                        residual,
                        True,
                        interp,
                        emit_stats,
                        False,  # packed_struct (raw unpacked kernel)
                    )

            def gn_params(name):  # noqa: F811
                return p[name]["scale"], p[name]["bias"]

        return self._forward(x, temb, train, conv, coeffs, lambda v: v,
                             fused=fused, gn_params=gn_params,
                             fused_proj=fused_proj)

    def _forward(self, x, temb, train, conv, coeffs, vec, fused=None,
                 gn_params=None, fused_proj=False):
        cfg = self.config
        needs_proj = cfg.output_channels != cfg.num_channels
        res = None
        a1, b1 = coeffs("norm1", x)
        if fused is not None:
            # Pallas path (ops/fused_resnet.py): norm-affine + SiLU +
            # conv + residual in one kernel, plain NHWC layout — the
            # XLA conv's internal spatial-tiled layout otherwise costs
            # a relayout copy at every non-conv consumer. The kernel
            # also emits sum/sum-of-squares of its output, so norm2's
            # statistics never re-read the activation. With fused_proj
            # the conv3 1x1 shortcut projection rides the same pass
            # (emit_proj) instead of re-reading x; a tuple x (lazy
            # skip-concat) feeds the kernel per-operand. Eval only.
            if needs_proj and fused_proj:
                h, hs1, hs2, res = fused("conv1", x, a1, b1, None,
                                         emit_stats=True, proj="conv3")
            else:
                h, hs1, hs2 = fused("conv1", x, a1, b1, None,
                                    emit_stats=True)
            h = conv_tag(h)
        else:
            assert not isinstance(x, tuple)
            h = conv_tag(conv("conv1", jax.nn.silu(x * a1.astype(x.dtype)
                                                   + b1.astype(x.dtype))))
        t = self.time_layer(jax.nn.silu(temb))  # (B, 2*out)
        t = _maybe_repeat_temb(h, t)
        ta, tb = jnp.split(t, 2, axis=-1)
        ta = vec(ta)[:, None, None, :].astype(jnp.float32)
        tb = vec(tb)[:, None, None, :].astype(jnp.float32)
        # fold FiLM into the norm's affine: norm(h)*(1+ta)+tb == h*a'+b'
        # — one fused multiply-add over the activation instead of three
        # elementwise passes (unet.py:226-233 semantics preserved)
        if fused is not None:
            scale2, bias2 = gn_params("norm2")
            a2, b2 = group_norm_coeffs_from_sums(
                hs1, hs2, h.shape[1] * h.shape[2], scale2, bias2,
                cfg.num_groups_norm,
            )
        else:
            a2, b2 = coeffs("norm2", h)
        if fused is not None:
            a2f = a2 * (1.0 + ta)
            b2f = b2 * (1.0 + ta) + tb
            if res is None:
                if isinstance(x, tuple):
                    x = jnp.concatenate(x, axis=-1)
                res = conv("conv3", x) if needs_proj else x
            return conv_tag(fused("conv2", h, a2f, b2f, res))
        a2 = (a2 * (1.0 + ta)).astype(h.dtype)
        b2 = (b2 * (1.0 + ta) + tb).astype(h.dtype)
        h = jax.nn.silu(h * a2 + b2)
        h = self.drop(h, deterministic=not train)
        h = conv("conv2", h)
        if cfg.output_channels != cfg.num_channels:
            x = conv("conv3", x)
        return conv_tag(h + x)


class SelfAttention(nn.Module):
    """2-D self-attention with fused text cross-attention branch
    (unet.py:241-313): cross-attn output is *added* to self-attn output
    before the shared zero-init projection."""

    channels: int
    num_heads: int = 8
    num_head_channels: int = -1
    cond_dim: Optional[int] = None
    use_attention_ffn: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.num_head_channels == -1:
            self.heads = self.num_heads
        else:
            assert self.channels % self.num_head_channels == 0
            self.heads = self.channels // self.num_head_channels
        self.norm = GroupNormF32(32)
        # torch uses a 1x1 Conv2d; over NHWC tokens that's a Dense on C.
        # Named "qkv" to match the torch param (1x1 conv kernels reshape
        # to dense kernels in the converter).
        self.qkv = nn.Dense(self.channels * 3, dtype=self.dtype)
        if self.cond_dim is not None and self.cond_dim > 0:
            self.norm_cond = LayerNormF32()
            self.kv_cond = nn.Dense(self.channels * 2, dtype=self.dtype)
        self.proj_out = nn.Dense(
            self.channels,
            kernel_init=zeros_init,
            bias_init=zeros_init,
            dtype=self.dtype,
        )
        if self.use_attention_ffn:
            self.ffn_0 = GroupNormF32(32)
            self.ffn_1 = nn.Dense(4 * self.channels, dtype=self.dtype)
            self.ffn_3 = nn.Dense(
                self.channels,
                kernel_init=zeros_init,
                bias_init=zeros_init,
                dtype=self.dtype,
            )

    def _attention(self, q, k, v, mask=None):
        """q: (B, Lq, C), k/v: (B, Lk, C) -> (B, Lq, C)."""
        b, lq, c = q.shape
        ch = c // self.heads
        q = q.reshape(b, lq, self.heads, ch)
        k = k.reshape(b, -1, self.heads, ch)
        v = v.reshape(b, -1, self.heads, ch)
        return dot_product_attention(q, k, v, mask=mask).reshape(b, lq, c)

    def __call__(self, x, cond=None, cond_mask=None):
        b, h, w, c = x.shape
        qkv = self.qkv(self.norm(x)).reshape(b, h * w, 3 * c)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = self._attention(q, k, v)
        if self.cond_dim is not None and self.cond_dim > 0:
            kv = self.kv_cond(self.norm_cond(cond))
            k_c, v_c = jnp.split(kv, 2, axis=-1)
            out = out + self._attention(q, k_c, v_c, mask=cond_mask)
        out = self.proj_out(out).reshape(b, h, w, c)
        x = x + out
        if self.use_attention_ffn:
            y = self.ffn_3(
                gelu(self.ffn_1(self.ffn_0(x)))
            )
            x = x + y
        return x


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rotary_embedding(x: jnp.ndarray) -> jnp.ndarray:
    """RoPE over the last dim of (B, H, L, D) (reference uses
    rotary_embedding_torch with default settings, unet.py:347-352)."""
    d = x.shape[-1]
    L = x.shape[-2]
    half = d // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    t = jnp.arange(L, dtype=jnp.float32)
    angles = jnp.einsum("l,d->ld", t, freqs)
    angles = jnp.concatenate([angles, angles], axis=-1)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    return x * cos + _rotate_half(x) * sin


class SelfAttention1D(nn.Module):
    """Token self-attention (unet.py:316-388)."""

    channels: int
    num_heads: int = 8
    num_head_channels: int = -1
    use_attention_ffn: bool = False
    pos_emb: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.num_head_channels == -1:
            self.heads = self.num_heads
        else:
            assert self.channels % self.num_head_channels == 0
            self.heads = self.channels // self.num_head_channels
        self.norm = LayerNormF32()
        self.qkv = nn.Dense(self.channels * 3, dtype=self.dtype)
        self.proj_out = nn.Dense(
            self.channels,
            kernel_init=zeros_init,
            bias_init=zeros_init,
            dtype=self.dtype,
        )
        if self.use_attention_ffn:
            self.ffn_0 = LayerNormF32()
            self.ffn_1 = nn.Dense(4 * self.channels, dtype=self.dtype)
            self.ffn_3 = nn.Dense(
                self.channels,
                kernel_init=zeros_init,
                bias_init=zeros_init,
                dtype=self.dtype,
            )

    def __call__(self, x, mask=None):
        b, l, c = x.shape
        ch = c // self.heads
        qkv = self.qkv(self.norm(x))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.heads, ch)
        k = k.reshape(b, l, self.heads, ch)
        v = v.reshape(b, l, self.heads, ch)
        if self.pos_emb:
            q = rotary_embedding(q.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
            k = rotary_embedding(k.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
        out = dot_product_attention(q, k, v, mask=mask).reshape(b, l, c)
        x = x + self.proj_out(out)
        if self.use_attention_ffn:
            x = x + self.ffn_3(
                gelu(self.ffn_1(self.ffn_0(x)))
            )
        return x


class MLP(nn.Module):
    """Pre-norm residual MLP (unet.py:425-436). Param names main_0/1/3
    mirror the torch nn.Sequential indices."""

    channels: int
    multiplier: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        self.main_0 = LayerNormF32()
        self.main_1 = nn.Dense(self.multiplier * self.channels, dtype=self.dtype)
        self.main_3 = nn.Dense(
            self.channels,
            kernel_init=zeros_init,
            bias_init=zeros_init,
            dtype=self.dtype,
        )

    def __call__(self, x):
        return x + self.main_3(
            gelu(self.main_1(self.main_0(x)))
        )


class SelfAttention1DBlock(nn.Module):
    """attn + mlp (unet.py:439-446) — the learned lm_head block."""

    channels: int
    num_heads: int = 8
    num_head_channels: int = -1
    mlp_multiplier: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        self.attn = SelfAttention1D(
            self.channels, self.num_heads, self.num_head_channels,
            dtype=self.dtype,
        )
        self.mlp = MLP(self.channels, self.mlp_multiplier, dtype=self.dtype)

    def __call__(self, x, mask=None):
        return self.mlp(self.attn(x, mask))


class TemporalAttentionBlock(nn.Module):
    """Attention across frames per pixel (unet.py:391-422)."""

    channels: int
    num_heads: int = 8
    num_head_channels: int = -1
    down: bool = False
    pos_emb: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.attn = SelfAttention1D(
            self.channels,
            self.num_heads,
            self.num_head_channels,
            pos_emb=self.pos_emb,
            dtype=self.dtype,
        )
        self.mlp = MLP(self.channels, multiplier=4, dtype=self.dtype)
        if self.down:
            self.down_conv = nn.Conv(
                self.channels, (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype,
            )
            self.up_conv = nn.Conv(
                self.channels, (3, 3), padding=1, dtype=self.dtype
            )

    def __call__(self, x, temb):
        # x: ((b t), h, w, c); temb: (b, d)
        x_in = x
        if self.down:
            x = self.down_conv(x)
        bt, h, w, c = x.shape
        t = bt // temb.shape[0]
        b = bt // t
        # (b t) h w c -> (b h w) t c
        y = x.reshape(b, t, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
            b * h * w, t, c
        )
        y = self.mlp(self.attn(y, None))
        x = y.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4).reshape(
            bt, h, w, c
        )
        if self.down:
            x = self.up_conv(nearest_upsample_2x(x))
        return x + x_in


class ResNetBlockStage(nn.Module):
    """A resolution stage: N resnets (+ attention) + optional re-sampling
    (unet.py:449-576). Named ``ResNetBlock`` in the reference."""

    temporal_dim: int
    num_residual_blocks: int
    num_attention_layers: int
    downsample_output: bool
    upsample_output: bool
    resnet_configs: Sequence[ResNetConfig]
    conditioning_feature_dim: int = -1
    temporal_mode: bool = False
    temporal_pos_emb: bool = False
    temporal_spatial_ds: bool = False
    num_temporal_attention_layers: Optional[int] = None
    # space-to-depth packed execution for small-channel conv-only stages
    # (>= this spatial side; 0 disables). See ops/space_to_depth.py.
    pack_min_side: int = 0
    dtype: Dtype = jnp.float32

    def packs_at(self, side: int) -> bool:
        """Whether this stage executes space-to-depth packed at the given
        (unpacked) spatial side. Packing quadruples nominal FLOPs but
        removes lane padding and enables the structured-tap kernel
        (fused_resnet._struct_dots, 4 dots instead of 9 — net 1.78x the
        unpacked FLOPs at full MXU width). C <= 32 stages pack from
        pack_min_side (r2: 1.4x faster); C <= 64 stages pack from
        ML_MDM_TPU_PACK64_MIN_SIDE (default 256 — r2 measured 64ch
        packing slower under the dense 9-tap kernel, r4's structured
        taps flipped that; ML_MDM_TPU_PACK_MAX_CH=32 restores the old
        gate)."""
        from ml_mdm_tpu.perf import perf

        p = perf()
        max_ch = max(
            (rc.output_channels for rc in self.resnet_configs), default=0
        )
        if max_ch <= 32:
            min_side = self.pack_min_side
        elif max_ch <= p.pack_max_ch:
            min_side = p.pack64_min_side
        else:
            return False
        return (
            self.pack_min_side > 0
            and side >= min_side
            and side % 2 == 0
            and self.num_attention_layers == 0
            and not (
                self.num_temporal_attention_layers
                and self.num_temporal_attention_layers > 0
            )
            and not self.temporal_mode
        )

    def _use_packing(self, x, packed_in: bool = False) -> bool:
        m = 2 if packed_in else 1
        h, w = x.shape[1] * m, x.shape[2] * m
        return w % 2 == 0 and self.packs_at(min(h, w))

    def setup(self):
        assert not (self.downsample_output and self.upsample_output)
        self.resnets = [
            ResNet(cfg, dtype=self.dtype)
            for cfg in self.resnet_configs[: self.num_residual_blocks]
        ]
        if self.num_attention_layers > 0:
            attn = []
            for i in range(self.num_residual_blocks):
                for _ in range(self.num_attention_layers):
                    attn.append(
                        SelfAttention(
                            self.resnet_configs[i].output_channels,
                            cond_dim=self.conditioning_feature_dim,
                            use_attention_ffn=self.resnet_configs[
                                i
                            ].use_attention_ffn,
                            dtype=self.dtype,
                        )
                    )
            self.attn = attn
        if (
            self.num_temporal_attention_layers
            and self.num_temporal_attention_layers > 0
            and not self.temporal_spatial_ds
        ):
            t_attn = []
            for i in range(self.num_residual_blocks):
                for _ in range(self.num_temporal_attention_layers):
                    t_attn.append(
                        TemporalAttentionBlock(
                            self.resnet_configs[i].output_channels,
                            num_head_channels=32,
                            down=True,
                            pos_emb=self.temporal_pos_emb,
                            dtype=self.dtype,
                        )
                    )
            self.t_attn = t_attn
        out_ch = self.resnet_configs[-1].output_channels
        # Temporal mode without spatial_ds resamples across FRAMES, not
        # space: a 1-D conv over ((b h w), t, c) — reference
        # unet.py:511-513 (Conv1d) and :563-572 (the rearrange).
        temporal_1d = self.temporal_mode and not self.temporal_spatial_ds
        if self.downsample_output:
            self.resample = (
                nn.Conv(out_ch, (3,), strides=(2,), padding=1,
                        dtype=self.dtype)
                if temporal_1d
                else nn.Conv(out_ch, (3, 3), strides=(2, 2), padding=1,
                             dtype=self.dtype)
            )
        elif self.upsample_output:
            self.resample = (
                nn.Conv(out_ch, (3,), padding=1, dtype=self.dtype)
                if temporal_1d
                else nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype)
            )

    def __call__(
        self,
        x,
        temb,
        skip_activations: Optional[List[jnp.ndarray]] = None,
        return_activations: bool = False,
        conditioning=None,
        cond_mask=None,
        train: bool = False,
        packed_in: bool = False,
        packed_out: bool = False,
    ):
        """packed_in: x AND incoming skips are already space-to-depth
        packed (the stage must be packable at that side); emitted skip
        activations then stay packed too. packed_out: the final
        activation (after resample, if any) leaves packed — for a packed
        consumer stage. Both default False: standalone calls keep the
        unpacked contract and pack/unpack internally. The owning UNet
        threads a whole-shell plan through these so thin-shell tensors
        never round-trip layouts at stage boundaries (profiled r2 on
        v5e: layout copies were 58% of the 1024px forward)."""
        activations = []
        skips = list(skip_activations) if skip_activations is not None else None
        packed = (
            self._use_packing(x, packed_in) and not self.is_initializing()
        )
        assert packed or not packed_in, (
            "packed_in requires a stage that packs at this side"
        )
        if packed:
            from ml_mdm_tpu.ops import space_to_depth as s2d

            if not packed_in:
                x = s2d.space_to_depth(x)
        for i in range(self.num_residual_blocks):
            if skips is not None:
                skip = skips.pop(0)
                if packed and not packed_in:
                    skip = s2d.space_to_depth(skip)
                if not train and _fused_resnet_mode() is not None:
                    # lazy skip-concat: the fused ResNet path consumes
                    # the operands directly (ResNet.__call__ concats
                    # eagerly whenever that path doesn't engage)
                    x = (x, skip)
                else:
                    x = jnp.concatenate([x, skip], axis=-1)
            x = self.resnets[i](x, temb, train=train, packed=packed)
            if self.num_attention_layers > 0:
                L = self.num_attention_layers
                for j in range(L):
                    x = self.attn[i * L + j](x, conditioning, cond_mask)
            if (
                self.num_temporal_attention_layers
                and self.num_temporal_attention_layers > 0
                and not self.temporal_spatial_ds
            ):
                L = self.num_temporal_attention_layers
                for j in range(L):
                    x = self.t_attn[i * L + j](x, temb)
            activations.append(
                s2d.depth_to_space(x) if (packed and not packed_in) else x
            )
        if self.downsample_output or self.upsample_output:
            fast = not train and _fused_resnet_mode() is not None
            if self.temporal_mode and not self.temporal_spatial_ds:
                # 1-D resampling across frames (reference unet.py:563-572):
                # (b t) h w c -> (b h w) t c, conv over t, back. Down
                # halves the frame count; up nearest-doubles then convs.
                bt, h, w, c = x.shape
                t = bt // temb.shape[0]
                b = bt // t
                y = x.reshape(b, t, h, w, c).transpose(0, 2, 3, 1, 4)
                y = y.reshape(b * h * w, t, c)
                if self.upsample_output:
                    y = jnp.repeat(
                        y.astype(jnp.float32), 2, axis=1
                    ).astype(x.dtype)
                y = self.resample(y)
                t_new = y.shape[1]
                x = y.reshape(b, h, w, t_new, c).transpose(0, 3, 1, 2, 4)
                x = x.reshape(b * t_new, h, w, c)
                if packed_out:
                    from ml_mdm_tpu.ops import space_to_depth as s2d

                    x = s2d.space_to_depth(x)
            elif packed:
                # resample directly in the packed domain: the stride-2
                # conv lands on the packed grid; upsample+conv is a 4x
                # channel repeat + packed conv (exact rewrites). Kernel
                # transforms ride wcached (hoisted out of denoise scans).
                p = self.variables["params"]["resample"]
                if self.downsample_output:
                    if packed_out:
                        x = s2d.packed_strided_conv_p2p(
                            x, p["kernel"], p.get("bias"),
                            pk=wcached(
                                self, "resample_p2p",
                                lambda: s2d.pack_strided_conv_kernel_p2p(
                                    p["kernel"]
                                ),
                            ),
                        )
                    else:
                        x = s2d.packed_strided_conv(
                            x, p["kernel"], p.get("bias"),
                            pk=wcached(
                                self, "resample_pk",
                                lambda: s2d.pack_strided_conv_kernel(
                                    p["kernel"]
                                ),
                            ),
                        )
                else:
                    x = s2d.packed_upsample_conv(
                        x, p["kernel"], p.get("bias"),
                        in_packed=True, out_packed=packed_out, fast=fast,
                        pk_fold=wcached(
                            self, "resample_fold",
                            lambda: s2d.upsample_fold_kernel(p["kernel"]),
                        ),
                    )
            elif packed_out:
                from ml_mdm_tpu.ops import space_to_depth as s2d

                p = self.variables["params"]["resample"]
                if self.downsample_output:
                    x = s2d.space_to_depth(self.resample(x))
                else:
                    # unpacked producer, packed consumer: the 4x channel
                    # repeat IS the packed upsampled image; one packed
                    # conv lands directly in the consumer's layout
                    x = s2d.packed_upsample_conv(
                        x, p["kernel"], p.get("bias"), out_packed=True,
                        fast=fast,
                        pk_fold=wcached(
                            self, "resample_fold",
                            lambda: s2d.upsample_fold_kernel(p["kernel"]),
                        ),
                    )
            else:
                if self.upsample_output:
                    x = nearest_upsample_2x(
                        x.astype(jnp.float32)
                    ).astype(x.dtype)
                x = self.resample(x)
            activations.append(x)
        elif packed and not packed_out:
            x = s2d.depth_to_space(x)
        elif packed_out and not packed:
            from ml_mdm_tpu.ops import space_to_depth as s2d

            x = s2d.space_to_depth(x)

        if not return_activations:
            return x
        return x, activations
