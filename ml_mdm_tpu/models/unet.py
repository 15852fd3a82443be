"""Text-conditioned diffusion U-Net (Flax linen, NHWC, TPU-native).

Architecture semantics match the reference UNet
(/root/reference/ml-mdm-matryoshka/ml_mdm/models/unet.py:579-987):
sinusoidal time embedding -> 2-layer MLP; FiLM scale-shift time injection;
GN+SiLU conv ResNets with zero-init second conv; per-resolution stages with
stride-2 conv downsample and nearest-upsample+conv; self-attention with a
fused text cross-attention branch at configured levels; pooled-text
conditioning added to the time embedding; micro-conditioning (e.g.
``scale:64``) as extra sinusoidal embeddings; optional learned lm_head
self-attention stack over frozen LM features.

TPU-native choices: NHWC layout, fp32 norm statistics under bf16 compute,
attention via ops.attention (Pallas flash kernel available), parameter tree
named for mechanical .pth conversion (utils/torch_compat.py).
"""
from __future__ import annotations

import copy
import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ml_mdm_tpu import config as config_mod
from ml_mdm_tpu.models.layers import (
    GroupNormF32,
    MLP,
    ResNet,
    ResNetBlockStage,
    ResNetConfig,
    SelfAttention,
    SelfAttention1DBlock,
    nearest_upsample_2x,
    zeros_init,
)

Dtype = Any


def _parse_int_list(v, n=None):
    if isinstance(v, str):
        v = [int(x) for x in v.split(",")] if v else []
    v = list(v) if v is not None else v
    if v is not None and n is not None and len(v) == 1:
        v = v * n
    return v


@config_mod.register_model_config("unet", "unet")
@dataclass
class UNetConfig:
    """Field names/defaults mirror the reference UNetConfig (unet.py:62-156)
    so shipped YAMLs load unchanged."""

    num_resnets_per_resolution: Any = "2"
    temporal_dim: Optional[int] = None
    attention_levels: Any = "2,3"
    num_attention_layers: Any = "1"
    num_temporal_attention_layers: Any = None
    conditioning_feature_dim: int = -1
    conditioning_feature_proj_dim: int = -1
    num_lm_head_layers: int = 0
    masked_cross_attention: int = 1
    resolution_channels: Any = "128,256,256,512,1024"
    skip_mid_blocks: bool = False
    skip_cond_emb: bool = False
    nesting: bool = False
    micro_conditioning: Optional[str] = None
    temporal_mode: bool = False
    temporal_spatial_ds: bool = False
    temporal_positional_encoding: bool = False
    # space-to-depth packed execution for conv-only stages at or above
    # this spatial side (TPU: 32-64ch convs at >=512px pad the 128-lane
    # MXU 2-4x; packing trades 2x2 space for channels, exactly — see
    # ops/space_to_depth.py). 0 disables.
    pack_min_side: int = 512
    resnet_config: ResNetConfig = field(default_factory=ResNetConfig)

    def __post_init__(self):
        self.resolution_channels = _parse_int_list(self.resolution_channels)
        n = len(self.resolution_channels)
        if self.attention_levels is None or self.attention_levels == "":
            self.attention_levels = []
        else:
            self.attention_levels = _parse_int_list(self.attention_levels)
        self.num_attention_layers = _parse_int_list(self.num_attention_layers, n)
        assert len(self.num_attention_layers) == n
        self.num_resnets_per_resolution = _parse_int_list(
            self.num_resnets_per_resolution, n
        )
        assert len(self.num_resnets_per_resolution) == n
        if self.num_temporal_attention_layers is not None:
            self.num_temporal_attention_layers = _parse_int_list(
                self.num_temporal_attention_layers, n
            )
        if isinstance(self.resnet_config, dict):
            self.resnet_config = ResNetConfig(**self.resnet_config)


def parse_micro_conditions(spec: Optional[str]) -> Optional[Dict[str, float]]:
    if spec is None or spec == "" or str(spec).lower() == "none":
        return None
    return {
        c.split(":")[0]: float(c.split(":")[1]) for c in str(spec).split(",")
    }


def sinusoidal_frequencies(temporal_dim: int) -> np.ndarray:
    """Sinusoidal frequency table shared by time + micro conditioning
    (reference unet.py:600-606, 834-845)."""
    half_dim = temporal_dim // 8
    emb = math.log(10000) / half_dim
    return np.exp(np.arange(half_dim, dtype=np.float64) * -emb).astype(
        np.float32
    )


def sinusoidal_embedding(times: jnp.ndarray, temporal_dim: int) -> jnp.ndarray:
    freqs = jnp.asarray(sinusoidal_frequencies(temporal_dim))
    temb = times.astype(jnp.float32).reshape(-1, 1) * freqs[None, :]
    return jnp.concatenate([jnp.sin(temb), jnp.cos(temb)], axis=1)


@config_mod.register_model("unet")
class UNet(nn.Module):
    input_channels: int
    output_channels: int
    config: UNetConfig
    # effective conditioning dim pushed down by an outer NestedUNet (the
    # reference mutates config.inner_config in-place; we stay functional)
    cond_dim_override: Optional[int] = None
    dtype: Dtype = jnp.float32

    @property
    def model_type(self):
        return "unet"

    @property
    def input_conditioning_feature_dim(self):
        if self.cond_dim_override is not None:
            return self.cond_dim_override
        return self.config.conditioning_feature_dim

    @property
    def effective_cond_dim(self):
        """conditioning_feature_dim after optional projection."""
        in_dim = self.input_conditioning_feature_dim
        if in_dim > 0 and self.config.conditioning_feature_proj_dim > 0:
            return self.config.conditioning_feature_proj_dim
        return in_dim

    @property
    def temporal_dim(self):
        cfg = self.config
        return (
            cfg.resolution_channels[0] * 4
            if cfg.temporal_dim is None
            else cfg.temporal_dim
        )

    @property
    def conditions(self):
        return parse_micro_conditions(self.config.micro_conditioning)

    def setup(self):
        cfg = self.config
        tdim = self.temporal_dim
        cond_dim = self.effective_cond_dim

        self.temb_layer1 = nn.Dense(tdim, dtype=self.dtype)
        self.temb_layer2 = nn.Dense(tdim, dtype=self.dtype)

        if cond_dim > 0 and not cfg.skip_cond_emb:
            self.cond_emb = nn.Dense(tdim, use_bias=False, dtype=self.dtype)
        else:
            self.cond_emb = None

        conds = self.conditions
        if conds is not None:
            for key in conds:
                setattr(
                    self,
                    f"cond_layers_{key}_0",
                    nn.Dense(tdim, dtype=self.dtype),
                )
                setattr(
                    self,
                    f"cond_layers_{key}_1",
                    nn.Dense(
                        tdim,
                        kernel_init=zeros_init,
                        bias_init=zeros_init,
                        dtype=self.dtype,
                    ),
                )

        channels = cfg.resolution_channels[0]
        self.conv_in = nn.Conv(channels, (3, 3), padding=1, dtype=self.dtype)

        # ---- down path (skip-channel bookkeeping mirrors unet.py:635-681)
        skip_channels = [channels]
        num_res = len(cfg.resolution_channels)
        down_blocks = []
        for i in range(num_res):
            stage_cfgs = []
            for _ in range(cfg.num_resnets_per_resolution[i]):
                rc = copy.copy(cfg.resnet_config)
                rc.num_channels = channels
                rc.output_channels = cfg.resolution_channels[i]
                skip_channels.append(rc.output_channels)
                stage_cfgs.append(rc)
                channels = rc.output_channels
            if i != num_res - 1:
                skip_channels.append(stage_cfgs[-1].output_channels)
            n_attn = (
                cfg.num_attention_layers[i]
                if i in cfg.attention_levels
                else 0
            )
            n_tattn = (
                cfg.num_temporal_attention_layers[i]
                if cfg.num_temporal_attention_layers is not None
                else None
            )
            down_blocks.append(
                ResNetBlockStage(
                    temporal_dim=tdim,
                    num_residual_blocks=cfg.num_resnets_per_resolution[i],
                    num_attention_layers=n_attn,
                    downsample_output=i != num_res - 1,
                    upsample_output=False,
                    resnet_configs=tuple(stage_cfgs),
                    conditioning_feature_dim=(
                        cond_dim if i in cfg.attention_levels else -1
                    ),
                    temporal_mode=cfg.temporal_mode,
                    temporal_pos_emb=cfg.temporal_positional_encoding,
                    temporal_spatial_ds=cfg.temporal_spatial_ds,
                    num_temporal_attention_layers=n_tattn,
                    pack_min_side=cfg.pack_min_side,
                    dtype=self.dtype,
                )
            )
        self.down_blocks = down_blocks

        # ---- mid blocks (unet.py:688-707)
        rc = copy.copy(cfg.resnet_config)
        rc.num_channels = channels
        rc.output_channels = channels
        if not cfg.skip_mid_blocks:
            self.mid_blocks = [
                ResNetBlockStage(
                    temporal_dim=tdim,
                    num_residual_blocks=1,
                    num_attention_layers=1,
                    downsample_output=False,
                    upsample_output=False,
                    resnet_configs=(rc,),
                    conditioning_feature_dim=cond_dim,
                    dtype=self.dtype,
                ),
                ResNetBlockStage(
                    temporal_dim=tdim,
                    num_residual_blocks=1,
                    num_attention_layers=0,
                    downsample_output=False,
                    upsample_output=False,
                    resnet_configs=(copy.copy(rc),),
                    dtype=self.dtype,
                ),
            ]

        # ---- up path (unet.py:709-747)
        up_blocks = []
        for i in reversed(range(num_res)):
            stage_cfgs = []
            for _ in range(cfg.num_resnets_per_resolution[i] + 1):
                rc = copy.copy(cfg.resnet_config)
                rc.num_channels = channels + skip_channels.pop()
                rc.output_channels = cfg.resolution_channels[i]
                stage_cfgs.append(rc)
                channels = rc.output_channels
            n_attn = (
                cfg.num_attention_layers[i]
                if i in cfg.attention_levels
                else 0
            )
            n_tattn = (
                cfg.num_temporal_attention_layers[i]
                if cfg.num_temporal_attention_layers is not None
                else None
            )
            up_blocks.append(
                ResNetBlockStage(
                    temporal_dim=tdim,
                    num_residual_blocks=cfg.num_resnets_per_resolution[i] + 1,
                    num_attention_layers=n_attn,
                    downsample_output=False,
                    upsample_output=i != 0,
                    resnet_configs=tuple(stage_cfgs),
                    conditioning_feature_dim=(
                        cond_dim if i in cfg.attention_levels else -1
                    ),
                    temporal_mode=cfg.temporal_mode,
                    temporal_pos_emb=cfg.temporal_positional_encoding,
                    temporal_spatial_ds=cfg.temporal_spatial_ds,
                    num_temporal_attention_layers=n_tattn,
                    pack_min_side=cfg.pack_min_side,
                    dtype=self.dtype,
                )
            )
        self.up_blocks = up_blocks

        self.norm_out = GroupNormF32(cfg.resnet_config.num_groups_norm)
        self.conv_out = nn.Conv(
            self.output_channels,
            (3, 3),
            padding=1,
            kernel_init=zeros_init,
            bias_init=zeros_init,
            dtype=self.dtype,
        )

        if cond_dim > 0 and not cfg.skip_cond_emb:
            if cfg.conditioning_feature_proj_dim > 0:
                self.lm_proj = nn.Dense(cond_dim, dtype=self.dtype)
            self.lm_head = [
                SelfAttention1DBlock(cond_dim, dtype=self.dtype)
                for _ in range(cfg.num_lm_head_layers)
            ]
        else:
            self.lm_head = []

    # ------------------------------------------------------------------
    # forward pieces (mirror unet.py:834-987)
    # ------------------------------------------------------------------

    def create_temporal_embedding(self, times, ff_layers=None):
        temb = sinusoidal_embedding(times, self.temporal_dim)
        if ff_layers is None:
            layer1, layer2 = self.temb_layer1, self.temb_layer2
        else:
            layer1, layer2 = ff_layers
        temb = temb.astype(self.dtype)
        return layer2(jax.nn.silu(layer1(temb)))

    def forward_conditioning(self, conditioning, cond_mask):
        cfg = self.config
        if cfg.conditioning_feature_proj_dim > 0:
            conditioning = self.lm_proj(conditioning)
        for head in self.lm_head:
            head_mask = cond_mask if cfg.masked_cross_attention else None
            conditioning = head(conditioning, mask=head_mask)
        if cond_mask is None or (
            not cfg.masked_cross_attention and len(self.lm_head) > 0
        ):
            y = conditioning.mean(axis=1)
        else:
            denom = jnp.sum(cond_mask, axis=1, keepdims=True)
            y = jnp.sum(
                cond_mask[..., None] * conditioning, axis=1
            ) / jnp.maximum(denom, 1e-6)
        if not cfg.masked_cross_attention:
            cond_mask = None
        cond_emb = self.cond_emb(y)
        return cond_emb, conditioning, cond_mask

    def _pack_plan(self, x_t, packed_io: bool = False):
        """Static per-resolution packed-execution plan for one forward.

        plan[i] == True means stage i (both its down and up block — they
        share side/channels/attention so the decision is identical) runs
        space-to-depth packed AND its boundary tensors (x handoffs, skip
        activations, conv_in/conv_out) stay packed. The last stage is
        never packed: the mid blocks / nested-UNet adapters live there
        and expect the plain layout. A nesting (inner) UNet keeps stage
        0 unpacked too — its pre-output feature is returned to the outer
        shell. Layout round-trips at stage boundaries were 58% of the
        1024px forward before this (profiled on v5e, r2).

        packed_io: x_t arrives already space-to-depth packed (the
        sampler keeps the carry packed across the denoise scan — see
        packs_input); the plan is computed for the UNPACKED side."""
        if isinstance(x_t, (list, tuple)):
            x_t = x_t[0]
        m = 2 if packed_io else 1
        h, w = x_t.shape[1] * m, x_t.shape[2] * m
        side = min(h, w)
        n = len(self.down_blocks)
        plan = []
        for i, blk in enumerate(self.down_blocks):
            packed = (
                not self.is_initializing()
                # the last stage packs only when the mid blocks are
                # skipped (nested shells): the attention mid blocks of
                # a plain UNet need the plain layout, while NestedUNet
                # unpacks/repacks around its adapter section itself
                and (i != n - 1 or self.config.skip_mid_blocks)
                and (h >> i) % 2 == 0
                and (w >> i) % 2 == 0
                and blk.packs_at(side >> i)
                and not (i == 0 and self.config.nesting)
            )
            plan.append(packed)
        return plan

    def packs_input(self, side: int) -> bool:
        """Whether a forward at the given (unpacked) spatial side runs
        its stage-0 blocks space-to-depth packed (== _pack_plan[0] at
        runtime; mirrors ResNetBlockStage.packs_at for stage 0, whose
        down and up blocks share channels/attention). Callers use this
        to keep the sampling carry packed across denoise steps and pass
        ``packed_io=True`` — the per-step pack/unpack boundary copies
        (profiled ~6% of the 1024px sampling step, r3) then happen once
        per sample instead of once per step."""
        cfg = self.config
        n = len(cfg.resolution_channels)
        n_attn0 = (
            cfg.num_attention_layers[0] if 0 in cfg.attention_levels else 0
        )
        n_tattn0 = (
            cfg.num_temporal_attention_layers[0]
            if cfg.num_temporal_attention_layers is not None
            else 0
        ) or 0
        return bool(
            n > 1
            and not cfg.nesting
            and side % 2 == 0
            and cfg.pack_min_side > 0
            and side >= cfg.pack_min_side
            and cfg.resolution_channels[0] <= 32
            and n_attn0 == 0
            and n_tattn0 == 0
            and not cfg.temporal_mode
        )

    def forward_input_layer(self, x_t, normalize=False, packed=False,
                            train=False, packed_in=False):
        if isinstance(x_t, list) and len(x_t) == 1:
            x_t = x_t[0]
        if normalize:
            # torch .std() is the unbiased estimator -> ddof=1; the
            # statistic reduces over ALL non-batch elements so it is
            # layout-invariant (identical for a packed_in tensor)
            std = jnp.std(
                x_t.astype(jnp.float32), axis=(1, 2, 3), keepdims=True,
                ddof=1,
            ).astype(x_t.dtype)
            x_t = x_t / std
        if packed:
            # pack once at shell entry (or accept an already-packed
            # carry, see packs_input); conv_in runs full-width on the
            # MXU ((3,3,3,C) -> (3,3,12,4C)) instead of a 3-channel conv
            # at full resolution
            from ml_mdm_tpu.ops import space_to_depth as s2d
            from ml_mdm_tpu.ops import fused_resnet as fr
            from ml_mdm_tpu.models.layers import wcached

            p = self.variables["params"]["conv_in"]
            xp = x_t.astype(self.dtype)
            if not packed_in:
                xp = s2d.space_to_depth(xp)
            fast = not train
            if fast and fr.fused_mode() is not None:
                # struct form for the Pallas path (hoisted via wcached)
                pk = wcached(
                    self, "conv_in_ps",
                    lambda: fr._struct_weights(
                        s2d.pack_conv3x3_kernel(p["kernel"])
                    ),
                )
            else:
                pk = wcached(
                    self, "conv_in_pk",
                    lambda: s2d.pack_conv3x3_kernel(p["kernel"]),
                )
            return s2d.packed_conv(
                xp, p["kernel"], p.get("bias"), fast=fast, pk=pk,
            )
        assert not packed_in, "packed_in requires a packed input layer"
        return self.conv_in(x_t)

    def forward_output_layer(self, x, packed=False, train=False,
                             packed_out=False):
        if packed:
            from ml_mdm_tpu.models.layers import group_norm_coeffs
            from ml_mdm_tpu.ops import space_to_depth as s2d
            from ml_mdm_tpu.ops import fused_resnet as fr

            pn = self.variables["params"]["norm_out"]
            a, b = group_norm_coeffs(
                x,
                s2d.pack_channel_vector(pn["scale"]),
                s2d.pack_channel_vector(pn["bias"]),
                self.config.resnet_config.num_groups_norm,
            )
            pc = self.variables["params"]["conv_out"]
            from ml_mdm_tpu.models.layers import wcached

            mode = fr.fused_mode()
            if mode is not None and not train:
                # GN-affine + SiLU + conv_out in one Pallas pass
                y = fr.affine_silu_conv3x3(
                    x,
                    a.reshape(a.shape[0], a.shape[-1]),
                    b.reshape(b.shape[0], b.shape[-1]),
                    wcached(
                        self, "conv_out_ps",
                        lambda: fr._struct_weights(
                            s2d.pack_conv3x3_kernel(pc["kernel"])
                        ),
                    ),
                    s2d.pack_channel_vector(pc["bias"]),
                    interpret=mode == "interpret",
                    packed_struct=True,
                )
            else:
                h = jax.nn.silu(x * a.astype(x.dtype) + b.astype(x.dtype))
                y = s2d.packed_conv(
                    h, pc["kernel"], pc.get("bias"),
                    pk=wcached(
                        self, "conv_out_pk",
                        lambda: s2d.pack_conv3x3_kernel(pc["kernel"]),
                    ),
                )
            return y if packed_out else s2d.depth_to_space(y)
        assert not packed_out, "packed_out requires a packed output layer"
        return self.conv_out(jax.nn.silu(self.norm_out(x)))

    def forward_downsample(self, x, temb, conditioning, cond_mask,
                           train=False, plan=None):
        plan = plan or [False] * len(self.down_blocks)
        skip_activations = [x]
        for i, block in enumerate(self.down_blocks):
            # the last (bottom) stage has no resample: keep its handoff
            # in its own form — the consumer (mid section / upsample)
            # follows plan[i]
            packed_out = plan[i + 1] if i + 1 < len(plan) else plan[i]
            kw = dict(
                return_activations=True, train=train,
                packed_in=plan[i], packed_out=packed_out,
            )
            if i in self.config.attention_levels:
                x, acts = block(
                    x, temb, conditioning=conditioning,
                    cond_mask=cond_mask, **kw,
                )
            else:
                x, acts = block(x, temb, **kw)
            skip_activations.extend(acts)
        return x, skip_activations

    def forward_upsample(
        self, x, temb, conditioning, cond_mask, skip_activations,
        train=False, plan=None,
    ):
        num_res = len(self.config.resolution_channels)
        plan = plan or [False] * num_res
        skips = list(skip_activations)
        for i, block in enumerate(self.up_blocks):
            ri = num_res - 1 - i
            # after the resample the tensor lands at the NEXT up stage's
            # resolution (ri-1); the final stage (ri == 0) hands off to
            # the output layer, which consumes plan[0]'s form directly
            packed_out = plan[ri - 1] if ri > 0 else plan[0]
            num_skip = self.config.num_resnets_per_resolution[ri] + 1
            skip_connections = skips[-num_skip:]
            skip_connections.reverse()
            kw = dict(
                skip_activations=skip_connections, train=train,
                packed_in=plan[ri], packed_out=packed_out,
            )
            if ri in self.config.attention_levels:
                x = block(
                    x, temb, conditioning=conditioning,
                    cond_mask=cond_mask, **kw,
                )
            else:
                x = block(x, temb, **kw)
            del skips[-num_skip:]
        return x

    def forward_micro_conditioning(self, times, micros):
        conds = self.conditions
        temb = 0.0
        for key in conds:
            default = conds[key]
            micro = micros.get(
                key, default * jnp.ones_like(times, dtype=jnp.float32)
            )
            micro = micro.astype(jnp.float32)
            if key == "scale":
                micro = jnp.clip(micro / default, max=1.0) * default
            else:
                micro = micro * 1000.0
            ff = (
                getattr(self, f"cond_layers_{key}_0"),
                getattr(self, f"cond_layers_{key}_1"),
            )
            temb = temb + self.create_temporal_embedding(micro, ff_layers=ff)
        return temb

    def forward_denoising(
        self,
        x_t,
        times,
        cond_emb=None,
        conditioning=None,
        cond_mask=None,
        micros=None,
        train=False,
        packed_io=False,
    ):
        micros = micros or {}
        temb = self.create_temporal_embedding(times)
        if cond_emb is not None:
            temb = temb + cond_emb
        if self.conditions is not None:
            temb = temb + self.forward_micro_conditioning(times, micros)

        if self.config.nesting:
            assert not packed_io, "packed_io only applies to the outer shell"
            x_t, x_feat = x_t
        plan = self._pack_plan(x_t, packed_io=packed_io)
        if packed_io:
            assert plan[0], "packed_io requires a packing stage 0 (packs_input)"
        x = self.forward_input_layer(
            x_t, packed=plan[0], train=train, packed_in=packed_io
        )
        if self.config.nesting:
            x = x + x_feat  # plan[0] is False for nesting UNets

        x, skip_activations = self.forward_downsample(
            x, temb, conditioning, cond_mask, train=train, plan=plan
        )

        if not self.config.skip_mid_blocks:
            x = self.mid_blocks[0](
                x, temb, conditioning=conditioning, cond_mask=cond_mask,
                train=train,
            )
            x = self.mid_blocks[1](x, temb, train=train)

        x = self.forward_upsample(
            x, temb, conditioning, cond_mask, skip_activations, train=train,
            plan=plan,
        )

        x_out = self.forward_output_layer(
            x, packed=plan[0], train=train, packed_out=packed_io
        )
        if self.config.nesting:
            return x_out, x
        return x_out

    def __call__(
        self,
        x_t,
        times,
        conditioning=None,
        cond_mask=None,
        micros=None,
        train: bool = False,
        packed_io: bool = False,
    ):
        # gate matches reference unet.py:979 — cfd>0 alone; outer nested
        # shells (skip_cond_emb=True) still delegate to the innermost's
        # cond path via forward_conditioning.
        if self.effective_cond_dim > 0:
            cond_emb, conditioning, cond_mask = self.forward_conditioning(
                conditioning, cond_mask
            )
        else:
            cond_emb = None
        return self.forward_denoising(
            x_t, times, cond_emb, conditioning, cond_mask, micros,
            train=train, packed_io=packed_io,
        )
