"""Nested (Matryoshka) U-Net: an outer shell whose mid-block is a full
inner UNet/NestedUNet.

Semantics per reference nested_unet.py:96-230: zero-init in/out adapter
convs bridge outer features <-> inner input; forward takes a list of images
per resolution [x_hi, x_lo, ...]; mixed batches (hi-res batch smaller than
low-res batch) are handled with static zero padding; all shells share the
innermost text conditioning while owning their own time/micro embeddings.
"""
from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, List, Optional

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ml_mdm_tpu import config as config_mod
from ml_mdm_tpu.models.unet import UNet, UNetConfig
from ml_mdm_tpu.models.layers import zeros_init


@config_mod.register_model_config("nested_unet", "nested_unet")
@dataclass
class NestedUNetConfig(UNetConfig):
    inner_config: UNetConfig = field(
        default_factory=lambda: UNetConfig(nesting=True)
    )
    skip_mid_blocks: bool = True
    skip_cond_emb: bool = True
    skip_inner_unet_input: bool = False
    skip_normalization: bool = False
    initialize_inner_with_pretrained: Optional[str] = None
    freeze_inner_unet: bool = False
    interp_conditioning: bool = False

    def __post_init__(self):
        super().__post_init__()
        if isinstance(self.inner_config, dict):
            cls = (
                NestedUNetConfig
                if "inner_config" in self.inner_config
                else UNetConfig
            )
            from ml_mdm_tpu.config import dataclass_from_dict

            self.inner_config = dataclass_from_dict(cls, self.inner_config)


@config_mod.register_model_config("nested2_unet", "nested_unet")
@dataclass
class Nested2UNetConfig(NestedUNetConfig):
    inner_config: NestedUNetConfig = field(
        default_factory=lambda: NestedUNetConfig(
            nesting=True, initialize_inner_with_pretrained=None
        )
    )


@config_mod.register_model_config("nested3_unet", "nested_unet")
@dataclass
class Nested3UNetConfig(Nested2UNetConfig):
    inner_config: Nested2UNetConfig = field(
        default_factory=lambda: Nested2UNetConfig(
            nesting=True, initialize_inner_with_pretrained=None
        )
    )


@config_mod.register_model_config("nested4_unet", "nested_unet")
@dataclass
class Nested4UNetConfig(Nested3UNetConfig):
    inner_config: Nested3UNetConfig = field(
        default_factory=lambda: Nested3UNetConfig(
            nesting=True, initialize_inner_with_pretrained=None
        )
    )


def compute_nest_ratio(config) -> List[int]:
    """Per-shell downsampling ratios, outermost first (nested_unet.py:134-145)."""
    ratio = int(2 ** (len(config.resolution_channels) - 1))
    if config.temporal_mode and not config.temporal_spatial_ds:
        ratio = int(np.sqrt(ratio))
    inner = getattr(config, "inner_config", None)
    if inner is not None and getattr(inner, "inner_config", None) is not None:
        inner_ratios = compute_nest_ratio(inner)
        return [ratio * inner_ratios[0]] + inner_ratios
    return [ratio]


@config_mod.register_model("nested_unet")
class NestedUNet(UNet):
    config: NestedUNetConfig = None

    @property
    def model_type(self):
        return "nested_unet"

    @property
    def nest_ratio(self):
        return compute_nest_ratio(self.config)

    @property
    def is_temporal(self):
        flags = [
            self.config.temporal_mode and not self.config.temporal_spatial_ds
        ]
        inner = self.config.inner_config
        while getattr(inner, "inner_config", None) is not None:
            flags.append(inner.temporal_mode and not inner.temporal_spatial_ds)
            inner = inner.inner_config
        return flags

    def setup(self):
        super().setup()
        cfg = self.config
        inner_cfg = cfg.inner_config
        cond_dim = self.effective_cond_dim
        if getattr(inner_cfg, "inner_config", None) is None:
            self.inner_unet = UNet(
                self.input_channels,
                self.output_channels,
                inner_cfg,
                cond_dim_override=cond_dim,
                dtype=self.dtype,
            )
        else:
            self.inner_unet = NestedUNet(
                self.input_channels,
                self.output_channels,
                inner_cfg,
                cond_dim_override=cond_dim,
                dtype=self.dtype,
            )

        if not cfg.skip_inner_unet_input:
            self.in_adapter = nn.Conv(
                inner_cfg.resolution_channels[0],
                (3, 3),
                padding=1,
                kernel_init=zeros_init,
                bias_init=zeros_init,
                dtype=self.dtype,
            )
        else:
            self.in_adapter = None
        self.out_adapter = nn.Conv(
            cfg.resolution_channels[-1],
            (3, 3),
            padding=1,
            kernel_init=zeros_init,
            bias_init=zeros_init,
            dtype=self.dtype,
        )
        if cfg.interp_conditioning:
            # present in reference checkpoints (nested_unet.py:157-159);
            # created for state-dict parity, unused in forward there too.
            self.interp_layer1 = nn.Dense(self.temporal_dim, dtype=self.dtype)
            self.interp_layer2 = nn.Dense(self.temporal_dim, dtype=self.dtype)

    def forward_conditioning(self, conditioning, cond_mask):
        return self.inner_unet.forward_conditioning(conditioning, cond_mask)

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
        if self.config.interp_conditioning and self.is_initializing():
            # materialise the state-dict-only interp layers (reference
            # nested_unet.py:157-159 declares them and never calls them;
            # Flax only creates params for invoked submodules, so touch
            # them at init time to keep .pth round-trips exact)
            d = jnp.zeros((1, self.temporal_dim // 4), self.dtype)
            self.interp_layer2(self.interp_layer1(d))
        temb = self.create_temporal_embedding(times)
        if cond_emb is not None:
            temb = temb + cond_emb
        if self.conditions is not None:
            temb = temb + self.forward_micro_conditioning(times, micros)

        if self.config.nesting:
            assert not packed_io, "packed_io only applies to the outer shell"
            x_t, x_feat = x_t
        bsz = [x.shape[0] for x in x_t]
        bh, bl = bsz[0], bsz[1]
        x_t_low, x_hi = x_t[1:], x_t[0]
        plan = self._pack_plan(x_hi, packed_io=packed_io)
        if packed_io:
            assert plan[0], "packed_io requires a packing stage 0 (packs_input)"
        x = self.forward_input_layer(
            x_hi, normalize=not self.config.skip_normalization,
            packed=plan[0], train=train, packed_in=packed_io,
        )
        if self.config.nesting:
            x = x + x_feat  # plan[0] is False for nesting shells

        cm = cond_mask[:bh] if cond_mask is not None else None
        cond_hi = conditioning[:bh] if conditioning is not None else None
        x, skip_activations = self.forward_downsample(
            x, temb[:bh], cond_hi, cm, train=train, plan=plan
        )

        # inner unet (pad zeros for the mixed-batch low-res rows).
        # When the bottom stage ran space-to-depth packed (plan[-1]),
        # the adapter section is the one place needing the plain layout:
        # unpack here, repack after the residual add — two cheap layout
        # moves instead of running the whole stage's resnets unpacked.
        if plan[-1]:
            from ml_mdm_tpu.ops import space_to_depth as s2d

            x = s2d.depth_to_space(x)
        x_inner = self.in_adapter(x) if self.in_adapter is not None else None
        if x_inner is not None and bh < bl:
            pad = jnp.zeros((bl - bh,) + x_inner.shape[1:], x_inner.dtype)
            x_inner = jnp.concatenate([x_inner, pad], axis=0)
        x_low, x_inner = self.inner_unet.forward_denoising(
            (x_t_low, x_inner),
            times,
            cond_emb,
            conditioning,
            cond_mask,
            micros,
            train=train,
        )
        x_inner = self.out_adapter(x_inner)
        x = x + (x_inner[:bh] if bh < bl else x_inner)
        if plan[-1]:
            x = s2d.space_to_depth(x)

        x = self.forward_upsample(
            x, temb[:bh], cond_hi, cm, skip_activations, train=train,
            plan=plan,
        )
        x_out = self.forward_output_layer(
            x, packed=plan[0], train=train, packed_out=packed_io
        )

        out = [x_out] + x_low if isinstance(x_low, list) else [x_out, x_low]
        if self.config.nesting:
            return out, x
        return out
