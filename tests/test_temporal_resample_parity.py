"""Torch parity for the temporal-mode 1-D resample path.

In temporal mode without ``temporal_spatial_ds``, a stage's resample
layer operates across FRAMES, not space: the reference rearranges
``(b t) c h w -> (b h w) c t`` and applies a Conv1d (stride 2 down /
nearest-2x-then-conv up) — reference unet.py:511-513 (Conv1d choice)
and :563-572 (the rearrange + interpolate). These tests run the same
weights and inputs through the reference ResNetBlock and this repo's
ResNetBlockStage and compare numerically.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference

load_reference()
from ml_mdm.models import unet as r_unet  # noqa: E402

from ml_mdm_tpu.models.layers import (  # noqa: E402
    ResNetBlockStage,
    ResNetConfig,
)
from ml_mdm_tpu.utils.torch_compat import (  # noqa: E402
    torch_state_dict_to_params,
)

B, T, S, C, TDIM = 2, 4, 8, 32, 32


def _stage_pair(downsample, upsample, t_attn_layers=1):
    r_rc = r_unet.ResNetConfig(
        num_channels=C, output_channels=C, num_groups_norm=8,
        dropout=0.0, use_attention_ffn=False,
    )
    tm = r_unet.ResNetBlock(
        TDIM,
        1,  # num_residual_blocks
        0,  # num_attention_layers
        downsample_output=downsample,
        upsample_output=upsample,
        resnet_configs=[r_rc],
        temporal_mode=True,
        temporal_pos_emb=False,
        temporal_spatial_ds=False,
        num_temporal_attention_layers=t_attn_layers,
    ).eval()

    jm = ResNetBlockStage(
        temporal_dim=TDIM,
        num_residual_blocks=1,
        num_attention_layers=0,
        downsample_output=downsample,
        upsample_output=upsample,
        resnet_configs=[
            ResNetConfig(
                num_channels=C, output_channels=C, num_groups_norm=8,
                dropout=0.0, use_attention_ffn=False,
            )
        ],
        temporal_mode=True,
        temporal_pos_emb=False,
        temporal_spatial_ds=False,
        num_temporal_attention_layers=t_attn_layers,
    )
    x0 = jnp.zeros((B * T, S, S, C))
    temb0 = jnp.zeros((B, TDIM))
    template = jax.jit(jm.init)(jax.random.PRNGKey(0), x0, temb0)["params"]
    params, unmatched, unfilled = torch_state_dict_to_params(
        tm.state_dict(), template
    )
    assert unmatched == [], f"unmatched torch keys: {unmatched}"
    assert unfilled == [], f"unfilled flax leaves: {unfilled}"
    return tm, jm, params


def _run_pair(tm, jm, params):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B * T, C, S, S)).astype(np.float32)
    temb = rng.standard_normal((B, TDIM)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(temb)).numpy()
    out = jm.apply(
        {"params": params},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(temb),
    )
    return ref, np.transpose(np.asarray(out), (0, 3, 1, 2))


def test_temporal_downsample_halves_frames_and_matches_torch():
    tm, jm, params = _stage_pair(downsample=True, upsample=False)
    ref, out = _run_pair(tm, jm, params)
    # frame axis halves (stride-2 over t); spatial side is unchanged
    assert ref.shape == (B * T // 2, C, S, S)
    assert out.shape == ref.shape
    assert np.max(np.abs(ref - out)) < 2e-5, np.max(np.abs(ref - out))


def test_temporal_upsample_doubles_frames_and_matches_torch():
    tm, jm, params = _stage_pair(downsample=False, upsample=True)
    ref, out = _run_pair(tm, jm, params)
    assert ref.shape == (B * T * 2, C, S, S)
    assert out.shape == ref.shape
    assert np.max(np.abs(ref - out)) < 2e-5, np.max(np.abs(ref - out))


def test_temporal_spatial_ds_keeps_2d_resample():
    """With temporal_spatial_ds the reference keeps Conv2d spatial
    resampling (unet.py:512); frames stay, space halves."""
    r_rc = r_unet.ResNetConfig(
        num_channels=C, output_channels=C, num_groups_norm=8,
        dropout=0.0, use_attention_ffn=False,
    )
    tm = r_unet.ResNetBlock(
        TDIM, 1, 0, downsample_output=True, upsample_output=False,
        resnet_configs=[r_rc], temporal_mode=True,
        temporal_spatial_ds=True, num_temporal_attention_layers=None,
    ).eval()
    jm = ResNetBlockStage(
        temporal_dim=TDIM, num_residual_blocks=1, num_attention_layers=0,
        downsample_output=True, upsample_output=False,
        resnet_configs=[
            ResNetConfig(
                num_channels=C, output_channels=C, num_groups_norm=8,
                dropout=0.0, use_attention_ffn=False,
            )
        ],
        temporal_mode=True, temporal_spatial_ds=True,
        num_temporal_attention_layers=None,
    )
    x0 = jnp.zeros((B * T, S, S, C))
    temb0 = jnp.zeros((B, TDIM))
    template = jax.jit(jm.init)(jax.random.PRNGKey(0), x0, temb0)["params"]
    params, unmatched, unfilled = torch_state_dict_to_params(
        tm.state_dict(), template
    )
    assert unmatched == [] and unfilled == []
    ref, out = _run_pair(tm, jm, params)
    assert ref.shape == (B * T, C, S // 2, S // 2)
    assert out.shape == ref.shape
    assert np.max(np.abs(ref - out)) < 2e-5, np.max(np.abs(ref - out))
