"""Exactness of the space-to-depth conv rewrite (ops/space_to_depth.py):
the packed path must compute the identical function."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_mdm_tpu.ops import space_to_depth as s2d


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 5))
    y = s2d.space_to_depth(x)
    assert y.shape == (2, 4, 4, 20)
    np.testing.assert_array_equal(np.asarray(s2d.depth_to_space(y)),
                                  np.asarray(x))


@pytest.mark.parametrize("cin,cout", [(4, 4), (3, 8)])
def test_packed_conv3x3_exact(cin, cout):
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 16, 16, cin))
    w = jax.random.normal(k2, (3, 3, cin, cout)) * 0.2
    b = jax.random.normal(k3, (cout,))

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b

    out = s2d.depth_to_space(
        s2d.packed_conv(s2d.space_to_depth(x), w, b)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv1x1_exact():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 6))
    w = jax.random.normal(k2, (1, 1, 6, 10)) * 0.3

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = s2d.depth_to_space(s2d.packed_conv(s2d.space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_groupnorm_packing_is_exact():
    """GN on the packed layout with repeated scale/bias == GN unpacked."""
    from ml_mdm_tpu.models.layers import GroupNormF32

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 8)) * 3 + 1
    gn = GroupNormF32(num_groups=4)
    v = gn.init(jax.random.PRNGKey(4), x)
    ref = gn.apply(v, x)

    xp = s2d.space_to_depth(x)
    vp = jax.tree_util.tree_map(s2d.pack_channel_vector, v)
    gn_p = GroupNormF32(num_groups=4)
    out = s2d.depth_to_space(gn_p.apply(vp, xp))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_unet_stage_exact():
    """Full UNet forward with packed small-channel stages == unpacked
    (same params), on a conv-only config."""
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.unet import UNet, UNetConfig

    kw = dict(
        resolution_channels=[8, 16],
        num_resnets_per_resolution=[2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=False,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    m_plain = UNet(3, 3, UNetConfig(pack_min_side=0, **kw))
    m_packed = UNet(3, 3, UNetConfig(pack_min_side=8, **kw))

    b, side = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, side, side, 3))
    t = jnp.asarray([3, 7], jnp.int32)
    lm = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 16))
    mask = jnp.ones((b, 4))
    params = jax.jit(m_plain.init)(
        jax.random.PRNGKey(2), x, t, lm, mask, {}
    )["params"]

    ref = m_plain.apply({"params": params}, x, t, lm, mask, {})
    out = m_packed.apply({"params": params}, x, t, lm, mask, {})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_strided_conv_exact():
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 16, 16, 4))
    w = jax.random.normal(k2, (3, 3, 4, 6)) * 0.2
    b = jax.random.normal(k3, (6,))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    out = s2d.packed_strided_conv(s2d.space_to_depth(x), w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_upsample_conv_exact():
    key = jax.random.PRNGKey(6)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 8, 8, 4))
    w = jax.random.normal(k2, (3, 3, 4, 6)) * 0.2
    b = jax.random.normal(k3, (6,))
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = jax.lax.conv_general_dilated(
        up, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    out = s2d.packed_upsample_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_strided_conv_p2p_exact():
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 16, 16, 4))
    w = jax.random.normal(k2, (3, 3, 4, 6)) * 0.2
    b = jax.random.normal(k3, (6,))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    out = s2d.depth_to_space(
        s2d.packed_strided_conv_p2p(s2d.space_to_depth(x), w, b)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_packed", [False, True])
@pytest.mark.parametrize("out_packed", [False, True])
def test_packed_upsample_conv_io_forms(in_packed, out_packed):
    key = jax.random.PRNGKey(8)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 8, 8, 4))
    w = jax.random.normal(k2, (3, 3, 4, 6)) * 0.2
    b = jax.random.normal(k3, (6,))
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = jax.lax.conv_general_dilated(
        up, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    xin = s2d.space_to_depth(x) if in_packed else x
    out = s2d.packed_upsample_conv(
        xin, w, b, in_packed=in_packed, out_packed=out_packed
    )
    if out_packed:
        out = s2d.depth_to_space(out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_unet_three_level_plan_exact():
    """UNet with TWO adjacent packed stages: exercises the packed->packed
    strided downsample, packed skip handoffs, packed conv_in/conv_out,
    and the packed-out upsample transitions."""
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.unet import UNet, UNetConfig

    kw = dict(
        resolution_channels=[8, 8, 16],
        num_resnets_per_resolution=[2, 2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0, 0],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=False,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    m_plain = UNet(3, 3, UNetConfig(pack_min_side=0, **kw))
    m_packed = UNet(3, 3, UNetConfig(pack_min_side=16, **kw))

    b, side = 2, 32  # stages at 32 and 16 pack; 8 (last) does not
    x = jax.random.normal(jax.random.PRNGKey(0), (b, side, side, 3))
    t = jnp.asarray([3, 7], jnp.int32)
    lm = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 16))
    mask = jnp.ones((b, 4))
    params = jax.jit(m_plain.init)(
        jax.random.PRNGKey(2), x, t, lm, mask, {}
    )["params"]

    ref = m_plain.apply({"params": params}, x, t, lm, mask, {})
    out = m_packed.apply({"params": params}, x, t, lm, mask, {})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_nested_shell_plan_exact():
    """NestedUNet outer shell with packed stages == unpacked, same
    params (the cc12m_1024 shape in miniature)."""
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.nested_unet import NestedUNet, NestedUNetConfig
    from ml_mdm_tpu.models.unet import UNetConfig

    inner = dict(
        resolution_channels=[16, 32],
        num_resnets_per_resolution=[1, 1],
        attention_levels=[1],
        num_attention_layers=[0, 1],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        skip_mid_blocks=False,
        skip_cond_emb=False,
        nesting=True,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    outer = dict(
        resolution_channels=[8, 8, 16],
        num_resnets_per_resolution=[2, 2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0, 0],
        conditioning_feature_dim=16,
        num_lm_head_layers=0,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=True,
        skip_inner_unet_input=False,
        skip_normalization=True,
        temporal_dim=64,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    m_plain = NestedUNet(3, 3, NestedUNetConfig(
        pack_min_side=0,
        inner_config=UNetConfig(pack_min_side=0, **inner), **outer))
    m_packed = NestedUNet(3, 3, NestedUNetConfig(
        pack_min_side=16,
        inner_config=UNetConfig(pack_min_side=16, **inner), **outer))

    b = 2
    xs = [
        jax.random.normal(jax.random.PRNGKey(0), (b, 32, 32, 3)),
        jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 3)),
    ]
    t = jnp.asarray([3, 7], jnp.int32)
    lm = jax.random.normal(jax.random.PRNGKey(2), (b, 4, 16))
    mask = jnp.ones((b, 4))
    params = jax.jit(m_plain.init)(
        jax.random.PRNGKey(3), xs, t, lm, mask, {}
    )["params"]

    refs = m_plain.apply({"params": params}, xs, t, lm, mask, {})
    outs = m_packed.apply({"params": params}, xs, t, lm, mask, {})
    for r, o in zip(refs, outs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_fused_resnet_kernel_exact():
    """Pallas fused affine+silu+conv3x3 == pure-XLA reference
    (interpret mode so it runs on CPU)."""
    from ml_mdm_tpu.ops.fused_resnet import (
        affine_silu_conv3x3, reference_affine_silu_conv3x3)

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    B, H, W, C, CO = 2, 16, 12, 8, 8
    x = jax.random.normal(ks[0], (B, H, W, C)) * 0.5
    a = jax.random.normal(ks[1], (B, C)) * 0.2 + 1.0
    b = jax.random.normal(ks[2], (B, C)) * 0.1
    w = jax.random.normal(ks[3], (3, 3, C, CO)) * 0.1
    bias = jax.random.normal(ks[4], (CO,)) * 0.1
    res = jax.random.normal(ks[5], (B, H, W, CO))
    for r in (None, res):
        got = affine_silu_conv3x3(x, a, b, w, bias, r, interpret=True)
        ref = reference_affine_silu_conv3x3(x, a, b, w, bias, r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fused_resnet_kernel_multi_operand_and_proj():
    """The N-operand form == conv of the channel concatenation; the
    ride-along 1x1 projection == conv1x1 of the raw concat; the emitted
    stats == sum / sum-of-squares of the output (interpret mode)."""
    from ml_mdm_tpu.ops.fused_resnet import (
        affine_silu_conv3x3, reference_affine_silu_conv3x3)

    ks = jax.random.split(jax.random.PRNGKey(7), 10)
    B, H, W, C1, C2, CO, CP = 2, 16, 12, 8, 16, 8, 12
    x1 = jax.random.normal(ks[0], (B, H, W, C1)) * 0.5
    x2 = jax.random.normal(ks[1], (B, H, W, C2)) * 0.5
    a = jax.random.normal(ks[2], (B, C1 + C2)) * 0.2 + 1.0
    b = jax.random.normal(ks[3], (B, C1 + C2)) * 0.1
    w = jax.random.normal(ks[4], (3, 3, C1 + C2, CO)) * 0.1
    bias = jax.random.normal(ks[5], (CO,)) * 0.1
    res = jax.random.normal(ks[6], (B, H, W, CO))
    rk = jax.random.normal(ks[7], (C1 + C2, CP)) * 0.1
    rb = jax.random.normal(ks[8], (CP,)) * 0.1

    xc = jnp.concatenate([x1, x2], axis=-1)
    ref = reference_affine_silu_conv3x3(xc, a, b, w, bias, res)
    proj_ref = (
        jnp.einsum("bhwc,cp->bhwp", xc, rk) + rb
    ).astype(xc.dtype)

    got, s1, s2, proj = affine_silu_conv3x3(
        (x1, x2),
        (a[:, :C1], a[:, C1:]),
        (b[:, :C1], b[:, C1:]),
        (w[:, :, :C1, :], w[:, :, C1:, :]),
        bias, res, interpret=True, emit_stats=True,
        proj_kernel=(rk[:C1], rk[C1:]), proj_bias=rb,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(proj_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(jnp.sum(got, axis=(1, 2),
                                           dtype=jnp.float32)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s2),
        np.asarray(jnp.sum(jnp.square(got.astype(jnp.float32)),
                           axis=(1, 2))),
        rtol=1e-5, atol=1e-5)


def test_fused_resnet_stage_matches_plain(monkeypatch):
    """The packed UNet with the Pallas fused-resnet path (interpret
    mode) == the unpacked plain path, same params."""
    monkeypatch.setenv("ML_MDM_TPU_FUSED", "interpret")
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.unet import UNet, UNetConfig

    kw = dict(
        resolution_channels=[8, 16],
        num_resnets_per_resolution=[2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=False,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    m_plain = UNet(3, 3, UNetConfig(pack_min_side=0, **kw))
    m_packed = UNet(3, 3, UNetConfig(pack_min_side=8, **kw))

    b, side = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, side, side, 3))
    t = jnp.asarray([3, 7], jnp.int32)
    lm = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 16))
    mask = jnp.ones((b, 4))
    params = jax.jit(m_plain.init)(
        jax.random.PRNGKey(2), x, t, lm, mask, {}
    )["params"]

    ref = m_plain.apply({"params": params}, x, t, lm, mask, {})
    out = m_packed.apply({"params": params}, x, t, lm, mask, {})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_resnet_lazy_concat_matches_plain(monkeypatch):
    """ResNet fed the lazy (x, skip) tuple through the UNPACKED fused
    eval path (interpret) == the plain path on the materialised concat
    — including the ride-along conv3 shortcut projection."""
    from ml_mdm_tpu.models.layers import ResNet, ResNetConfig

    cfg = ResNetConfig(num_channels=24, output_channels=12,
                       num_groups_norm=4, dropout=0.0)
    m = ResNet(cfg)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16))
    xc = jnp.concatenate([x1, x2], axis=-1)
    temb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    params = m.init(jax.random.PRNGKey(3), xc, temb)["params"]

    monkeypatch.setenv("ML_MDM_TPU_FUSED", "0")
    ref = m.apply({"params": params}, xc, temb)
    monkeypatch.setenv("ML_MDM_TPU_FUSED", "interpret")
    monkeypatch.setenv("ML_MDM_TPU_FUSED_MIN_SIDE", "8")
    out = m.apply({"params": params}, (x1, x2), temb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and with the ride-along projection disabled (separate XLA conv3)
    monkeypatch.setenv("ML_MDM_TPU_FUSED_PROJ", "0")
    out2 = m.apply({"params": params}, (x1, x2), temb)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_resnet_train_grads_match_plain(monkeypatch):
    """Training through the fused custom_vjp path (interpret) produces
    the same loss and parameter gradients as the plain XLA path."""
    monkeypatch.setenv("ML_MDM_TPU_FUSED", "0")
    monkeypatch.setenv("ML_MDM_TPU_FUSED_TRAIN", "interpret")
    monkeypatch.setenv("ML_MDM_TPU_FUSED_MIN_SIDE", "8")
    from ml_mdm_tpu.models.layers import ResNet, ResNetConfig

    cfg = ResNetConfig(num_channels=8, output_channels=12,
                       num_groups_norm=4, dropout=0.0)
    m = ResNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    params = m.init(jax.random.PRNGKey(2), x, temb)["params"]

    def loss(p, train):
        y = m.apply({"params": p}, x, temb, train=train)
        return jnp.sum(jnp.square(y)).astype(jnp.float32)

    # train=True engages the fused custom_vjp path (env above);
    # train=False with ML_MDM_TPU_FUSED=0 is the plain path
    l_fused, g_fused = jax.value_and_grad(lambda p: loss(p, True))(params)
    l_plain, g_plain = jax.value_and_grad(lambda p: loss(p, False))(params)
    np.testing.assert_allclose(float(l_fused), float(l_plain),
                               rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(g_fused)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_plain)}
    for k, v in flat_f:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_p[jax.tree_util.keystr(k)]),
            rtol=2e-4, atol=2e-4, err_msg=jax.tree_util.keystr(k))


def test_fused_resnet_train_grads_match_plain_packed(monkeypatch):
    """Packed stage with the fused custom_vjp training path (interpret)
    == unpacked plain path: same loss, same parameter grads."""
    monkeypatch.setenv("ML_MDM_TPU_FUSED", "0")
    monkeypatch.setenv("ML_MDM_TPU_FUSED_TRAIN", "interpret")
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.unet import UNet, UNetConfig

    kw = dict(
        resolution_channels=[8, 16],
        num_resnets_per_resolution=[2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=False,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    m_plain = UNet(3, 3, UNetConfig(pack_min_side=0, **kw))
    m_packed = UNet(3, 3, UNetConfig(pack_min_side=8, **kw))

    b, side = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, side, side, 3))
    t = jnp.asarray([3, 7], jnp.int32)
    lm = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 16))
    mask = jnp.ones((b, 4))
    params = jax.jit(m_plain.init)(
        jax.random.PRNGKey(2), x, t, lm, mask, {}
    )["params"]

    def loss(m, p):
        y = m.apply({"params": p}, x, t, lm, mask, {}, train=True,
                    rngs={"dropout": jax.random.PRNGKey(5)})
        return jnp.sum(jnp.square(y)).astype(jnp.float32)

    l_pk, g_pk = jax.value_and_grad(lambda p: loss(m_packed, p))(params)
    l_pl, g_pl = jax.value_and_grad(lambda p: loss(m_plain, p))(params)
    np.testing.assert_allclose(float(l_pk), float(l_pl), rtol=1e-5)
    flat_pl = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_pl)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_pk):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_pl[jax.tree_util.keystr(k)]),
            rtol=3e-4, atol=3e-4, err_msg=jax.tree_util.keystr(k))


# ---------------------------------------------------------------------------
# Packed sampling carry (packed_io): the hi-res carry stays space-to-depth
# packed across the whole denoise loop; pack/unpack happens once per sample.
# ---------------------------------------------------------------------------


def _mini_nested_pipeline(pack_min_side=16):
    from ml_mdm_tpu.diffusion import NestedDiffusion, NestedDiffusionConfig
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.nested_unet import NestedUNet, NestedUNetConfig
    from ml_mdm_tpu.models.unet import UNetConfig
    from ml_mdm_tpu.samplers import SamplerConfig

    inner = dict(
        resolution_channels=[16, 32],
        num_resnets_per_resolution=[1, 1],
        attention_levels=[1],
        num_attention_layers=[0, 1],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        skip_mid_blocks=False,
        skip_cond_emb=False,
        nesting=True,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    outer = dict(
        resolution_channels=[8, 8, 16],
        num_resnets_per_resolution=[2, 2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0, 0],
        conditioning_feature_dim=16,
        num_lm_head_layers=0,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=True,
        skip_inner_unet_input=False,
        skip_normalization=True,
        temporal_dim=64,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    mod = NestedUNet(3, 3, NestedUNetConfig(
        pack_min_side=pack_min_side,
        inner_config=UNetConfig(pack_min_side=pack_min_side, **inner),
        **outer))
    dcfg = NestedDiffusionConfig(
        sampler_config=SamplerConfig(
            num_diffusion_steps=8, schedule_shifted=True,
        ),
        no_use_residual=True,
    )
    return NestedDiffusion(mod, dcfg)


def test_packs_input_matches_plan():
    """packs_input (the host-side gate for keeping the carry packed) must
    equal the runtime _pack_plan[0] decision."""
    pipe = _mini_nested_pipeline()
    mod = pipe.vision_module
    assert mod.packs_input(32) is True
    assert mod.packs_input(8) is False    # below pack_min_side
    assert mod.packs_input(31) is False   # odd side

    # a nesting (inner) shell never packs its input
    from ml_mdm_tpu.models.unet import UNet, UNetConfig

    m_nest = UNet(3, 3, UNetConfig(
        resolution_channels=[8, 16],
        num_resnets_per_resolution=[1, 1],
        attention_levels=[],
        num_attention_layers=[0, 0],
        nesting=True,
        pack_min_side=16,
    ))
    assert m_nest.packs_input(32) is False

    # the real 1024 outer-shell shape: [32, 32, 64] channels, no attention

    cfg = UNetConfig(
        resolution_channels=[32, 32, 64],
        num_resnets_per_resolution=[2, 2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0, 0],
        skip_mid_blocks=True,
        skip_cond_emb=True,
    )
    m = UNet(3, 3, cfg)
    assert m.packs_input(1024) is True
    assert m.packs_input(256) is False   # below default pack_min_side=512


def test_packed_carry_nested_sample_matches():
    """NestedDiffusion.sample with the packed carry (auto-enabled) ==
    the same sample with packing forced off (deterministic: ddim_eta=0)."""
    pipe = _mini_nested_pipeline()
    assert pipe._packed_io(32) is True

    params = pipe.init_params(jax.random.PRNGKey(0), image_side=32,
                              lm_dim=16, seq_len=4, batch=1)
    b = 2
    lm = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 16))
    sample = {"lm_outputs": lm, "lm_mask": jnp.ones((b, 4))}
    key = jax.random.PRNGKey(2)

    out_packed = pipe.sample(
        params, b, sample, 32, key,
        num_inference_steps=4, resample_steps=True, ddim_eta=0.0,
    )
    pipe_off = _mini_nested_pipeline()
    pipe_off._packed_io = lambda side: False
    out_plain = pipe_off.sample(
        params, b, sample, 32, key,
        num_inference_steps=4, resample_steps=True, ddim_eta=0.0,
    )
    assert out_packed.shape == (b, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out_packed),
                               np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)


def test_packed_carry_nested_chunked_and_stream():
    """sample_chunked and sample_stream with the packed carry produce the
    unpacked shapes and match the fused packed sample (same key, eta=0)."""
    pipe = _mini_nested_pipeline()
    params = pipe.init_params(jax.random.PRNGKey(0), image_side=32,
                              lm_dim=16, seq_len=4, batch=1)
    b = 2
    lm = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 16))
    sample = {"lm_outputs": lm, "lm_mask": jnp.ones((b, 4))}
    key = jax.random.PRNGKey(2)

    ref = pipe.sample(
        params, b, sample, 32, key,
        num_inference_steps=4, resample_steps=True, ddim_eta=0.0,
    )
    out_c = pipe.sample_chunked(
        params, b, sample, 32, key,
        num_inference_steps=4, resample_steps=True, ddim_eta=0.0,
        chunk_steps=2,
    )
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    frames = list(pipe.sample_stream(
        params, b, sample, 32, key,
        num_inference_steps=4, resample_steps=True, ddim_eta=0.0,
    ))
    assert len(frames) == 4
    for x0, xt, _ in frames:
        assert x0.shape == (b, 32, 32, 3)
        assert xt.shape == (b, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(frames[-1][1]), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_carry_single_res_sample_matches():
    """Single-res Diffusion with a packing stage-0: packed carry == off."""
    from ml_mdm_tpu.diffusion import Diffusion, DiffusionConfig
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.unet import UNet, UNetConfig
    from ml_mdm_tpu.samplers import SamplerConfig

    kw = dict(
        resolution_channels=[8, 16],
        num_resnets_per_resolution=[2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=False,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )

    def make():
        return Diffusion(
            UNet(3, 3, UNetConfig(pack_min_side=16, **kw)),
            DiffusionConfig(
                sampler_config=SamplerConfig(num_diffusion_steps=8)
            ),
        )

    pipe = make()
    assert pipe._packed_io(16) is True
    params = pipe.init_params(jax.random.PRNGKey(0), image_side=16,
                              lm_dim=16, seq_len=4, batch=1)
    b = 2
    lm = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 16))
    sample = {"lm_outputs": lm, "lm_mask": jnp.ones((b, 4))}
    key = jax.random.PRNGKey(2)
    out_packed = pipe.sample(
        params, b, sample, 16, key,
        num_inference_steps=4, resample_steps=True, ddim_eta=0.0,
    )
    pipe_off = make()
    pipe_off._packed_io = lambda side: False
    out_plain = pipe_off.sample(
        params, b, sample, 16, key,
        num_inference_steps=4, resample_steps=True, ddim_eta=0.0,
    )
    assert out_packed.shape == (b, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out_packed),
                               np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)


def test_fused_resnet_kernel_pipelined_variants():
    """The software-pipelined kernel (act/dot overlap via a
    dynamically-indexed double buffer, ops/fused_resnet.py
    _kernel_pipelined) matches the pure-XLA reference across the
    single-op / stats / residual / multi-operand / proj variants and at
    an odd row-block count (interpret mode)."""
    from ml_mdm_tpu.ops.fused_resnet import (
        affine_silu_conv3x3, reference_affine_silu_conv3x3)

    ks = jax.random.split(jax.random.PRNGKey(3), 10)
    B, H, W, C1, C2, CO, CP = 2, 32, 12, 8, 16, 8, 12
    x1 = jax.random.normal(ks[0], (B, H, W, C1)) * 0.5
    x2 = jax.random.normal(ks[1], (B, H, W, C2)) * 0.5
    a = jax.random.normal(ks[2], (B, C1 + C2)) * 0.2 + 1.0
    b = jax.random.normal(ks[3], (B, C1 + C2)) * 0.1
    w = jax.random.normal(ks[4], (3, 3, C1 + C2, CO)) * 0.1
    bias = jax.random.normal(ks[5], (CO,)) * 0.1
    res = jax.random.normal(ks[6], (B, H, W, CO))
    rk = jax.random.normal(ks[7], (C1 + C2, CP)) * 0.1
    rb = jax.random.normal(ks[8], (CP,)) * 0.1

    a1, b1, w1 = a[:, :C1], b[:, :C1], w[:, :, :C1, :]
    for r in (None, res):
        for silu in (True, False):
            got = affine_silu_conv3x3(
                x1, a1, b1, w1, bias, r, apply_silu=silu,
                interpret=True, pipelined=True, tile_h=8)
            ref = reference_affine_silu_conv3x3(
                x1, a1, b1, w1, bias, r, apply_silu=silu)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)

    # stats ride-along
    got, s1, s2 = affine_silu_conv3x3(
        x1, a1, b1, w1, bias, res, interpret=True, pipelined=True,
        tile_h=8, emit_stats=True)
    np.testing.assert_allclose(
        np.asarray(s1),
        np.asarray(jnp.sum(got, axis=(1, 2), dtype=jnp.float32)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s2),
        np.asarray(jnp.sum(jnp.square(got.astype(jnp.float32)),
                           axis=(1, 2))),
        rtol=1e-5, atol=1e-5)

    # 2-operand skip-concat + 1x1 shortcut projection + stats
    xc = jnp.concatenate([x1, x2], axis=-1)
    ref = reference_affine_silu_conv3x3(xc, a, b, w, bias, res)
    proj_ref = (jnp.einsum("bhwc,cp->bhwp", xc, rk) + rb).astype(xc.dtype)
    got, s1, s2, proj = affine_silu_conv3x3(
        (x1, x2), (a[:, :C1], a[:, C1:]), (b[:, :C1], b[:, C1:]),
        (w[:, :, :C1, :], w[:, :, C1:, :]), bias, res,
        interpret=True, pipelined=True, tile_h=8, emit_stats=True,
        proj_kernel=(rk[:C1], rk[C1:]), proj_bias=rb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(proj_ref),
                               rtol=2e-5, atol=2e-5)

    # odd n_i (H=40, th=8 -> 5 row blocks), bf16 carry dtype
    x5 = jnp.tile(x1, (1, 5, 1, 1))[:, :40].astype(jnp.bfloat16)
    got = affine_silu_conv3x3(
        x5, a1, b1, w1, bias, None, interpret=True, pipelined=True,
        tile_h=8)
    ref = reference_affine_silu_conv3x3(x5, a1, b1, w1, bias, None)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32),
        np.asarray(ref, dtype=np.float32), rtol=2e-2, atol=2e-2)


def test_fused_resnet_kernel_packed_struct():
    """packed_struct=True (4 structured dots exploiting the 75%
    structural zeros of a space-to-depth packed kernel, ops/
    fused_resnet.py _struct_dots) == the dense 9-tap path == the
    unpacked conv, across serial/pipelined, multi-operand, stats,
    residual and proj variants (interpret mode)."""
    from ml_mdm_tpu.ops import space_to_depth as s2d
    from ml_mdm_tpu.ops.fused_resnet import affine_silu_conv3x3

    ks = jax.random.split(jax.random.PRNGKey(11), 12)
    B, H, W, C1, C2, CO = 2, 32, 24, 8, 4, 8
    # unpacked inputs / kernels; packed channel counts 4*C
    x1 = jax.random.normal(ks[0], (B, H, W, C1)) * 0.5
    x2 = jax.random.normal(ks[1], (B, H, W, C2)) * 0.5
    w1 = jax.random.normal(ks[2], (3, 3, C1, CO)) * 0.1
    w2 = jax.random.normal(ks[3], (3, 3, C2, CO)) * 0.1
    a = jax.random.normal(ks[4], (B, 4 * (C1 + C2))) * 0.2 + 1.0
    b = jax.random.normal(ks[5], (B, 4 * (C1 + C2))) * 0.1
    bias = jax.random.normal(ks[6], (4 * CO,)) * 0.1
    res = jax.random.normal(ks[7], (B, H // 2, W // 2, 4 * CO))
    rk1 = jax.random.normal(ks[8], (4 * C1, 4 * CO)) * 0.1
    rk2 = jax.random.normal(ks[9], (4 * C2, 4 * CO)) * 0.1
    rb = jax.random.normal(ks[10], (4 * CO,)) * 0.1

    p1, p2 = s2d.space_to_depth(x1), s2d.space_to_depth(x2)
    pk1 = s2d.pack_conv3x3_kernel(w1)
    pk2 = s2d.pack_conv3x3_kernel(w2)

    def both(**kw):
        outs = []
        for struct in (False, True):
            outs.append(affine_silu_conv3x3(
                interpret=True, packed_struct=struct, **kw))
        return outs

    for pipe in (False, True):
        # single operand, no extras
        dense, struct = both(
            x=p1, a=a[:, :4 * C1], b=b[:, :4 * C1], w=pk1, bias=bias,
            pipelined=pipe, tile_h=8)
        np.testing.assert_allclose(np.asarray(struct), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5)
        # 2-operand + stats + residual + proj
        dense, struct = both(
            x=(p1, p2), a=(a[:, :4 * C1], a[:, 4 * C1:]),
            b=(b[:, :4 * C1], b[:, 4 * C1:]), w=(pk1, pk2), bias=bias,
            residual=res, emit_stats=True, proj_kernel=(rk1, rk2),
            proj_bias=rb, pipelined=pipe, tile_h=8)
        for g, d in zip(struct, dense):
            np.testing.assert_allclose(np.asarray(g), np.asarray(d),
                                       rtol=2e-5, atol=2e-5)


def test_fused_resnet_vjp_packed_struct_grads():
    """The struct-tap training backward (fused_resnet._struct_wgrad: 4
    MXU dots + L^T scatter instead of XLA's dense 9-tap conv-grad of the
    4x-padded packed kernel) produces the SAME gradients as
    differentiating the pure-XLA reference on the packed path — for
    every input (x, a, b, W-unpacked, bias, residual), with and without
    the ride-along stats cotangents."""
    from ml_mdm_tpu.ops.fused_resnet import (
        affine_silu_conv3x3_vjp, reference_affine_silu_conv3x3,
    )

    ks = jax.random.split(jax.random.PRNGKey(7), 10)
    B, H, W, C, CO = 2, 12, 10, 3, 5
    x = jax.random.normal(ks[0], (B, H, W, C)) * 0.5
    w = jax.random.normal(ks[1], (3, 3, C, CO)) * 0.2
    a = jax.random.normal(ks[2], (B, 4 * C)) * 0.2 + 1.0
    b = jax.random.normal(ks[3], (B, 4 * C)) * 0.1
    bias = jax.random.normal(ks[4], (4 * CO,)) * 0.1
    res = jax.random.normal(ks[5], (B, H // 2, W // 2, 4 * CO))
    cy = jax.random.normal(ks[6], (B, H // 2, W // 2, 4 * CO))
    c1 = jax.random.normal(ks[7], (B, 4 * CO))
    c2 = jax.random.normal(ks[8], (B, 4 * CO))

    def loss_struct(x, a, b, w, bias, res):
        y, s1, s2 = affine_silu_conv3x3_vjp(
            s2d.space_to_depth(x), a, b, s2d.pack_conv3x3_kernel(w),
            bias, res, True, True, True, True,
        )
        return (jnp.sum(y * cy) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2))

    def loss_ref(x, a, b, w, bias, res):
        y = reference_affine_silu_conv3x3(
            s2d.space_to_depth(x), a, b, s2d.pack_conv3x3_kernel(w),
            bias, res,
        )
        s1 = jnp.sum(y.astype(jnp.float32), axis=(1, 2))
        s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2))
        return (jnp.sum(y * cy) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2))

    args = (x, a, b, w, bias, res)
    g_struct = jax.grad(loss_struct, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for name, gs, gr in zip(("x", "a", "b", "w", "bias", "res"),
                            g_struct, g_ref):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=5e-4, atol=5e-4,
            err_msg=f"struct-tap vjp grad mismatch: {name}",
        )


def _nested_shell_pair(outer_channels, inner_pack, outer_pack, side):
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.nested_unet import NestedUNet, NestedUNetConfig
    from ml_mdm_tpu.models.unet import UNetConfig

    inner = dict(
        resolution_channels=[16, 32],
        num_resnets_per_resolution=[1, 1],
        attention_levels=[1],
        num_attention_layers=[0, 1],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        skip_mid_blocks=False,
        skip_cond_emb=False,
        nesting=True,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    outer = dict(
        resolution_channels=outer_channels,
        num_resnets_per_resolution=[2, 2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0, 0],
        conditioning_feature_dim=16,
        num_lm_head_layers=0,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=True,
        skip_inner_unet_input=False,
        skip_normalization=True,
        temporal_dim=64,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    m_plain = NestedUNet(3, 3, NestedUNetConfig(
        pack_min_side=0,
        inner_config=UNetConfig(pack_min_side=0, **inner), **outer))
    m_packed = NestedUNet(3, 3, NestedUNetConfig(
        pack_min_side=outer_pack,
        inner_config=UNetConfig(pack_min_side=inner_pack, **inner),
        **outer))

    b = 2
    xs = [
        jax.random.normal(jax.random.PRNGKey(0), (b, side, side, 3)),
        jax.random.normal(jax.random.PRNGKey(1), (b, side // 4,
                                                  side // 4, 3)),
    ]
    t = jnp.asarray([3, 7], jnp.int32)
    lm = jax.random.normal(jax.random.PRNGKey(2), (b, 4, 16))
    mask = jnp.ones((b, 4))
    params = jax.jit(m_plain.init)(
        jax.random.PRNGKey(3), xs, t, lm, mask, {}
    )["params"]
    refs = m_plain.apply({"params": params}, xs, t, lm, mask, {})
    outs = m_packed.apply({"params": params}, xs, t, lm, mask, {})
    # the packed model must actually pack its LAST stage for this test
    plan = m_packed.bind({"params": params})._pack_plan(xs[0])
    return refs, outs, plan


def test_packed_last_stage_plan_exact():
    """plan[-1] packing (the bottom stage of a nested shell, unpacked
    only around the in/out adapter section — r4) == unpacked, same
    params. Exercises the packed bottom handoff, the adapter-boundary
    depth_to_space/space_to_depth pair, and the packed skips of the
    first up block."""
    refs, outs, plan = _nested_shell_pair([8, 8, 16], 16, 16, 64)
    assert plan[-1], f"bottom stage did not pack: {plan}"
    for r, o in zip(refs, outs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_packed_64ch_stage_plan_exact(monkeypatch):
    """33-64 channel stages pack through the ML_MDM_TPU_PACK64_MIN_SIDE
    gate (r4: the structured-tap kernel made 64ch packing a win)."""
    monkeypatch.setenv("ML_MDM_TPU_PACK64_MIN_SIDE", "16")
    refs, outs, plan = _nested_shell_pair([8, 8, 48], 16, 16, 64)
    assert plan[-1], f"48ch bottom stage did not pack: {plan}"
    for r, o in zip(refs, outs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_wcache_sampling_matches_uncached(monkeypatch):
    """ML_MDM_TPU_WCACHE bundling (packed-weight transforms precomputed
    once per program via Model.build_wcache, r4) produces bit-identical
    samples vs computing the transforms inline every step."""
    from ml_mdm_tpu.diffusion import NestedDiffusion, NestedDiffusionConfig
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.nested_unet import NestedUNet, NestedUNetConfig
    from ml_mdm_tpu.models.unet import UNetConfig
    from ml_mdm_tpu.samplers import SamplerConfig

    monkeypatch.setenv("ML_MDM_TPU_FUSED", "interpret")
    inner = dict(
        resolution_channels=[16, 32],
        num_resnets_per_resolution=[1, 1],
        attention_levels=[1],
        num_attention_layers=[0, 1],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        nesting=True,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0),
    )
    outer = dict(
        resolution_channels=[8, 8, 16],
        num_resnets_per_resolution=[2, 2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0, 0],
        conditioning_feature_dim=16,
        num_lm_head_layers=0,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=True,
        skip_normalization=True,
        temporal_dim=64,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0),
    )
    module = NestedUNet(3, 3, NestedUNetConfig(
        pack_min_side=16,
        inner_config=UNetConfig(pack_min_side=16, **inner), **outer))
    pipeline = NestedDiffusion(
        module,
        NestedDiffusionConfig(
            sampler_config=SamplerConfig(num_diffusion_steps=8),
            no_use_residual=True,
        ),
    )
    params = pipeline.init_params(
        jax.random.PRNGKey(0), image_side=32, lm_dim=16, seq_len=4
    )
    lm = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    sample = {"lm_outputs": lm, "lm_mask": jnp.ones((2, 4))}

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("ML_MDM_TPU_WCACHE", flag)
        outs[flag] = np.asarray(pipeline.sample(
            params, 2, sample, 32, jax.random.PRNGKey(2),
            num_inference_steps=2, resample_steps=True, ddim_eta=0.0,
        ))
    np.testing.assert_array_equal(outs["0"], outs["1"])

    # eager chunked path builds through the self-jitted builder
    monkeypatch.setenv("ML_MDM_TPU_WCACHE", "1")
    out_c = np.asarray(pipeline.sample_chunked(
        params, 2, sample, 32, jax.random.PRNGKey(2),
        num_inference_steps=2, resample_steps=True, ddim_eta=0.0,
        chunk_steps=1,
    ))
    assert np.isfinite(out_c).all()


def test_packed_training_loss_parity_and_grad_flow(monkeypatch):
    """Training with space-to-depth packed stages == training unpacked:
    per-step losses must match bit-for-bit across several optimizer
    steps, and gradients must reach (almost) every parameter once the
    zero-init output layers warm up.

    Background: conv_out and cond_layers_*_1 are zero-initialized
    (reference zero_module parity, unet.py:321-326), so on a FRESH init
    upstream gradients are EXACTLY zero and the update frontier cascades
    one zero-init layer per step. A single-step "params changed" check
    is therefore meaningless — this runs 4 steps and checks the
    cascade completes.
    """
    from ml_mdm_tpu import trainer
    from ml_mdm_tpu.diffusion import Diffusion, DiffusionConfig
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.unet import UNet, UNetConfig
    from ml_mdm_tpu.samplers import SamplerConfig

    monkeypatch.setenv("ML_MDM_TPU_PACK64_MIN_SIDE", "16")

    def run(pack):
        cfg = dict(
            resolution_channels=[8, 16],
            num_resnets_per_resolution=[1, 1],
            attention_levels=[],
            num_attention_layers=[0, 0],
            conditioning_feature_dim=16,
            masked_cross_attention=0,
            skip_mid_blocks=True,
            resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0),
        )
        module = UNet(3, 3, UNetConfig(pack_min_side=pack, **cfg))
        pipe = Diffusion(module, DiffusionConfig(
            sampler_config=SamplerConfig(num_diffusion_steps=8)))
        params = pipe.init_params(
            jax.random.PRNGKey(0), image_side=32, lm_dim=16, seq_len=4
        )
        tcfg = trainer.TrainerConfig(
            lr=1e-3, warmup_steps=1, gradient_clip_norm=2.0
        )
        opt, _ = trainer.make_optimizer(tcfg)
        state = trainer.TrainState.create(params, opt)
        step = jax.jit(trainer.make_train_step(pipe, opt, tcfg))
        batch = {
            "images": jax.random.normal(jax.random.PRNGKey(6),
                                        (2, 32, 32, 3)),
            "lm_outputs": jax.random.normal(jax.random.PRNGKey(1),
                                            (2, 4, 16)),
            "lm_mask": jnp.ones((2, 4)),
        }
        losses = []
        s0 = state
        for i in range(4):
            state, m = step(state, batch, jax.random.PRNGKey(7 + i))
            losses.append(float(m["loss"]))
        unchanged = sum(
            np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                            jax.tree_util.tree_leaves(state.params))
        )
        n = len(jax.tree_util.tree_leaves(state.params))
        return losses, unchanged, n

    losses_packed, unchanged_p, n = run(pack=16)
    losses_plain, unchanged_u, _ = run(pack=0)
    # bit-identical loss trajectory: the packed rewrite is exact, so the
    # same init + same keys must give the same floats
    assert losses_packed == losses_plain, (losses_packed, losses_plain)
    # gradient flow: after the zero-init cascade, most leaves update
    assert unchanged_p == unchanged_u
    assert unchanged_p <= n // 4, (unchanged_p, n)


def test_packed_io_train_forward_parity():
    """packed_io=True in TRAIN mode (the r5 packed-boundary training
    loss keeps the hi-res level space-to-depth packed across the whole
    loss computation) == the plain NHWC train forward, same params."""
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.nested_unet import NestedUNet, NestedUNetConfig
    from ml_mdm_tpu.models.unet import UNetConfig

    inner = dict(
        resolution_channels=[16, 32],
        num_resnets_per_resolution=[1, 1],
        attention_levels=[1],
        num_attention_layers=[0, 1],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        nesting=True,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    outer = dict(
        resolution_channels=[8, 8, 16],
        num_resnets_per_resolution=[2, 2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0, 0],
        conditioning_feature_dim=16,
        num_lm_head_layers=0,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=True,
        skip_normalization=True,
        temporal_dim=64,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0,
                                   use_attention_ffn=False),
    )
    m = NestedUNet(3, 3, NestedUNetConfig(
        pack_min_side=16,
        inner_config=UNetConfig(pack_min_side=16, **inner), **outer))
    b, side = 2, 64
    xs = [
        jax.random.normal(jax.random.PRNGKey(0), (b, side, side, 3)),
        jax.random.normal(jax.random.PRNGKey(1),
                          (b, side // 4, side // 4, 3)),
    ]
    t = jnp.asarray([3, 7], jnp.int32)
    lm = jax.random.normal(jax.random.PRNGKey(2), (b, 4, 16))
    mask = jnp.ones((b, 4))
    params = jax.jit(m.init)(jax.random.PRNGKey(3), xs, t, lm, mask, {})[
        "params"]
    assert m.packs_input(side)
    refs = m.apply({"params": params}, xs, t, lm, mask, {}, train=True)
    xs_p = [s2d.space_to_depth(xs[0])] + xs[1:]
    outs = m.apply({"params": params}, xs_p, t, lm, mask, {},
                   train=True, packed_io=True)
    outs = [s2d.depth_to_space(outs[0])] + list(outs[1:])
    for r, o in zip(refs, outs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_packed_boundary_train_loss():
    """NestedDiffusion.get_loss with the flat packed level-0 boundary
    (train=True on a packing architecture): finite loss, gradients flow
    to every parameter family, and the loss magnitude matches the
    unpacked computation statistically (same model, same conditioning,
    different-but-iid eps draw)."""
    from ml_mdm_tpu.diffusion import NestedDiffusion, NestedDiffusionConfig
    from ml_mdm_tpu.models.layers import ResNetConfig
    from ml_mdm_tpu.models.nested_unet import NestedUNet, NestedUNetConfig
    from ml_mdm_tpu.models.unet import UNetConfig
    from ml_mdm_tpu.samplers import SamplerConfig

    inner = dict(
        resolution_channels=[16, 32],
        num_resnets_per_resolution=[1, 1],
        attention_levels=[1],
        num_attention_layers=[0, 1],
        conditioning_feature_dim=16,
        masked_cross_attention=0,
        nesting=True,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0),
    )
    outer = dict(
        resolution_channels=[8, 8, 16],
        num_resnets_per_resolution=[2, 2, 1],
        attention_levels=[],
        num_attention_layers=[0, 0, 0],
        conditioning_feature_dim=16,
        num_lm_head_layers=0,
        masked_cross_attention=0,
        skip_mid_blocks=True,
        skip_cond_emb=True,
        skip_normalization=True,
        temporal_dim=64,
        resnet_config=ResNetConfig(num_groups_norm=4, dropout=0.0),
    )

    def mk(ps):
        mod = NestedUNet(3, 3, NestedUNetConfig(
            pack_min_side=ps,
            inner_config=UNetConfig(pack_min_side=ps, **inner), **outer))
        return NestedDiffusion(mod, NestedDiffusionConfig(
            sampler_config=SamplerConfig(num_diffusion_steps=8),
            no_use_residual=True, use_double_loss=True))

    pipe_p, pipe_u = mk(16), mk(0)
    params = pipe_p.init_params(
        jax.random.PRNGKey(0), image_side=32, lm_dim=16, seq_len=4)
    lm = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3)),
        "lm_outputs": lm, "lm_mask": jnp.ones((2, 4)),
    }
    assert pipe_p._packed_io(32)

    def loss_of(pipe):
        def f(p):
            losses, *_ = pipe.get_loss(p, batch, jax.random.PRNGKey(3),
                                       train=True)
            return losses.mean()
        return f

    lp, gp = jax.value_and_grad(loss_of(pipe_p))(params)
    lu = loss_of(pipe_u)(params)
    assert np.isfinite(float(lp)) and np.isfinite(float(lu))
    # same distribution (untrained model, eps-target loss ~ O(1));
    # different iid draws, so loose band only
    assert 0.2 < float(lp) / float(lu) < 5.0, (lp, lu)
    gnorm = sum(float(jnp.sum(jnp.square(g)))
                for g in jax.tree_util.tree_leaves(gp))
    assert np.isfinite(gnorm) and gnorm > 0
