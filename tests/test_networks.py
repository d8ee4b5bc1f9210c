"""Network shape/capability tests
(parity: reference constructor configs in tests/test_mnist_cnn_vae.py:52-72,
tests/test_conditional_vit_vae.py; NHWC layout, out_size=(H, W, C))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ot_vae_tpu.networks import (
    CNN,
    AutoEncoder,
    AutoRegressive,
    ViT,
    div_sqrt,
    get_block_scaling,
    get_channel_list,
)

F32 = jnp.float32


def _init_apply(module, *args, train=False, **kwargs):
    key = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": key, "dropout": key}, *args, train=train, **kwargs
    )
    out = module.apply(
        variables, *args, train=train, **kwargs,
        rngs={"dropout": key},
        mutable=["batch_stats"] if "batch_stats" in variables else False,
    )
    if isinstance(out, tuple):
        out = out[0]
    return out, variables


def test_channel_schedule():
    assert get_block_scaling(64, 2, 4) == [4, 4, 2]
    feats, res = get_channel_list(3, 256, 128, 4, 2, 16)
    assert feats == [3, 16, 32, 64, 128, 256]
    assert res == [128, 64, 32, 16, 8, 4]
    assert div_sqrt(64) == 8
    assert div_sqrt(12) == 4


def test_cnn_encoder_decoder_shapes(rng):
    """The MNIST32 CI config: 32×32×1 → 1×1×256 → decode back
    (reference: tests/test_mnist_cnn_vae.py:52-72)."""
    enc = CNN(1, 256, 32, 1, capacity=8, down_sample=True, residual="add")
    dec = CNN(128, 1, 1, 32, capacity=8, up_sample=True, residual="add")
    assert enc.out_size == (1, 1, 256)
    assert dec.out_size == (32, 32, 1)

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)), F32)
    z, _ = _init_apply(enc, x)
    assert z.shape == (2, 1, 1, 256)
    y, _ = _init_apply(dec, jnp.asarray(rng.standard_normal((2, 1, 1, 128)), F32))
    assert y.shape == (2, 32, 32, 1)


def test_cnn_residual_cat_and_groupnorm(rng):
    enc = CNN(3, 64, 16, 4, capacity=8, down_sample=True, residual="cat",
              normalization="groupnorm", activation="silu")
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), F32)
    z, _ = _init_apply(enc, x)
    assert z.shape == (2, 4, 4, 64)


def test_cnn_attention_at_low_res(rng):
    enc = CNN(1, 32, 16, 4, capacity=4, down_sample=True, max_attn_res=8)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), F32)
    z, variables = _init_apply(enc, x)
    assert z.shape == (2, 4, 4, 32)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("AttentionBlock" in jax.tree_util.keystr(p) for p, _ in flat)


def test_cnn_equalized_lr(rng):
    enc = CNN(1, 16, 8, 4, capacity=4, down_sample=True, equalized_lr=1.0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 1)), F32)
    z, _ = _init_apply(enc, x)
    assert z.shape == (2, 4, 4, 16)


def test_autoencoder_conditional(rng):
    """Class+time-conditioned AE (FiLM), double features for reparam."""
    ae = AutoEncoder(
        1, 16, 16, 2, capacity=4, num_classes=10, time_embed_dim=8,
        double_encoded_features=True, down_up_sample=True, residual="add",
    )
    assert ae.latent_size == (2, 2, 32)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 1)), F32)
    labels = jnp.asarray([0, 1, 2, 3])
    time = jnp.asarray(np.linspace(0, 1, 4), F32)
    key = jax.random.PRNGKey(0)
    variables = ae.init({"params": key, "dropout": key}, x, labels, time)
    z = ae.apply(variables, x, labels, time,
                 method=lambda m, *a: m.encode(*a))
    assert z.shape == (4, 2, 2, 32)
    y = ae.apply(variables, z[..., :16], labels, time,
                 method=lambda m, *a: m.decode(*a))
    assert y.shape == (4, 16, 16, 1)


def test_vit_encoder(rng):
    vit = ViT(image_size=32, dim=64, patch_size=8, depth=2, heads=4,
              channels=3, n_embed_tokens=4, output_tokens="embed")
    assert vit.out_size == (4, 64)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), F32)
    out, _ = _init_apply(vit, x)
    assert out.shape == (2, 4, 64)


def test_vit_decoder_to_image(rng):
    vit = ViT(image_size=32, dim=64, patch_size=8, depth=2, heads=4, channels=3,
              n_embed_tokens=None, n_input_tokens=4, output_tokens="embed",
              patch_to_embed=False, embed_to_patch=True)
    assert vit.out_size == (32, 32, 3)
    tokens = jnp.asarray(rng.standard_normal((2, 4, 64)), F32)
    out, _ = _init_apply(vit, tokens)
    assert out.shape == (2, 32, 32, 3)


def test_vit_conditional_and_cross(rng):
    vit = ViT(image_size=16, dim=32, patch_size=8, depth=2, preprocess_depth=1,
              heads=4, channels=1, n_embed_tokens=2, output_tokens="embed",
              num_classes=10, time_dependant=True)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), F32)
    labels = jnp.asarray([1, 2])
    time = jnp.asarray([0.1, 0.9], F32)
    out, _ = _init_apply(vit, x, labels=labels, time=time)
    assert out.shape == (2, 2, 32)


def test_autoregressive_causality(rng):
    """Causal mask: logits at position i must not depend on tokens > i."""
    ar = AutoRegressive(
        image_size=16, dim=32, patch_size=8, depth=2, heads=4, channels=1,
        n_embed_tokens=0, n_input_tokens=6, output_tokens="input",
        patch_to_embed=False, causal_mask=True, dropout=0.0, vocab_size=11,
    )
    tokens = jnp.asarray(rng.integers(0, 11, size=(2, 6)))
    key = jax.random.PRNGKey(0)
    variables = ar.init({"params": key}, tokens)
    logits = ar.apply(variables, tokens)
    assert logits.shape == (2, 6, 11)

    tampered = tokens.at[:, -1].set((tokens[:, -1] + 1) % 11)
    logits2 = ar.apply(variables, tampered)
    np.testing.assert_allclose(
        np.asarray(logits[:, :-1]), np.asarray(logits2[:, :-1]), atol=1e-10
    )
    assert not np.allclose(np.asarray(logits[:, -1]), np.asarray(logits2[:, -1]))


def test_gradients_flow(rng):
    """End-to-end grad through the AE (batchnorm mutable collection threaded)."""
    ae = AutoEncoder(1, 8, 8, 2, capacity=4, down_up_sample=True, residual="add")
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 1)), F32)
    key = jax.random.PRNGKey(0)
    variables = ae.init({"params": key, "dropout": key}, x, train=True)

    def loss_fn(params):
        out, _ = ae.apply(
            {**variables, "params": params}, x, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return jnp.mean((out - x) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms))
    assert max(norms) > 0


def test_cnn_attn_head_dim_knob(rng):
    """attn_head_dim=K uses C//K heads when divisible (TPU-efficient: head
    dims >= 64 run ~2x faster than the reference's div_sqrt schedule —
    BENCH_DETAIL.md); indivisible channels fall back to div_sqrt parity."""
    enc = CNN(1, 64, 16, 4, capacity=4, down_sample=True, max_attn_res=8,
              attn_head_dim=32)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), F32)
    z, variables = _init_apply(enc, x)
    assert z.shape == (2, 4, 4, 64)
    # qkv conv exists and output is finite — head count is internal, but a
    # wrong (non-dividing) count would assert inside spatial_attention
    assert np.all(np.isfinite(np.asarray(z)))

    # default (None) keeps reference div_sqrt behavior: same param tree
    enc_ref = CNN(1, 64, 16, 4, capacity=4, down_sample=True, max_attn_res=8)
    z2, variables2 = _init_apply(enc_ref, x)
    t1 = jax.tree_util.tree_structure(variables["params"])
    t2 = jax.tree_util.tree_structure(variables2["params"])
    assert t1 == t2  # head count does not change parameter shapes


# --- fused upsample-conv (exact phase decomposition, nets_utils.upsample_conv) ---

def _upsample_then_conv(x, w, factor, groups=1):
    """Oracle: materialized nearest upsample, then stride-1 SAME conv."""
    b, h, wd, c = x.shape
    u = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, wd, factor, c)
    ).reshape(b, h * factor, wd * factor, c)
    k = w.shape[0]
    pad = ((k - 1) // 2, k - 1 - (k - 1) // 2)
    return jax.lax.conv_general_dilated(
        u, w, (1, 1), [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


@pytest.mark.parametrize("k,factor,groups", [
    (3, 2, 1), (1, 2, 1), (3, 4, 1), (5, 2, 1), (3, 2, 2), (1, 4, 1),
])
def test_upsample_conv_matches_materialized(rng, k, factor, groups, monkeypatch):
    monkeypatch.setenv("OT_VAE_FUSED_UPCONV", "1")  # CPU defaults materialized
    from ot_vae_tpu.networks.nets_utils import upsample_conv

    b, h, cin, cout = 2, 6, 8, 12
    x = jnp.asarray(rng.standard_normal((b, h, h, cin)), F32)
    w = jnp.asarray(rng.standard_normal((k, k, cin // groups, cout)), F32)
    got = upsample_conv(x, w, factor, feature_group_count=groups)
    want = _upsample_then_conv(x, w, factor, groups)
    assert got.shape == want.shape == (b, h * factor, h * factor, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_upsample_conv_1x1_commute_bit_identical(rng, monkeypatch):
    """k=1 degenerates to upsample(conv1x1(x)) — bit-identical values."""
    monkeypatch.setenv("OT_VAE_FUSED_UPCONV", "1")
    from ot_vae_tpu.networks.nets_utils import upsample_conv

    x = jnp.asarray(rng.standard_normal((3, 5, 5, 16)), F32)
    w = jnp.asarray(rng.standard_normal((1, 1, 16, 4)), F32)
    got = np.asarray(upsample_conv(x, w, 2))
    want = np.asarray(_upsample_then_conv(x, w, 2))
    assert np.array_equal(got, want)


def test_upsample_conv_gradients_match(rng, monkeypatch):
    monkeypatch.setenv("OT_VAE_FUSED_UPCONV", "1")
    from ot_vae_tpu.networks.nets_utils import upsample_conv

    x = jnp.asarray(rng.standard_normal((2, 4, 4, 6)), F32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 5)), F32)
    co = jnp.asarray(rng.standard_normal((2, 8, 8, 5)), F32)
    gx_f, gw_f = jax.grad(
        lambda x, w: jnp.sum(upsample_conv(x, w, 2) * co), argnums=(0, 1))(x, w)
    gx_o, gw_o = jax.grad(
        lambda x, w: jnp.sum(_upsample_then_conv(x, w, 2) * co), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_o), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_o), atol=1e-4, rtol=1e-4)


def test_upsample_conv_env_escape_hatch(rng, monkeypatch):
    """The OT_VAE_FUSED_UPCONV knob selects fused (=1, TPU default) vs
    materialized (=0, CPU default) with the SAME params — the in-model A/B
    oracle and bench FLOPs reference."""
    from ot_vae_tpu.networks.nets_utils import upsample_conv

    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)), F32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 4)), F32)
    monkeypatch.setenv("OT_VAE_FUSED_UPCONV", "1")
    fused = upsample_conv(x, w, 2)
    monkeypatch.setenv("OT_VAE_FUSED_UPCONV", "0")
    materialized = upsample_conv(x, w, 2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(materialized),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(materialized),
                                  np.asarray(_upsample_then_conv(x, w, 2)))


@pytest.mark.parametrize("eq_lr", [None, 1.0])
def test_equalconv_fused_upsample_module(rng, eq_lr, monkeypatch):
    """EqualConv(up_sample=2) == explicit upsample -> EqualConv, same params."""
    monkeypatch.setenv("OT_VAE_FUSED_UPCONV", "1")
    from ot_vae_tpu.networks.nets_utils import EqualConv

    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)), F32)
    fused = EqualConv(10, (3, 3), padding=[(1, 1)] * 2, equalized_lr=eq_lr,
                      up_sample=2)
    plain = EqualConv(10, (3, 3), padding=[(1, 1)] * 2, equalized_lr=eq_lr)
    v = fused.init(jax.random.PRNGKey(0), x)

    b, h, wd, c = x.shape
    u = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, wd, 2, c)).reshape(b, 2 * h, 2 * wd, c)
    # the fused module's param tree AND seeded init draws must be IDENTICAL
    # to the plain (upsample -> nn.Conv) formulation: same "Conv_0" path,
    # so round-2 checkpoints load and seeded trajectories are preserved
    vp = plain.init(jax.random.PRNGKey(0), u)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(vp))
    for a, b2 in zip(jax.tree_util.tree_leaves(v),
                     jax.tree_util.tree_leaves(vp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    got = fused.apply(v, x)
    want = plain.apply(vp, u)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


# --- space-to-depth strided conv (exact phase decomposition, stem boundary) ---

def _strided_conv(x, w, s, padding):
    """Oracle: plain strided conv."""
    return jax.lax.conv_general_dilated(
        x, w, (s, s), list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k,s,pad", [
    (4, 2, (1, 2)),   # ConvLayer down_sample=2 scheme: ((k-1)//2, k//2)
    (5, 2, (2, 2)),   # odd kernel >= 2*factor
    (8, 4, (3, 4)),   # down_sample=4
    (3, 2, (1, 1)),   # kernel < 2*stride taps every phase once
    (2, 2, (0, 1)),   # minimal kernel
    (6, 3, (2, 3)),   # non-power-of-2 stride
])
def test_strided_conv_s2d_matches_strided(rng, k, s, pad):
    from ot_vae_tpu.networks.nets_utils import strided_conv_s2d

    b, h, cin, cout = 2, 18 if s == 3 else 16, 3, 10
    x = jnp.asarray(rng.standard_normal((b, h, h, cin)), F32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)), F32)
    got = strided_conv_s2d(x, w, s, [pad, pad])
    want = _strided_conv(x, w, s, [pad, pad])
    assert got.shape == want.shape == (b, h // s, h // s, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_strided_conv_s2d_gradients_match(rng):
    from ot_vae_tpu.networks.nets_utils import strided_conv_s2d

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), F32)
    w = jnp.asarray(rng.standard_normal((4, 4, 3, 6)), F32)
    co = jnp.asarray(rng.standard_normal((2, 4, 4, 6)), F32)
    pad = [(1, 2), (1, 2)]
    gx_f, gw_f = jax.grad(
        lambda x, w: jnp.sum(strided_conv_s2d(x, w, 2, pad) * co),
        argnums=(0, 1))(x, w)
    gx_o, gw_o = jax.grad(
        lambda x, w: jnp.sum(_strided_conv(x, w, 2, pad) * co),
        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_o), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_o), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("eq_lr", [None, 1.0])
def test_equalconv_s2d_stem_module(rng, eq_lr, monkeypatch):
    """EqualConv routes tiny-Cin strided convs through the s2d path with an
    UNCHANGED param tree; OT_VAE_S2D_CONV=0 gives the plain formulation with
    the same params and (up to reassociation) the same values."""
    from ot_vae_tpu.networks.nets_utils import EqualConv

    monkeypatch.setenv("OT_VAE_S2D_CONV", "1")  # CPU defaults plain
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), F32)
    conv = EqualConv(12, (4, 4), (2, 2), padding=[(1, 2)] * 2,
                     equalized_lr=eq_lr)
    v = conv.init(jax.random.PRNGKey(0), x)
    got = conv.apply(v, x)
    assert got.shape == (2, 8, 8, 12)

    monkeypatch.setenv("OT_VAE_S2D_CONV", "0")
    v_plain = conv.init(jax.random.PRNGKey(0), x)
    want = conv.apply(v_plain, x)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(v_plain))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v_plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_equalconv_s2d_not_applied_to_wide_input(rng):
    """Cin above the lane-padding-waste regime keeps the plain conv path
    (param tree must still contain the nn.Conv submodule)."""
    from ot_vae_tpu.networks.nets_utils import EqualConv

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), F32)
    conv = EqualConv(12, (4, 4), (2, 2), padding=[(1, 2)] * 2)
    v = conv.init(jax.random.PRNGKey(0), x)
    assert "Conv_0" in v["params"]
    assert conv.apply(v, x).shape == (2, 8, 8, 12)


@pytest.mark.parametrize("policy", [None, "dots", "dots_no_batch", "nothing"])
def test_cnn_remat_policy_matches_no_remat(rng, policy):
    """remat (any policy) changes memory/FLOPs, never values or gradients."""
    from ot_vae_tpu.networks import CNN

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 1)), F32)
    plain = CNN(1, 8, 8, 2, capacity=4, down_sample=True, residual="add")
    remat = CNN(1, 8, 8, 2, capacity=4, down_sample=True, residual="add",
                remat=True, remat_policy=policy)
    v = plain.init(jax.random.PRNGKey(0), x)
    y_p = plain.apply(v, x)
    y_r = remat.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r),
                               atol=1e-6, rtol=1e-6)
    g_p = jax.grad(lambda v: jnp.sum(plain.apply(v, x) ** 2))(v)
    g_r = jax.grad(lambda v: jnp.sum(remat.apply(v, x) ** 2))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
