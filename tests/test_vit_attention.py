"""ViT fused-attention routing (VERDICT r3 Weak #2 / Next #1): the ViT
family reaches the packed-qkv Pallas kernel through flax MHA's
``attention_fn`` hook (nets_utils.mha_attention_fn) with the CNN path's
dispatch policy — mask-free self-attention on TPU at T ≥ 512; masked /
cross / decode / dropout-active calls take the stock flax path. Params and
module tree are IDENTICAL either way (the hook is not a submodule), so
checkpoints are portable across backends and the routing is testable on CPU
by forcing the dispatch + interpret-mode kernel."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ot_vae_tpu.networks.nets_utils as nets_utils
import ot_vae_tpu.ops.attention_pallas as ap
from ot_vae_tpu.networks import ViT
from ot_vae_tpu.networks.nets_utils import mha_attention_fn


def _force_kernel(monkeypatch):
    """Route mha_attention_fn to the interpret-mode kernels on CPU."""
    monkeypatch.setattr(nets_utils, "_use_fused_attention",
                        lambda t, ch, backend, flag: flag != "0")
    monkeypatch.setattr(
        ap, "fused_attention_bthd",
        functools.partial(ap.fused_attention_bthd, interpret=True))
    monkeypatch.setattr(
        ap, "fused_attention_bthd_dropout",
        functools.partial(ap.fused_attention_bthd_dropout, interpret=True))
    monkeypatch.setattr(
        ap, "fused_attention_packed",
        functools.partial(ap.fused_attention_packed, interpret=True))


def test_mha_attention_fn_matches_flax(monkeypatch):
    from flax.linen.attention import dot_product_attention

    _force_kernel(monkeypatch)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 64, 4, 16)), jnp.float32)
               for _ in range(3))
    ours = mha_attention_fn(q, k, v, deterministic=True)
    flaxs = dot_product_attention(q, k, v, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flaxs),
                               rtol=2e-5, atol=2e-5)


def test_mha_attention_fn_falls_back_when_ineligible(monkeypatch):
    """Calls the kernels cannot express must NOT hit them: an arbitrary
    mask WITHOUT the layer's causal_hint, per-element (non-broadcast)
    dropout, a dropout call with no rng, and decode-style 1-token queries
    against a longer causal-hinted cache."""
    monkeypatch.setattr(nets_utils, "_use_fused_attention",
                        lambda t, ch, backend, flag: True)

    def boom(*a, **k):
        raise AssertionError("kernel must not be called")

    monkeypatch.setattr(ap, "fused_attention_packed", boom)
    monkeypatch.setattr(ap, "fused_attention_bthd", boom)
    monkeypatch.setattr(ap, "fused_attention_bthd_dropout", boom)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 8, 2, 8)), jnp.float32)
    q1 = jnp.asarray(rng.standard_normal((2, 1, 2, 8)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((2, 16, 2, 8)), jnp.float32)
    mask = jnp.tril(jnp.ones((8, 8), bool))[None, None]

    mha_attention_fn(q, q, q, mask=mask, deterministic=True)  # no hint
    mha_attention_fn(q, q, q, deterministic=False, dropout_rate=0.1,
                     dropout_rng=jax.random.PRNGKey(0),
                     broadcast_dropout=False)  # per-element dropout
    mha_attention_fn(q1, kv, kv, causal_hint=True, deterministic=True,
                     mask=jnp.ones((1, 1, 1, 16), bool))  # decode step


def test_mha_attention_fn_dropout_matches_flax(monkeypatch):
    """VERDICT r4 #4: train-mode attention-weight dropout keeps the kernel.
    The [T,T] multiplier is drawn with the SAME rng/shape semantics as
    flax's broadcast dropout, so outputs match the stock path bitwise in
    mask pattern (allclose in value), and grads flow."""
    from flax.linen.attention import dot_product_attention

    _force_kernel(monkeypatch)
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 64, 4, 16)), jnp.float32)
               for _ in range(3))
    drng = jax.random.PRNGKey(9)

    ours = mha_attention_fn(q, k, v, deterministic=False, dropout_rate=0.3,
                            dropout_rng=drng)
    flaxs = dot_product_attention(q, k, v, deterministic=False,
                                  dropout_rate=0.3, dropout_rng=drng)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flaxs),
                               rtol=2e-4, atol=2e-4)

    def loss(fn, q):
        return jnp.sum(fn(q, k, v, deterministic=False, dropout_rate=0.3,
                          dropout_rng=drng) ** 2)

    g_ours = jax.grad(lambda q: loss(mha_attention_fn, q))(q)
    g_flax = jax.grad(lambda q: loss(dot_product_attention, q))(q)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_flax),
                               rtol=5e-4, atol=5e-4)


def test_mha_attention_fn_causal_hint_matches_masked_stock(monkeypatch):
    """A causal_hint call drops the [T,T] mask operand and applies the
    tril in VMEM — outputs/grads match the stock masked path."""
    from flax.linen.attention import dot_product_attention

    _force_kernel(monkeypatch)
    rng = np.random.default_rng(4)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 64, 2, 32)), jnp.float32)
               for _ in range(3))
    mask = jnp.tril(jnp.ones((64, 64), bool))[None, None]

    ours = mha_attention_fn(q, k, v, mask=mask, causal_hint=True,
                            deterministic=True)
    flaxs = dot_product_attention(q, k, v, mask=mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flaxs),
                               rtol=2e-4, atol=2e-4)
    g_ours = jax.grad(lambda v: jnp.sum(mha_attention_fn(
        q, k, v, mask=mask, causal_hint=True, deterministic=True) ** 2))(v)
    g_flax = jax.grad(lambda v: jnp.sum(dot_product_attention(
        q, k, v, mask=mask, deterministic=True) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_flax),
                               rtol=5e-4, atol=5e-4)


def test_mha_attention_fn_cross_lengths_route_and_match(monkeypatch):
    """Cross-attention (Tq != Tk) routes through the BTHD kernel
    (VERDICT r4 #4: the decoder cross path was stock-only) and matches."""
    from flax.linen.attention import dot_product_attention

    _force_kernel(monkeypatch)
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((2, 64, 4, 16)), jnp.float32)
    k, v = (jnp.asarray(rng.standard_normal((2, 32, 4, 16)), jnp.float32)
            for _ in range(2))
    ours = mha_attention_fn(q, k, v, deterministic=True)
    flaxs = dot_product_attention(q, k, v, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flaxs),
                               rtol=2e-4, atol=2e-4)


def test_vit_forward_equivalent_with_and_without_kernel(monkeypatch):
    """Whole-ViT oracle: same params, kernel-routed forward == stock flax
    forward (reduction-reorder tolerance)."""
    vit = ViT(image_size=32, patch_size=4, dim=32, depth=2, heads=2,
              mlp_dim=64, channels=3, dropout=0.0, n_embed_tokens=0,
              output_tokens="input", patch_to_embed=True)
    assert vit.total_num_tokens == 64  # mask-free self-attention, T=64
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = vit.init(jax.random.PRNGKey(0), x)

    stock = vit.apply(variables, x)
    _force_kernel(monkeypatch)
    routed = vit.apply(variables, x)
    np.testing.assert_allclose(np.asarray(routed), np.asarray(stock),
                               rtol=2e-4, atol=2e-4)
    assert np.abs(np.asarray(routed)).max() > 0


def test_vit_head_dim_knob():
    """`head_dim` derives the head count (CNN attn_head_dim lesson exposed
    on the ViT family); `heads` is ignored when head_dim is set."""
    vit = ViT(image_size=16, patch_size=4, dim=64, heads=16, head_dim=32,
              depth=1, channels=1, dropout=0.0)
    assert vit.n_heads == 2
    x = jnp.zeros((2, 16, 16, 1), jnp.float32)
    variables = vit.init(jax.random.PRNGKey(0), x)
    q_kernel = variables["params"]["TransformerLayer_0"][
        "MultiHeadDotProductAttention_0"]["query"]["kernel"]
    assert q_kernel.shape == (64, 2, 32)  # [dim, heads, head_dim]
    out = vit.apply(variables, x)
    assert out.shape == (2, 1, 64)

    with pytest.raises(ValueError, match="head_dim"):
        ViT(image_size=16, patch_size=4, dim=64, head_dim=48,
            depth=1, channels=1).n_heads
