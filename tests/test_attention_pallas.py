"""Fused VMEM-resident attention kernel (ops/attention_pallas.py):
forward and custom-VJP backward vs the einsum reference, interpret mode
(tests run on CPU; the compiled path is exercised by the TPU drives and
the big-model bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ot_vae_tpu.ops.attention_pallas import (
    fused_attention,
    fused_attention_available,
)


def _reference(q, k, v, scale):
    logits = jnp.einsum("bhtc,bhsc->bhts", q, k) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhts,bhsc->bhtc", w, v)


def _rand_qkv(rng, b=2, h=3, t=64, d=16):
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((b, h, t, d)), jnp.float32)
    return mk(), mk(), mk()


def test_forward_matches_einsum():
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = fused_attention(q, k, v, scale, interpret=True)
    ref = _reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_gradients_match_einsum():
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, b=1, h=2, t=32, d=8)
    scale = 1.0 / np.sqrt(q.shape[-1])
    co = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, interpret=True) * co)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, scale) * co)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-4)


def test_bf16_inputs_finite_and_close():
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, t=32, d=16)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = fused_attention(qb, kb, vb, scale, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_availability_window():
    assert fused_attention_available(256, 64)
    assert fused_attention_available(1024, 128)
    assert not fused_attention_available(4096, 64)
    assert not fused_attention_available(256, 256)


def test_fused_dispatch_policy():
    """Fused kernel: TPU-only, default for T >= 512 within the VMEM window;
    OT_VAE_FUSED_ATTN=1 forces eligible shapes, =0 disables (round-3 policy
    from the measured crossover: 1.76x win at T=1024, 0.72x at T=256)."""
    from ot_vae_tpu.networks.nets_utils import _use_fused_attention

    assert _use_fused_attention(1024, 64, "tpu", None)       # long T: default on
    assert not _use_fused_attention(256, 64, "tpu", None)    # short T: einsum
    assert _use_fused_attention(256, 64, "tpu", "1")         # forced on
    assert not _use_fused_attention(1024, 64, "tpu", "0")    # forced off
    assert not _use_fused_attention(1024, 64, "cpu", None)   # TPU only
    assert not _use_fused_attention(1024, 64, "cpu", "1")
    assert not _use_fused_attention(4096, 64, "tpu", "1")    # VMEM window
    assert not _use_fused_attention(1024, 256, "tpu", None)


def test_spatial_attention_dispatch_unchanged_on_cpu():
    """On CPU the dispatch keeps the einsum path — same values as before."""
    from ot_vae_tpu.networks.nets_utils import spatial_attention

    rng = np.random.default_rng(3)
    b, t, h, c = 2, 16, 2, 8
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h * c)), jnp.float32)
    out = spatial_attention(qkv, h)
    assert out.shape == (b, t, h * c)
    assert np.all(np.isfinite(np.asarray(out)))
