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


# ---------------------------------------------------------------------------
# Packed-qkv kernel (round 3): consumes [B, T, 3·H·C] directly, no HBM head
# transposes (ops/attention_pallas.py packed section)
# ---------------------------------------------------------------------------
from ot_vae_tpu.ops.attention_pallas import (  # noqa: E402
    fused_attention_packed,
    fused_attention_packed_available,
)


def _packed_reference(qkv, n_heads):
    """einsum reference on the packed layout (mirrors spatial_attention)."""
    b, t, width = qkv.shape
    ch = width // (3 * n_heads)
    c = n_heads * ch
    q = qkv[..., :c].reshape(b, t, n_heads, ch)
    k = qkv[..., c:2 * c].reshape(b, t, n_heads, ch)
    v = qkv[..., 2 * c:].reshape(b, t, n_heads, ch)
    logits = jnp.einsum("bthc,bshc->bhts", q, k) / np.sqrt(ch)
    w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(qkv.dtype)
    out = jnp.einsum("bhts,bshc->bthc", w, v)
    return out.reshape(b, t, n_heads * ch)


@pytest.mark.parametrize("h,ch", [(1, 16), (2, 8), (4, 16), (3, 8)])
def test_packed_forward_matches_einsum(h, ch):
    rng = np.random.default_rng(10 + h)
    b, t = 2, 32
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h * ch)), jnp.float32)
    out = fused_attention_packed(qkv, h, 1.0 / np.sqrt(ch), interpret=True)
    ref = _packed_reference(qkv, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("h,ch", [(2, 8), (4, 16)])
def test_packed_gradients_match_einsum(h, ch):
    """The packed VJP emits the full dqkv in one kernel; it must equal the
    einsum path's gradient on the SAME packed input."""
    rng = np.random.default_rng(20 + h)
    b, t = 1, 24
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h * ch)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, t, h * ch)), jnp.float32)

    def loss_fused(qkv):
        return jnp.sum(
            fused_attention_packed(qkv, h, 1.0 / np.sqrt(ch), interpret=True)
            * co)

    def loss_ref(qkv):
        return jnp.sum(_packed_reference(qkv, h) * co)

    gf = jax.grad(loss_fused)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=5e-5, rtol=1e-4)


def test_packed_matches_bhtc_kernel():
    """Both kernel layouts compute the same function."""
    rng = np.random.default_rng(30)
    b, t, h, ch = 2, 32, 2, 16
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h * ch)), jnp.float32)
    c = h * ch
    split = lambda x: x.reshape(b, t, h, ch).swapaxes(1, 2)  # noqa: E731
    q, k, v = (split(qkv[..., i * c:(i + 1) * c]) for i in range(3))
    scale = 1.0 / np.sqrt(ch)
    bhtc = fused_attention(q, k, v, scale, interpret=True)
    packed = fused_attention_packed(qkv, h, scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(packed),
        np.asarray(bhtc.swapaxes(1, 2).reshape(b, t, c)),
        atol=2e-6, rtol=1e-5)


def test_packed_bf16_inputs_finite_and_close():
    rng = np.random.default_rng(31)
    b, t, h, ch = 2, 32, 2, 16
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h * ch)), jnp.float32)
    out = fused_attention_packed(
        qkv.astype(jnp.bfloat16), h, 1.0 / np.sqrt(ch), interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _packed_reference(qkv, h)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_packed_availability_window():
    assert fused_attention_packed_available(1024, 64)
    assert fused_attention_packed_available(512, 128)
    assert not fused_attention_packed_available(4096, 64)   # VMEM window
    assert not fused_attention_packed_available(256, 256)   # head dim cap
    assert not fused_attention_packed_available(1024, 12)   # lane alignment


# ---------------------------------------------------------------------------
# Fully-fused attention block (qkv proj + attention + out proj in one
# kernel) — flax integration equivalence (networks/cnn.py AttentionBlock)
# ---------------------------------------------------------------------------
from ot_vae_tpu.ops.attention_pallas import (  # noqa: E402
    fused_attention_block,
    fused_attention_block_available,
)


def _block_reference(x, w_qkv, w_out, n_heads):
    b, t, c = x.shape
    cp = w_qkv.shape[-1] // 3
    ch = cp // n_heads
    qkv = x @ w_qkv
    q = qkv[..., :cp].reshape(b, t, n_heads, ch)
    k = qkv[..., cp:2 * cp].reshape(b, t, n_heads, ch)
    v = qkv[..., 2 * cp:].reshape(b, t, n_heads, ch)
    w = jax.nn.softmax(
        jnp.einsum("bthc,bshc->bhts", q, k) / np.sqrt(ch), -1)
    return jnp.einsum("bhts,bshc->bthc", w, v).reshape(b, t, cp) @ w_out


@pytest.mark.parametrize("h,ch", [(1, 16), (2, 8)])
def test_block_kernel_forward_and_grads(h, ch):
    rng = np.random.default_rng(40 + h)
    b, t, c = 2, 32, 24
    cp = h * ch
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((c, 3 * cp)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((cp, c)) * 0.1, jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    scale = 1.0 / np.sqrt(ch)

    out = fused_attention_block(x, wq, wo, h, scale, interpret=True)
    ref = _block_reference(x, wq, wo, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    lf = lambda *a: jnp.sum(  # noqa: E731
        fused_attention_block(*a, h, scale, interpret=True) * co)
    lr = lambda *a: jnp.sum(_block_reference(*a, h) * co)  # noqa: E731
    gf = jax.grad(lf, (0, 1, 2))(x, wq, wo)
    gr = jax.grad(lr, (0, 1, 2))(x, wq, wo)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-4)


def test_attention_block_module_fused_equals_unfused(monkeypatch):
    """AttentionBlock with OT_VAE_FUSED_ATTN_BLOCK=interpret (fused Pallas
    block, interpret mode) must produce the same params tree, the same
    outputs, and the same gradients as the unfused projections+einsum path."""
    from ot_vae_tpu.networks.cnn import AttentionBlock

    blk = AttentionBlock(channels=16, heads=2, normalization="groupnorm")
    rng = np.random.default_rng(50)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 16)), jnp.float32)

    monkeypatch.delenv("OT_VAE_FUSED_ATTN_BLOCK", raising=False)
    variables = blk.init(jax.random.PRNGKey(0), x)
    out_unfused = blk.apply(variables, x)

    def loss(v, x):
        return jnp.sum(blk.apply(v, x) ** 2)

    g_unfused = jax.grad(loss)(variables, x)

    monkeypatch.setenv("OT_VAE_FUSED_ATTN_BLOCK", "interpret")
    variables_fused = blk.init(jax.random.PRNGKey(0), x)
    # identical tree AND identical seeded init draws across the dispatch
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, variables_fused))
    out_fused = blk.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_unfused),
                               atol=1e-5, rtol=1e-5)
    g_fused = jax.grad(loss)(variables, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4),
        g_unfused, g_fused)


def test_attention_block_batchnorm_stats_match_across_dispatch(monkeypatch):
    """batch_stats updates (train mode) are identical across the fused
    dispatch — the norm runs OUTSIDE the kernel."""
    from ot_vae_tpu.networks.cnn import AttentionBlock

    blk = AttentionBlock(channels=16, heads=2, normalization="batchnorm")
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 16)), jnp.float32)

    monkeypatch.delenv("OT_VAE_FUSED_ATTN_BLOCK", raising=False)
    variables = blk.init(jax.random.PRNGKey(0), x)
    out_u, mut_u = blk.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    monkeypatch.setenv("OT_VAE_FUSED_ATTN_BLOCK", "interpret")
    out_f, mut_f = blk.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=1e-5, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6),
        mut_u, mut_f)


def test_attention_block_matmul_proj_equals_conv_path(monkeypatch):
    """The matmul-projection branch (round-5 layout fix: 1×1 qkv/out convs
    expressed as dot_general so the Pallas boundary is natively row-major —
    OT_VAE_ATTN_MATMUL_PROJ) produces the same param tree, outputs, grads,
    and batch_stats as the conv formulation."""
    import functools

    from ot_vae_tpu.networks import nets_utils
    from ot_vae_tpu.networks.cnn import AttentionBlock
    from ot_vae_tpu.ops import attention_pallas as ap

    blk = AttentionBlock(channels=16, heads=2, normalization="batchnorm")
    rng = np.random.default_rng(52)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 16)), jnp.float32)

    monkeypatch.delenv("OT_VAE_ATTN_MATMUL_PROJ", raising=False)
    variables = blk.init(jax.random.PRNGKey(0), x)
    out_conv, mut_conv = blk.apply(variables, x, train=True,
                                   mutable=["batch_stats"])

    def loss(v, x):
        return jnp.sum(blk.apply(v, x) ** 2)

    g_conv = jax.grad(loss)(variables, x)

    # force the branch on CPU: env flag + eligibility + interpret kernel
    monkeypatch.setenv("OT_VAE_ATTN_MATMUL_PROJ", "1")
    monkeypatch.setattr(nets_utils, "_use_fused_attention",
                        lambda *a, **k: True)
    monkeypatch.setattr(ap, "fused_attention_packed",
                        functools.partial(ap.fused_attention_packed,
                                          interpret=True))
    variables_mm = blk.init(jax.random.PRNGKey(0), x)
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, variables_mm))
    out_mm, mut_mm = blk.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_mm), np.asarray(out_conv),
                               atol=1e-5, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6),
        mut_conv, mut_mm)
    g_mm = jax.grad(loss)(variables, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4),
        g_conv, g_mm)


@pytest.mark.parametrize("b,t,h,d", [(2, 64, 4, 32), (2, 32, 2, 128),
                                     (1, 64, 8, 64), (2, 48, 2, 16)])
def test_fused_attention_bthd_matches_einsum(b, t, h, d):
    """BTHD kernel (round 5: native [B,T,H·d] layout, grid over
    (batch, head-group)) forward + custom VJP vs the einsum reference."""
    from ot_vae_tpu.ops.attention_pallas import (
        fused_attention_bthd, fused_attention_bthd_available)

    assert fused_attention_bthd_available(t, d, h)
    rng = np.random.default_rng(60 + d)
    q, k, v = (jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
               for _ in range(3))
    scale = 1.0 / np.sqrt(d)

    def ref(q, k, v):
        logits = jnp.einsum("bthd,bshd->bhts", q, k) * scale
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhts,bshd->bthd", w.astype(q.dtype), v)

    def flat(x):
        return x.reshape(b, t, h * d)

    out = fused_attention_bthd(flat(q), flat(k), flat(v), h, scale,
                               interpret=True).reshape(b, t, h, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, k, v)),
                               atol=2e-5, rtol=2e-5)

    co = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    gk = jax.grad(lambda q, k, v: jnp.sum(
        fused_attention_bthd(flat(q), flat(k), flat(v), h, scale,
                             interpret=True).reshape(b, t, h, d) * co),
        (0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(ref(q, k, v) * co),
                  (0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-4)


def test_fused_attention_bthd_eligibility():
    """Head dim must divide the 128-lane tile and H must split into whole
    head-groups; the T/d VMEM window is the BHTC one."""
    from ot_vae_tpu.ops.attention_pallas import fused_attention_bthd_available

    assert fused_attention_bthd_available(1024, 64, 8)
    assert fused_attention_bthd_available(1024, 128, 4)
    assert not fused_attention_bthd_available(2048, 64, 8)  # T window
    assert not fused_attention_bthd_available(1024, 48, 8)  # 128 % 48 != 0
    assert not fused_attention_bthd_available(1024, 32, 6)  # 6 % hg(4) != 0
