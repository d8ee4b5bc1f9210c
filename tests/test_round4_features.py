"""Round-4 feature guards: bench production builders' shape contracts and
the packed-kernel VMEM width envelope (calibrated on two real Mosaic
scoped-vmem rejections — see ops/attention_pallas.py docstrings)."""
import sys

import pytest

sys.path.insert(0, "/root/repo")


def test_bench_builders_shape_contracts():
    import bench

    vit = bench._build_vit_big_model()
    assert vit.net.encoder.total_num_tokens == 1024
    assert tuple(vit.latent_size) == (1024, 256)
    assert vit.net.encoder.n_heads == 8 and vit.net.decoder.n_heads == 4
    assert tuple(vit.net.decoder.out_size) == (128, 128, 3)

    cond = bench._build_vit_cond_model()
    assert tuple(cond.latent_size) == (1, 512)
    assert cond.conditional

    dad = bench._build_dad_model()
    assert dad.n_tokens == 256 and dad.num_embeddings == 512


def test_packed_kernel_width_envelope():
    from ot_vae_tpu.ops.attention_pallas import (
        fused_attention_packed_available as avail,
    )

    # base window unchanged when heads/itemsize unknown
    assert avail(1024, 64)
    assert not avail(4096, 64) and not avail(256, 256) and not avail(1024, 12)

    # measured-good anchor: CNN production shape h2·d64 @ T=1024 f32
    assert avail(1024, 64, 2, 4)
    # measured-bad anchors (Mosaic scoped-vmem rejections, round 4):
    assert not avail(1024, 64, 8, 2)   # ViT encoder h8·d64 bf16 (25.8 MB)
    assert not avail(1024, 32, 8, 2)   # narrow heads pad to lane tiles (16.9 MB)
    # headroom at shorter T
    assert avail(512, 64, 8, 2)


def test_dispatch_passes_width_envelope():
    from ot_vae_tpu.networks.nets_utils import _use_fused_attention

    # policy alone admits the ViT shape; the envelope must veto the packed
    # variant (mha_attention_fn then takes the BHTC kernel)
    assert _use_fused_attention(1024, 64, "tpu", None)
    assert not _use_fused_attention(1024, 64, "tpu", None, 8, 2)
    assert _use_fused_attention(1024, 64, "tpu", None, 2, 4)


def test_mha_attention_fn_wide_heads_use_bhtc(monkeypatch):
    """Routing ladder after round 5: wide-head self-attention prefers the
    BTHD kernel (native layout, no packed-width envelope); head dims that
    do NOT divide the 128-lane tile fall to the per-(batch*head) BHTC
    kernel; the packed kernel is never chosen over BTHD here."""
    import functools

    import jax.numpy as jnp
    import numpy as np

    import ot_vae_tpu.networks.nets_utils as nets_utils
    import ot_vae_tpu.ops.attention_pallas as ap
    from flax.linen.attention import dot_product_attention

    monkeypatch.setattr(
        nets_utils, "_use_fused_attention",
        lambda t, ch, backend, flag, *a: True)
    called = {}

    real_bhtc = ap.fused_attention
    real_bthd = ap.fused_attention_bthd

    def spy_bhtc(*a, **k):
        called["bhtc"] = True
        return real_bhtc(*a, interpret=True)

    def spy_bthd(*a, **k):
        called["bthd"] = True
        k["interpret"] = True
        return real_bthd(*a, **k)

    def no_packed(*a, **k):
        raise AssertionError("packed kernel must not be used at this width")

    monkeypatch.setattr(ap, "fused_attention", spy_bhtc)
    monkeypatch.setattr(ap, "fused_attention_bthd", spy_bthd)
    monkeypatch.setattr(ap, "fused_attention_packed", no_packed)

    rng = np.random.default_rng(0)
    # t128*h32*d64 f32: 1 MB per packed tensor (over the packed envelope);
    # 128 % 64 == 0 so the BTHD kernel takes it in its native layout
    q = jnp.asarray(rng.standard_normal((1, 128, 32, 64)), jnp.float32)
    assert not ap.fused_attention_packed_available(128, 64, 32, 4)

    out = nets_utils.mha_attention_fn(q, q, q, deterministic=True)
    assert called.get("bthd") and not called.get("bhtc")
    ref = dot_product_attention(q, q, q, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # d=20, h=7: H*d > 128 with 128 % 20 != 0 (no BTHD) and d % 8 != 0
    # (no packed) -> BHTC fallback
    called.clear()
    q2 = jnp.asarray(rng.standard_normal((1, 64, 7, 20)), jnp.float32)
    assert not ap.fused_attention_bthd_available(64, 20, 7)
    assert not ap.fused_attention_packed_available(64, 20, 7, 4)
    out2 = nets_utils.mha_attention_fn(q2, q2, q2, deterministic=True)
    assert called.get("bhtc") and not called.get("bthd")
    ref2 = dot_product_attention(q2, q2, q2, deterministic=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-5, atol=2e-5)
