"""DAD: discrete auto-diffusion with a gumbel-softmax SGD codebook and an
autoregressive ViT token decoder
(parity: /root/reference/tests/test_dad.py — PSNR > 13 after 2 epochs on
MNIST; synthetic-digit fallback here).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.data import MNIST
from ot_vae_tpu.metrics import PSNR, MetricCollection
from ot_vae_tpu.models import DAD
from ot_vae_tpu.networks import AutoRegressive, ViT
from ot_vae_tpu.priors import CodebookPrior
from ot_vae_tpu.trainer import Trainer

_PSNR_PERFORMANCE = 13
_MAX_EPOCH = 8  # 13.8 dB at 8 epochs on the synthetic digits (TPU-verified)

# OT_VAE_FAST_TESTS=1 turns this e2e suite into a smoke gate (reduced epochs,
# minimal floor): same code paths, ~5x faster on the single CPU core. The
# default (full) mode is the parity gate with the TPU-verified floor.
import os as _os
import pytest

# the parity-gate e2e tail (SUITE_r04.md: tranche B of the full gate)
pytestmark = pytest.mark.e2e
if _os.environ.get("OT_VAE_FAST_TESTS") == "1":
    _MAX_EPOCH = max(1, _MAX_EPOCH // 4)
    _PSNR_PERFORMANCE = 5.0

_DIM = 64


def _tiny_dad(patch_size=7, dim=32, vocab_size=32):
    """Untrained tiny DAD for sampler tests; n_tokens = (28/patch_size)²."""
    cfg = dict(image_size=28, patch_size=patch_size, dim=dim, depth=2,
               heads=4, mlp_dim=dim * 2, channels=1, dropout=0.0,
               emb_dropout=0.0)
    encoder = ViT(n_embed_tokens=0, output_tokens="input",
                  patch_to_embed=True, embed_to_patch=False, **cfg)
    n_tokens = encoder.total_num_tokens
    decoder = ViT(n_embed_tokens=None, n_input_tokens=n_tokens,
                  output_tokens="input", patch_to_embed=False,
                  embed_to_patch=True, **cfg)
    prior = CodebookPrior(
        latent_size=encoder.out_size, embed_dims=(2,), loss=None,
        temperature_annealing=2000, n_components=vocab_size,
        temperature=1e-5, training_mode="gumbel-softmax",
        inference_mode="sample", update_with_autograd=True,
    )
    ar = AutoRegressive(
        vocab_size=prior.num_embeddings, n_embed_tokens=0,
        n_input_tokens=n_tokens, output_tokens="input",
        patch_to_embed=False, causal_mask=True, **cfg,
    )
    model = DAD(metrics=None, encoder=encoder, decoder=decoder,
                autoregressive_decoder=ar, prior=prior)
    batch = (jnp.zeros((2, 28, 28, 1), jnp.float32),
             jnp.zeros((2,), jnp.int32))
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    return model, variables


def test_kv_cached_sampling_matches_unrolled_oracle():
    """The KV-cached lax.scan sampler must produce IDENTICAL samples to the
    unrolled one-full-forward-per-token oracle for identical keys (round-2
    review item #5; SURVEY §7 'AR sampling as lax.scan with KV reuse')."""
    from ot_vae_tpu.models.dad import DADNet

    model, variables = _tiny_dad()
    key = jax.random.PRNGKey(7)
    fast = model._ancestral_sample_scan(variables, key, 4)
    slow = model.net.apply(variables, key, 4, method=DADNet.ancestral_sample)
    assert fast.shape == slow.shape == (4, 28, 28, 1)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=1e-5, rtol=1e-5)
    # sample_fn default routes through the cached path
    via_sample_fn = model.sample_fn(variables, key, 4, {})
    np.testing.assert_array_equal(np.asarray(via_sample_fn), np.asarray(fast))


def _count_eqns(jaxpr) -> int:
    n = len(jaxpr.eqns)
    for eqn in jaxpr.eqns:
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # closed sub-jaxprs (scan/cond/jit)
                n += _count_eqns(v.jaxpr)
    return n


def test_kv_cached_sampling_trace_flat_in_tokens():
    """Trace/compile size must be ~constant in n_tokens for the cached path
    (the unrolled oracle's jaxpr grows linearly: T-1 duplicated forwards)."""
    m16, v16 = _tiny_dad(patch_size=7)    # 16 tokens
    m49, v49 = _tiny_dad(patch_size=4)    # 49 tokens
    key = jax.random.PRNGKey(0)
    e16 = _count_eqns(jax.make_jaxpr(
        lambda v, k: m16._ancestral_sample_scan(v, k, 2))(v16, key).jaxpr)
    e49 = _count_eqns(jax.make_jaxpr(
        lambda v, k: m49._ancestral_sample_scan(v, k, 2))(v49, key).jaxpr)
    assert e49 <= 1.2 * e16, (e16, e49)


def test_dad():
    dm = MNIST(train_batch_size=50, val_batch_size=50, test_batch_size=50,
               seed=42, synthetic_train=2500, synthetic_test=600)

    vit_tiny_cfg = dict(
        image_size=28, patch_size=7, dim=_DIM, depth=2, heads=4,
        mlp_dim=_DIM * 4, channels=1, dropout=0.1, emb_dropout=0.0,
    )
    encoder = ViT(n_embed_tokens=0, output_tokens="input",
                  patch_to_embed=True, embed_to_patch=False, **vit_tiny_cfg)
    n_tokens = encoder.total_num_tokens
    assert n_tokens == 16
    assert tuple(encoder.out_size) == (16, _DIM)

    decoder = ViT(n_embed_tokens=None, n_input_tokens=n_tokens,
                  output_tokens="input", patch_to_embed=False,
                  embed_to_patch=True, **vit_tiny_cfg)

    vocab = CodebookPrior(
        latent_size=encoder.out_size,
        embed_dims=(2,),
        loss=None,
        temperature_annealing=2000,
        n_components=128,
        temperature=1e-5,
        training_mode="gumbel-softmax",
        inference_mode="sample",
        update_with_autograd=True,
    )

    autoregressive = AutoRegressive(
        vocab_size=vocab.num_embeddings,
        n_embed_tokens=0, n_input_tokens=n_tokens, output_tokens="input",
        patch_to_embed=False, causal_mask=True, **vit_tiny_cfg,
    )

    model = DAD(
        metrics=MetricCollection({"psnr": PSNR()}),
        encoder=encoder, decoder=decoder,
        autoregressive_decoder=autoregressive, prior=vocab,
    )
    assert tuple(model.latent_size) == (16, _DIM)

    # final-epoch-only validation (trajectory-neutral; suite budget)
    trainer = Trainer(max_epochs=_MAX_EPOCH, seed=42, log_every_n_steps=50,
                      check_val_every_n_epoch=_MAX_EPOCH)
    trainer.fit(model, dm)

    results = trainer.test(model, dm)
    assert results["test/metrics/psnr"] > _PSNR_PERFORMANCE, results

    # ancestral sampling produces images
    model.inference = True
    samples = model.sample(4, key=jax.random.PRNGKey(0))
    assert samples.shape == (4, 28, 28, 1)
