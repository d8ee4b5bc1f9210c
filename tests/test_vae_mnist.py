"""End-to-end mini-training: MNIST32 CNN VAE
(parity: /root/reference/tests/test_mnist_cnn_vae.py — PSNR floor 15 dB,
checkpoint save/load/partial-load round trip, inference-mode shape contracts).

Uses the seeded synthetic-digit fallback (no network egress for the real
MNIST download); the floor is the same 15 dB.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ot_vae_tpu.data import MNIST32
from ot_vae_tpu.metrics import PSNR, MetricCollection
from ot_vae_tpu.models import VAE
from ot_vae_tpu.networks import CNN, AutoEncoder
from ot_vae_tpu.priors import GaussianPrior
from ot_vae_tpu.trainer import PartialCheckpoint, Trainer, load_checkpoint, save_checkpoint

_PSNR_PERFORMANCE = 15
# Round-5 suite-budget re-derivation (VERDICT r4 #5, TPU v5e drives +
# CPU-suite validations 2026-08-20/21): the TRAINING floor clears at 4
# epochs (normalized test metric: TPU 15.99 dB at 240 steps; 5 → 16.36;
# 6 → 16.75), but the RAW-DATA inference check (denormalized 28×28, no
# zero-padding credit — consistently ~1.3 dB below the normalized metric)
# measured 14.61 (4 ep) and 14.89 (5 ep) on the CPU-suite trajectory, so
# BOTH original 15 dB floors hold only at the full 6 epochs — epoch
# counts stay put and the suite budget is recovered from the
# trajectory-neutral interior validation epochs instead (below;
# SUITE_r05.md).
_MAX_EPOCH = 6          # encoder/decoder fit
_MAX_EPOCH_AE = 6       # autoencoder fit

# OT_VAE_FAST_TESTS=1 turns this e2e suite into a smoke gate (reduced epochs,
# minimal floor): same code paths, ~5x faster on the single CPU core. The
# default (full) mode is the parity gate with the TPU-verified floor.
import os as _os

# the parity-gate e2e tail (SUITE_r04.md: tranche B of the full gate)
pytestmark = pytest.mark.e2e
if _os.environ.get("OT_VAE_FAST_TESTS") == "1":
    _MAX_EPOCH = max(1, _MAX_EPOCH // 4)
    _MAX_EPOCH_AE = max(1, _MAX_EPOCH_AE // 4)
    _PSNR_PERFORMANCE = 5.0



def _datamodule(batch_size=50):
    return MNIST32(
        train_batch_size=batch_size,
        val_batch_size=batch_size,
        test_batch_size=batch_size,
        predict_batch_size=batch_size,
        seed=42,
        synthetic_train=3000,
        synthetic_test=500,
    )


def _metrics():
    return MetricCollection({"psnr": PSNR()})


def test_vae_encoder_decoder_training(tmp_path):
    dm = _datamodule()
    in_ch, in_res = 1, 32
    latent_ch, latent_res = 128, 1

    encoder = CNN(in_ch, latent_ch * 2, in_res, latent_res,
                  capacity=8, down_sample=True, residual="add")
    decoder = CNN(latent_ch, in_ch, latent_res, in_res,
                  capacity=8, up_sample=True, residual="add")

    model = VAE(
        metrics=_metrics(), encoder=encoder, decoder=decoder,
        prior=GaussianPrior(loss_coeff=0.1),
    )
    assert tuple(model.latent_size) == (latent_res, latent_res, latent_ch)

    # validate only on the final epoch: interior val epochs do not touch
    # the seeded train trajectory (A/B-verified: bit-identical metrics at
    # every frequency) and cost ~25 s each on the 1-core suite host
    trainer = Trainer(max_epochs=_MAX_EPOCH, seed=42, log_every_n_steps=25,
                      check_val_every_n_epoch=_MAX_EPOCH)
    trainer.fit(model, dm)

    results = trainer.test(model, dm)
    assert results["test/metrics/psnr"] > _PSNR_PERFORMANCE, results

    ckpt = tmp_path / "vanilla_vae_encoder_decoder"
    save_checkpoint(ckpt, trainer.state, model)
    _inference_checks(ckpt, dm)


def _inference_checks(ckpt_path, dm, batch_size=50):
    """(parity: reference `inference`, tests/test_mnist_cnn_vae.py:199-251)"""
    encoder = CNN(1, 256, 32, 1, capacity=8, down_sample=True, residual="add")
    decoder = CNN(128, 1, 1, 32, capacity=8, up_sample=True, residual="add")
    vae = VAE(metrics=_metrics(), encoder=encoder, decoder=decoder,
              prior=GaussianPrior(loss_coeff=0.1))
    load_checkpoint(ckpt_path, vae)
    vae.inference = True  # wraps encode/decode/sample with data transforms

    x = np.random.default_rng(0).random((10, 28, 28, 1)).astype(np.float32)
    z = vae.encode(jnp.asarray(x))  # preprocessing (normalize+pad) implicit
    assert z.shape == (10, 1, 1, 128)

    samples = vae.sample(batch_size=5)  # postprocess implicit: back to 28×28
    assert samples.shape == (5, 28, 28, 1)

    x_hat = vae(jnp.asarray(x))
    assert x_hat.shape == (10, 28, 28, 1)

    # predict on raw data through the trainer (predict contract)
    trainer = Trainer(seed=0)
    preds = trainer.predict(vae, dm)
    assert preds[0].shape == (batch_size, 28, 28, 1)

    # raw-data PSNR against the restored model
    metric = PSNR()
    mstate = metric.init()
    for imgs, _ in dm.predict_batches():
        out = vae(jnp.asarray(imgs))
        mstate = metric.update(mstate, preds=out, target=jnp.asarray(imgs))
    assert float(metric.compute(mstate)) > _PSNR_PERFORMANCE


def test_vae_autoencoder_training_and_partial_checkpoint(tmp_path):
    """(parity: tests/test_mnist_cnn_vae.py:101-196)"""
    dm = _datamodule()
    autoencoder = AutoEncoder(
        1, 128, 32, 1, capacity=8, double_encoded_features=True,
        down_up_sample=True, residual="add",
    )
    model = VAE(metrics=_metrics(), autoencoder=autoencoder,
                prior=GaussianPrior(loss_coeff=0.1))
    trainer = Trainer(max_epochs=_MAX_EPOCH_AE, seed=42,
                      check_val_every_n_epoch=_MAX_EPOCH_AE)
    trainer.fit(model, dm)
    results = trainer.test(model, dm)
    assert results["test/metrics/psnr"] > _PSNR_PERFORMANCE, results

    ckpt = tmp_path / "vanilla_vae_autoencoder"
    save_checkpoint(ckpt, trainer.state, model)

    # checkpoint loading round trip
    vae2 = VAE(metrics=_metrics(),
               autoencoder=AutoEncoder(1, 128, 32, 1, capacity=8,
                                       double_encoded_features=True,
                                       down_up_sample=True, residual="add"),
               prior=GaussianPrior(loss_coeff=0.1))
    load_checkpoint(ckpt, vae2)
    t2 = Trainer(seed=42)
    results = t2.test(vae2, dm)
    assert results["test/metrics/psnr"] > _PSNR_PERFORMANCE, results

    # partial checkpoint: graft the AE's encoder/decoder into a split VAE
    # (reference: tests/test_mnist_cnn_vae.py:158-196)
    encoder = CNN(1, 256, 32, 1, capacity=8, down_sample=True, residual="add")
    decoder = CNN(128, 1, 1, 32, capacity=8, up_sample=True, residual="add")
    vae3 = VAE(
        metrics=_metrics(), encoder=encoder, decoder=decoder,
        prior=GaussianPrior(loss_coeff=0.1),
        checkpoints=dict(
            encoder=PartialCheckpoint(str(ckpt), "autoencoder/encoder"),
            decoder=PartialCheckpoint(str(ckpt), "autoencoder/decoder"),
        ),
    )
    first = next(iter(dm.train_batches()))
    vae3.variables = vae3.init_variables(jax.random.PRNGKey(0),
                                         jax.tree_util.tree_map(jnp.asarray, first))
    vae3.setup()
    t3 = Trainer(seed=42)
    results = t3.test(vae3, dm)
    assert results["test/metrics/psnr"] > _PSNR_PERFORMANCE, results
