"""End-to-end mini-training: AutoDiffusion (time-conditioned denoising VAE)
(parity: /root/reference/ot_vae_lightning/model/auto_diffusion.py:16-96 — the
reference ships NO test for this model; floor re-derived on the synthetic
digits with a TPU drive, same protocol as the other e2e suites).

Covers: U[0,1] time batches + tanh β_t loss weighting through a real fit,
the iterative ``diffusion_sample`` loop (both algorithms, reference
auto_diffusion.py:34-59), and time-conditioned reconstruction quality.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.data import MNIST32
from ot_vae_tpu.metrics import PSNR, MetricCollection
from ot_vae_tpu.models import AutoDiffusion
from ot_vae_tpu.models.auto_diffusion import AutoDiffusionNet
from ot_vae_tpu.networks import AutoEncoder
from ot_vae_tpu.priors import GaussianPrior
from ot_vae_tpu.trainer import Trainer

# TPU-derived floor: this exact configuration measured 17.3 dB test PSNR
# after 4 epochs (240 steps) on the seeded synthetic digits (TPU v5e drive,
# round 2); floor set with ~2.3 dB headroom.
_PSNR_PERFORMANCE = 15.0
_MAX_EPOCH = 4

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



def _datamodule(batch_size=50):
    return MNIST32(
        train_batch_size=batch_size, val_batch_size=batch_size,
        test_batch_size=batch_size, seed=42,
        synthetic_train=3000, synthetic_test=500,
    )


def _model(n_steps=5):
    autoencoder = AutoEncoder(
        1, 64, 32, 2, capacity=8, down_up_sample=True, residual="add",
        time_embed_dim=32, double_encoded_features=True,
    )
    return AutoDiffusion(
        metrics=MetricCollection({"psnr": PSNR()}),
        autoencoder=autoencoder,
        prior=GaussianPrior(loss_coeff=0.1),
        n_steps=n_steps,
    )


def test_auto_diffusion_training_and_sampling():
    dm = _datamodule()
    model = _model()
    assert tuple(model.latent_size) == (2, 2, 64)

    # final-epoch-only validation (trajectory-neutral; suite budget)
    trainer = Trainer(max_epochs=_MAX_EPOCH, seed=42, log_every_n_steps=25,
                      check_val_every_n_epoch=_MAX_EPOCH)
    trainer.fit(model, dm)
    results = trainer.test(model, dm)
    assert results["test/metrics/psnr"] > _PSNR_PERFORMANCE, results

    # iterative sampler: both algorithms produce finite images of the right
    # shape (reference: auto_diffusion.py:34-59)
    v = model.variables
    for improved in (False, True):
        out = model.net.apply(
            v, jax.random.PRNGKey(0), 8,
            improved_algorithm=improved,
            method=AutoDiffusionNet.diffusion_sample,
        )
        assert out.shape == (8, 32, 32, 1)
        assert bool(jnp.all(jnp.isfinite(out))), f"improved={improved}"

    # return_steps yields n_steps intermediates (collage path)
    steps = model.net.apply(
        v, jax.random.PRNGKey(1), 4, return_steps=True,
        method=AutoDiffusionNet.diffusion_sample,
    )
    assert len(steps) == model.n_steps
    assert all(s.shape == (4, 32, 32, 1) for s in steps)


def test_beta_t_weighting():
    """β_t = 0.5·tanh(10(t-0.5)) + 0.5 weights the prior loss: ~0 at t=0,
    ~1 at t=1 (reference: auto_diffusion.py:29-32)."""
    m = _model()
    ploss = jnp.ones((4,))
    lo = float(m.prior_loss(ploss, {}, time=jnp.zeros((4,))))
    hi = float(m.prior_loss(ploss, {}, time=jnp.ones((4,))))
    mid = float(m.prior_loss(ploss, {}, time=jnp.full((4,), 0.5)))
    assert lo < 0.01 and hi > 0.99 and abs(mid - 0.5) < 1e-6


def test_time_batch_preprocess(key):
    """t ~ U[0,1] per batch element in train mode; fixed 0.5 without a key
    (reference: auto_diffusion.py:21-27)."""
    m = _model()
    batch = (jnp.zeros((16, 32, 32, 1)), jnp.zeros((16,), jnp.int32))
    p = m.batch_preprocess(batch, key, train=True)
    t = np.asarray(p["kwargs"]["time"])
    assert t.shape == (16,) and t.min() >= 0 and t.max() <= 1 and t.std() > 0.05
    p0 = m.batch_preprocess(batch, None, train=True)
    np.testing.assert_array_equal(np.asarray(p0["kwargs"]["time"]), 0.5)
