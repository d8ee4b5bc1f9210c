"""End-to-end latent transport: plain autoencoder (prior=None) + all three
transport operators on different transport_dims
(parity: /root/reference/tests/test_latent_transport.py — restored PSNR > 14
for the Gaussian & GMM operators after 2 epochs).

NHWC note: the reference's transport_dims translate as
(1,2,3)→whole tensor, (1,)→per-pixel channel vector = NHWC (3,),
(2,3)→per-channel spatial map = NHWC (1,2).
"""
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.data import MNIST32, GaussianBlur
from ot_vae_tpu.metrics import PSNR, MetricCollection
from ot_vae_tpu.models import VAE
from ot_vae_tpu.networks import AutoEncoder
from ot_vae_tpu.trainer import Trainer
from ot_vae_tpu.transport import (
    DiscreteTransport,
    GaussianTransport,
    GMMTransport,
    LatentTransport,
)

_PSNR_PERFORMANCE = 14
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



def test_vae_latent_transport():
    # val set sized so each side of the unpaired stream sees ~900 samples —
    # the whole-tensor operator fits a 1024-dim covariance (shrinkage-
    # regularized in GaussianTransport)
    dm = MNIST32(train_batch_size=50, val_batch_size=50, test_batch_size=50,
                 seed=42, synthetic_train=2500, synthetic_test=2200,
                 test_val_split=0.9)

    latent_ch, latent_res = 64, 4  # latents [4, 4, 64] NHWC
    autoencoder = AutoEncoder(
        1, latent_ch, 32, latent_res, capacity=4,
        double_encoded_features=False, down_up_sample=True, residual="add",
    )
    model = VAE(metrics=MetricCollection({"psnr": PSNR()}),
                autoencoder=autoencoder, prior=None)
    assert tuple(model.latent_size) == (latent_res, latent_res, latent_ch)

    blur = GaussianBlur(5, sigma=1.5)
    common = dict(
        size=model.latent_size, transformations=blur, common_operator=True,
        unpaired=True, source_latents_from_train=False,
        target_latents_from_train=False, num_samples_to_log=4,
    )
    callbacks = [
        LatentTransport(
            transport_dims=(1, 2, 3), transport_operator=GaussianTransport,
            logging_prefix="gaussian",
            operator_kwargs=dict(diag=False, make_pd=True), **common,
        ),
        LatentTransport(
            transport_dims=(3,), transport_operator=GMMTransport,
            logging_prefix="gmm",
            operator_kwargs=dict(diag=True, n_components=10,
                                 transport_type="argmax", kmeans_iter=0),
            **common,
        ),
        LatentTransport(
            transport_dims=(1, 2), transport_operator=DiscreteTransport,
            logging_prefix="discrete",
            operator_kwargs=dict(n_components=256, transport_type="mean",
                                 training_mode="mean", temperature=1e-2,
                                 kmeans_iter=0),
            **common,
        ),
    ]

    trainer = Trainer(max_epochs=_MAX_EPOCH, seed=42, callbacks=callbacks,
                      log_every_n_steps=50)
    trainer.fit(model, dm)
    trainer.test(model, dm)

    for cb in callbacks:
        res = cb.compute_test_metrics()
        assert res, f"no transport test metrics for {cb.logging_prefix_full}"
        value = list(res.values())[0]
        if isinstance(cb.operator, (GaussianTransport, GMMTransport)):
            assert value > _PSNR_PERFORMANCE, (cb.logging_prefix_full, res)
        # cost was logged at val-epoch end
        assert cb._last_cost is not None and np.isfinite(cb._last_cost)
