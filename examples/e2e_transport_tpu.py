"""E2E TPU drive: autoencoder + live LatentTransport (all 3 operators).

Mirrors ``tests/test_latent_transport.py`` (the CPU/eigh parity gate —
reference: /root/reference/tests/test_latent_transport.py, restored PSNR > 14
after the gate's epoch budget) on the **real TPU**, where ``method="auto"``
takes the matmul-only polar W2 path instead of eigh. This is the end-to-end
proof that the polar default preserves restoration quality, not just
operator-level accuracy (tests/test_polar_w2.py).

Usage (from a clean cwd so the installed package resolves)::

    python examples/e2e_transport_tpu.py [auto|polar|eigh]

Measured on TPU v5e (2026-08-19, method=auto → polar): restored PSNR
gaussian 15.69 dB / gmm 14.33 dB / discrete 15.18 dB after 4 epochs —
all above the 14 dB parity floor (model's own test PSNR 15.89); wall
≈ 30 min, compile-dominated — the 4 trained epochs themselves run
~0.9 s each at ~3k img/s.

Note the GMM operator here is ``diag=True`` (matching the parity gate and
the reference's diag-only GMM test), so ``method`` only reaches the
Gaussian operator's full-cov pipeline; gmm/discrete serve as seeded
controls that the shared callback/latent path is method-independent.
"""
import sys
import time

import jax
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

PSNR_FLOOR = 14.0  # the parity gate's floor (tests/test_latent_transport.py)
MAX_EPOCHS = 4     # must match the gate — at 2 epochs the AE itself is ~14.4 dB

method = sys.argv[1] if len(sys.argv) > 1 else "auto"
print("devices:", jax.devices(), "method:", method, flush=True)

dm = MNIST32(train_batch_size=50, val_batch_size=50, test_batch_size=50,
             seed=42, synthetic_train=2500, synthetic_test=2200,
             test_val_split=0.9)
autoencoder = AutoEncoder(1, 64, 32, 4, capacity=4,
                          double_encoded_features=False,
                          down_up_sample=True, residual="add")
model = VAE(metrics=MetricCollection({"psnr": PSNR()}),
            autoencoder=autoencoder, prior=None)

blur = GaussianBlur(5, sigma=1.5)
common = dict(size=model.latent_size, transformations=blur,
              common_operator=True, unpaired=True,
              source_latents_from_train=False,
              target_latents_from_train=False, num_samples_to_log=4)
callbacks = [
    LatentTransport(transport_dims=(1, 2, 3),
                    transport_operator=GaussianTransport,
                    logging_prefix="gaussian",
                    operator_kwargs=dict(diag=False, make_pd=True,
                                         method=method), **common),
    LatentTransport(transport_dims=(3,), transport_operator=GMMTransport,
                    logging_prefix="gmm",
                    operator_kwargs=dict(diag=True, n_components=10,
                                         transport_type="argmax",
                                         kmeans_iter=0, method=method),
                    **common),
    LatentTransport(transport_dims=(1, 2),
                    transport_operator=DiscreteTransport,
                    logging_prefix="discrete",
                    operator_kwargs=dict(n_components=256,
                                         transport_type="mean",
                                         training_mode="mean",
                                         temperature=1e-2, kmeans_iter=0),
                    **common),
]
t0 = time.time()
trainer = Trainer(max_epochs=MAX_EPOCHS, seed=42, callbacks=callbacks,
                  log_every_n_steps=50, enable_progress_bar=False)
trainer.fit(model, dm)
trainer.test(model, dm)
dt = time.time() - t0

for cb in callbacks:
    res = cb.compute_test_metrics()
    value = list(res.values())[0]
    print(f"  {cb.logging_prefix_full}: restored={value:.2f} dB "
          f"cost={cb._last_cost:.4f}", flush=True)
    if isinstance(cb.operator, (GaussianTransport, GMMTransport)):
        assert value > PSNR_FLOOR, (cb.logging_prefix_full, res)
    assert np.isfinite(cb._last_cost)
print(f"method={method} wall={dt:.1f}s OK")
