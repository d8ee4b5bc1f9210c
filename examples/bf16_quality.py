"""bf16-vs-f32 quality delta on the MNIST32 CNN VAE e2e floor.

Measures the test-PSNR difference between an f32-activation and a
bf16-activation training run of the same seeded configuration (the decision
input for making bf16 the default train dtype — ROADMAP item; the reference's
analog is Lightning's AMP fp16 flag, configs/ddp.yaml:5).

Run on the TPU (default backend): ``python examples/bf16_quality.py``.
"""
import json

import jax.numpy as jnp

from ot_vae_tpu.data import MNIST32
from ot_vae_tpu.metrics import PSNR, MetricCollection
from ot_vae_tpu.models import VAE
from ot_vae_tpu.networks import CNN
from ot_vae_tpu.priors import GaussianPrior
from ot_vae_tpu.trainer import Trainer


def run(dtype, epochs=6):
    dm = MNIST32(train_batch_size=50, val_batch_size=50, test_batch_size=50,
                 seed=42, synthetic_train=3000, synthetic_test=500)
    kw = {} if dtype is None else {"dtype": dtype}
    model = VAE(
        metrics=MetricCollection({"psnr": PSNR()}),
        encoder=CNN(1, 256, 32, 1, capacity=8, down_sample=True,
                    residual="add", **kw),
        decoder=CNN(128, 1, 1, 32, capacity=8, up_sample=True,
                    residual="add", **kw),
        prior=GaussianPrior(loss_coeff=0.1),
    )
    tr = Trainer(max_epochs=epochs, seed=42, log_every_n_steps=1000)
    tr.fit(model, dm)
    return tr.test(model, dm)["test/metrics/psnr"]


def main():
    f32 = run(None)
    bf16 = run(jnp.bfloat16)
    out = {"f32_psnr_db": round(f32, 3), "bf16_psnr_db": round(bf16, 3),
           "delta_db": round(bf16 - f32, 3)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
