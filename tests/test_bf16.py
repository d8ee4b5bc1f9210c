"""bfloat16 recipe tests — pin the ROADMAP claim ("modules accept
dtype=jnp.bfloat16, verified finite + trains") so it can't regress silently
(VERDICT r1 weak #4). Mixed precision: bf16 activations, f32 params — the
TPU-native replacement for the reference's AMP fp16 flag
(reference: configs/ddp.yaml:5, SURVEY §2.2 mixed-precision row).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.data import MNIST32
from ot_vae_tpu.metrics import PSNR, MetricCollection
from ot_vae_tpu.models import VAE
from ot_vae_tpu.networks import CNN
from ot_vae_tpu.ops.w2 import w2_gaussian
from ot_vae_tpu.priors import GaussianPrior
from ot_vae_tpu.trainer import Trainer


def test_w2_gaussian_bf16_inputs(rng):
    """bf16 inputs: percent-level error vs f32, never NaN (verify-skill probe)."""
    d = 16
    m1 = rng.standard_normal((d, d))
    m2 = rng.standard_normal((d, d))
    cov1 = (m1 @ m1.T + d * np.eye(d)).astype(np.float32)
    cov2 = (m2 @ m2.T + d * np.eye(d)).astype(np.float32)
    mu1 = rng.standard_normal(d).astype(np.float32)
    mu2 = rng.standard_normal(d).astype(np.float32)

    f32 = float(w2_gaussian(jnp.asarray(mu1), jnp.asarray(mu2),
                            jnp.asarray(cov1), jnp.asarray(cov2), make_pd=True))
    bf16 = float(w2_gaussian(
        jnp.asarray(mu1, jnp.bfloat16), jnp.asarray(mu2, jnp.bfloat16),
        jnp.asarray(cov1, jnp.bfloat16), jnp.asarray(cov2, jnp.bfloat16),
        make_pd=True,
    ))
    assert np.isfinite(bf16)
    assert abs(bf16 - f32) / abs(f32) < 0.05, (bf16, f32)


def test_bf16_vae_trains_finite():
    """bf16-activation VAE: fit runs, losses stay finite, PSNR is real, and
    the trained params (f32) are finite."""
    dm = MNIST32(train_batch_size=32, val_batch_size=32, test_batch_size=32,
                 seed=0, synthetic_train=128, synthetic_test=64)
    model = VAE(
        metrics=MetricCollection({"psnr": PSNR()}),
        encoder=CNN(1, 8, 32, 8, capacity=4, down_sample=True,
                    dtype=jnp.bfloat16),
        decoder=CNN(4, 1, 8, 32, capacity=4, up_sample=True,
                    dtype=jnp.bfloat16),
        prior=GaussianPrior(),
    )
    tr = Trainer(max_epochs=2, seed=0, log_every_n_steps=100)
    tr.fit(model, dm)
    psnr = tr.logged_metrics["val/metrics/psnr"]
    assert np.isfinite(psnr) and psnr > 5.0, psnr
    for leaf in jax.tree_util.tree_leaves(tr.state.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))
