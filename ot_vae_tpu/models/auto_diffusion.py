"""AutoDiffusion: time-conditioned denoising VAE
(reference: ot_vae_lightning/model/auto_diffusion.py:16-96).

Per-batch random time conditioning, tanh-weighted prior loss, and iterative
encode/decode ancestral sampling over ``n_steps`` (with the optional
"improved" correction).
"""
from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.models.vae import VAE, VAENet
from ot_vae_tpu.utils import replicate_batch

__all__ = ["AutoDiffusionNet", "AutoDiffusion"]


class AutoDiffusionNet(VAENet):
    """VAENet + the iterative diffusion sampler
    (reference: auto_diffusion.py:34-59)."""

    n_steps: int = 10

    def diffusion_sample(
        self,
        key: jax.Array,
        batch_size: int,
        labels: Optional[jax.Array] = None,
        improved_algorithm: bool = False,
        return_steps: bool = False,
    ) -> Union[jax.Array, List[jax.Array]]:
        ones = jnp.ones((batch_size,), jnp.float32)
        k_init, k_loop = jax.random.split(key)
        xs = self.sample_latents(k_init, batch_size, labels=labels, time=ones)

        step_size = 1.0 / self.n_steps
        x_hat, intermediate = None, []
        # static unrolled schedule s: 1 → step_size (reference uses np.linspace)
        for i, s in enumerate(np.linspace(1.0, step_size, self.n_steps)):
            x_hat = self.decode(xs, train=False, labels=labels, time=ones * float(s))
            k_loop, k_enc = jax.random.split(k_loop)
            if improved_algorithm:
                xs = xs - (
                    self.encode(x_hat, 0, k_enc, train=False, labels=labels,
                                time=ones * float(s - step_size))
                    - self.encode(x_hat, 0, k_enc, train=False, labels=labels,
                                  time=ones * float(s))
                )
            else:
                xs = self.encode(x_hat, 0, k_enc, train=False, labels=labels,
                                 time=ones * float(s - step_size))
            if return_steps:
                intermediate.append(x_hat)
        return intermediate if return_steps else x_hat


class AutoDiffusion(VAE):
    """(reference: auto_diffusion.py:16-33, 61-85)"""

    n_steps = 10

    def __init__(self, *args, n_steps: int = 10, **kwargs):
        super().__init__(*args, **kwargs)
        base = self.net
        self.net = AutoDiffusionNet(
            encoder=base.encoder, decoder=base.decoder,
            autoencoder=base.autoencoder, prior=base.prior, n_steps=n_steps,
        )
        self.n_steps = n_steps

    def batch_preprocess(self, batch, key=None, train: bool = True):
        """Adds t ~ U[0,1] per batch element (reference: auto_diffusion.py:21-27)."""
        pbatch = super().batch_preprocess(batch, key, train)
        bs = pbatch["samples"].shape[0]
        if key is None:
            t = jnp.full((bs,), 0.5, jnp.float32)
        else:
            t = jax.random.uniform(key, (bs,), jnp.float32)
        pbatch["kwargs"] = {**pbatch["kwargs"], "time": t}
        return pbatch

    def prior_loss(self, prior_loss, prior_artifacts, aux=None, **kwargs):
        """β_t = 0.5·tanh(10(t-0.5)) + 0.5 (reference: auto_diffusion.py:29-32)."""
        t = replicate_batch(kwargs["time"], self.expansion)
        beta_t = 0.5 * jnp.tanh(10.0 * (t - 0.5)) + 0.5
        return jnp.mean(beta_t * prior_loss)

    def sample_fn(self, variables, key, batch_size, kwargs):
        return self.net.apply(
            variables, key, batch_size,
            labels=kwargs.get("labels"),
            method=AutoDiffusionNet.diffusion_sample,
        )

    # ---------------------------------------------------------- collages
    # (reference: auto_diffusion.py:61-85)

    collage_methods = ["reconstruction", "generation"]

    def reconstruction(self, pbatch, key):
        v = self._require_variables()
        samples, target = pbatch["samples"], pbatch["target"]
        ones = jnp.ones((samples.shape[0],), jnp.float32)
        outs = []
        for t in np.linspace(0, 1, 10):
            outs.append(self.net.apply(
                v, samples, 0, key, False,
                labels=pbatch["kwargs"].get("labels"), time=ones * float(t),
            ))
        return outs + [target]

    def generation(self, pbatch, key):
        v = self._require_variables()
        n = pbatch["samples"].shape[0]
        steps = self.net.apply(
            v, key, n, labels=pbatch["kwargs"].get("labels"),
            return_steps=True, method=AutoDiffusionNet.diffusion_sample,
        )
        return steps[:: max(1, len(steps) // 10)]
