"""DAD — Discrete Auto Diffuser: VAE with a codebook prior and an
autoregressive token decoder
(reference: ot_vae_lightning/model/discrete_auto_diffuser.py:31-135).

The prior loss adds shifted cross-entropy between the AR logits and the
codebook assignment distributions (tokens < n predict n); sampling is
ancestral token-by-token generation as a ``lax.fori_loop`` with one AR
forward per token.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from ot_vae_tpu.models.vae import VAE, VAENet
from ot_vae_tpu.priors.codebook import CodebookPrior

__all__ = ["DADNet", "DAD"]


class DADNet(VAENet):
    """VAENet + autoregressive token decoder + ancestral sampler."""

    autoregressive_decoder: Optional[nn.Module] = None

    def ar_logits(self, indices: jax.Array, labels=None, time=None,
                  train: bool = False) -> jax.Array:
        """Next-token logits for a [B, n_tokens] index sequence."""
        return self._call_net(self.autoregressive_decoder, None, indices,
                              train, labels, time)

    def warmup(self, x, step=0, key=None, train: bool = True,
               labels=None, time=None, expand: int = 1):
        """Also touch the AR decoder so its params are created at init."""
        z, ploss, artifacts = self.encode(
            x, step, key, train, labels, time, expand, return_artifacts=True
        )
        self.ar_logits(artifacts["indices"], labels=labels, train=train)
        return self.decode(z, train, labels, time, expand)

    def ancestral_sample(self, key: jax.Array, batch_size: int, labels=None):
        """Token-by-token generation then codebook lookup + decode
        (reference: discrete_auto_diffuser.py:77-95)."""
        prior: CodebookPrior = self.prior
        n_tokens, vocab = prior.n_tokens, prior.num_embeddings

        k_init, k_loop = jax.random.split(key)
        tokens = jax.random.randint(k_init, (batch_size, n_tokens), 0, vocab)

        # one full AR forward per generated token (reference hot loop,
        # discrete_auto_diffuser.py:87-89); static python loop → unrolled,
        # which XLA pipelines better than lax.scan for small n_tokens
        for i in range(n_tokens - 1):
            k_loop, k_tok = jax.random.split(k_loop)
            logits = self.ar_logits(tokens, labels=labels)  # [B, T, V]
            nxt = jax.random.categorical(k_tok, logits[:, i], axis=-1)
            tokens = tokens.at[:, i + 1].set(nxt)

        codebook = prior.codebook()  # [T(or 1), K, D]
        one_hot = jax.nn.one_hot(tokens, vocab, dtype=codebook.dtype)  # [B, T, V]
        latents = jnp.einsum("btv,tvd->btd", one_hot,
                             jnp.broadcast_to(codebook, (n_tokens, vocab,
                                                         codebook.shape[-1])))
        # [B, T, D] → [T, B, D] → unflatten to the latent tensor
        z = prior._unflatten(jnp.swapaxes(latents, 0, 1))
        return self.decode(z, train=False, labels=labels)


class DAD(VAE):
    """(reference: discrete_auto_diffuser.py:31-95)"""

    def __init__(self, *args, prior: CodebookPrior,
                 autoregressive_decoder: nn.Module, ce_coeff: float = 1.0,
                 **kwargs):
        super().__init__(*args, prior=prior, **kwargs)
        base = self.net
        self.net = DADNet(
            encoder=base.encoder, decoder=base.decoder,
            autoencoder=base.autoencoder, prior=prior,
            autoregressive_decoder=autoregressive_decoder,
        )
        self.ce_coeff = ce_coeff
        self.n_tokens = prior.n_tokens
        self.num_embeddings = prior.num_embeddings

    def _loss_aux(self, net, pbatch, z, ploss, partifacts):
        """AR logits over the (detached) assignment indices — computed inside
        the module apply so the decoder trains
        (reference: discrete_auto_diffuser.py:56-58)."""
        indices = lax.stop_gradient(partifacts["indices"])  # [B, T]
        return net.ar_logits(indices, labels=pbatch["kwargs"].get("labels"),
                             train=True)

    def prior_loss(self, prior_loss, prior_artifacts, aux=None, **kwargs):
        """prior loss + shifted CE(q(z_t|z_{t-1}) || p(z_t|tokens<t))
        (reference: discrete_auto_diffuser.py:53-75)."""
        logits = aux  # [B, T, V]
        labels = lax.stop_gradient(prior_artifacts["distribution"])  # [B, T, V]
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        log_probs = jax.nn.log_softmax(shift_logits, axis=-1)
        ce = -jnp.sum(shift_labels * log_probs, axis=-1).sum(-1)  # [B]
        return jnp.mean(prior_loss + self.ce_coeff * ce)

    def sample_fn(self, variables, key, batch_size, kwargs):
        return self.net.apply(
            variables, key, batch_size, labels=kwargs.get("labels"),
            method=DADNet.ancestral_sample,
        )
