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
                  train: bool = False, decode: bool = False,
                  positions=None) -> jax.Array:
        """Next-token logits for a [B, n_tokens] index sequence.

        ``decode=True`` routes through the KV-cached path (flax 'cache'
        collection): a full-length call creates the caches, single-token
        calls with ``positions=[i]`` decode incrementally."""
        if decode:
            from ot_vae_tpu.models.base import accepted_call_args

            allowed = accepted_call_args(self.autoregressive_decoder)
            kwargs = {}
            if labels is not None and "labels" in allowed:
                kwargs["labels"] = labels
            if time is not None and "time" in allowed:
                kwargs["time"] = time
            return self.autoregressive_decoder(
                indices, train=train, decode=True, positions=positions, **kwargs
            )
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
        """Token-by-token generation then codebook lookup + decode —
        the UNROLLED oracle path: one full AR forward per generated token,
        mirroring the reference hot loop (discrete_auto_diffuser.py:87-89).
        O(T²·depth) compute and jaxpr size ∝ T; production sampling uses the
        KV-cached ``lax.scan`` path in ``DAD.sample_fn`` (identical samples
        for identical keys — tests/test_dad.py)."""
        prior: CodebookPrior = self.prior
        n_tokens, vocab = prior.n_tokens, prior.num_embeddings

        k_init, k_loop = jax.random.split(key)
        tokens = jax.random.randint(k_init, (batch_size, n_tokens), 0, vocab)

        for i in range(n_tokens - 1):
            k_loop, k_tok = jax.random.split(k_loop)
            logits = self.ar_logits(tokens, labels=labels)  # [B, T, V]
            nxt = jax.random.categorical(k_tok, logits[:, i], axis=-1)
            tokens = tokens.at[:, i + 1].set(nxt)

        return self.decode_tokens(tokens, labels=labels)

    def decode_tokens(self, tokens: jax.Array, labels=None):
        """[B, n_tokens] indices → codebook lookup → unflatten → decode."""
        prior: CodebookPrior = self.prior
        n_tokens, vocab = prior.n_tokens, prior.num_embeddings
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
                 kv_cache: bool = True, **kwargs):
        super().__init__(*args, prior=prior, **kwargs)
        self.kv_cache = kv_cache
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
        """Ancestral sampling. Default: KV-cached ``lax.scan`` (one cached
        single-token decode per step — compile time flat in n_tokens,
        O(T·depth·dim²+T²·dim) compute). ``kv_cache=False`` falls back to the
        unrolled oracle (one FULL AR forward per token, jaxpr ∝ T — the
        reference's own algorithm, discrete_auto_diffuser.py:77-95). Both
        paths draw the identical key stream and produce identical samples
        (asserted in tests/test_dad.py)."""
        if not getattr(self, "kv_cache", True):
            return self.net.apply(
                variables, key, batch_size, labels=kwargs.get("labels"),
                method=DADNet.ancestral_sample,
            )
        return self._ancestral_sample_scan(
            variables, key, batch_size, labels=kwargs.get("labels")
        )

    def _ancestral_sample_scan(self, variables, key, batch_size, labels=None):
        net = self.net
        n_tokens, vocab = self.n_tokens, self.num_embeddings
        k_init, k_loop = jax.random.split(key)
        tokens = jax.random.randint(k_init, (batch_size, n_tokens), 0, vocab)

        # Create the zeroed [B, T, heads, head_dim] KV caches: a full-length
        # decode=True call allocates them (flax creates cache variables sized
        # like this call's keys; cache_index stays 0, so nothing is consumed).
        _, cache_vars = net.apply(
            variables, tokens, labels, decode=True,
            positions=jnp.arange(n_tokens), method=DADNet.ar_logits,
            mutable=["cache"],
        )

        def step(carry, i):
            tokens, cache, k_loop = carry
            k_loop, k_tok = jax.random.split(k_loop)
            tok_i = lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)
            logits, mutated = net.apply(
                {**variables, "cache": cache}, tok_i, labels,
                decode=True, positions=i[None], method=DADNet.ar_logits,
                mutable=["cache"],
            )  # [B, 1, V]
            nxt = jax.random.categorical(k_tok, logits[:, 0], axis=-1)
            tokens = lax.dynamic_update_slice_in_dim(
                tokens, nxt[:, None].astype(tokens.dtype), i + 1, axis=1
            )
            return (tokens, mutated["cache"], k_loop), None

        (tokens, _, _), _ = lax.scan(
            step, (tokens, cache_vars["cache"], k_loop),
            jnp.arange(n_tokens - 1),
        )
        return net.apply(variables, tokens, labels=labels,
                         method=DADNet.decode_tokens)
