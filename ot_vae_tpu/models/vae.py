"""VAE: the central model (reference: ot_vae_lightning/model/vae.py:38-269).

``VAENet`` is the flax module: pluggable ``encoder``+``decoder`` OR monolithic
``autoencoder``, an optional prior, static conditional-kwargs routing, and
multi-sample ELBO batch expansion. ``VAE`` is the :class:`VisionModel` that
wires it to the trainer: nelbo loss (recon MSE + prior loss), metric plumbing,
collage methods, and the Lightning-like inference API
(``encode``/``decode``/``sample``/``__call__`` with inference-transform
wrapping).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze, unfreeze

from ot_vae_tpu.metrics import MetricCollection
from ot_vae_tpu.models.base import VisionModel, accepted_call_args
from ot_vae_tpu.utils import (
    mean_replicated_batch,
    replicate_batch,
    std_replicated_batch,
)

__all__ = ["VAENet", "VAE"]

MUTABLE = ("batch_stats", "prior_stats")


class VAENet(nn.Module):
    """Encoder → prior (reparametrize/quantize + loss) → decoder
    (reference forward path: model/vae.py:135-141, 201-238)."""

    encoder: Optional[nn.Module] = None
    decoder: Optional[nn.Module] = None
    autoencoder: Optional[nn.Module] = None
    prior: Optional[nn.Module] = None

    def __post_init__(self):
        super().__post_init__()
        if self.autoencoder is None and (self.encoder is None or self.decoder is None):
            raise ValueError(
                "Set `autoencoder` or (`encoder` and `decoder`)"
            )  # reference: model/vae.py:92-95
        if self.autoencoder is not None and (
            self.encoder is not None or self.decoder is not None
        ):
            raise ValueError("Setting both `autoencoder` and `encoder`/`decoder` is ambiguous")

    # ---------------------------------------------------------- routing

    def _enc_net(self):
        return self.autoencoder if self.autoencoder is not None else self.encoder

    def _call_net(self, net, method: Optional[str], x, train, labels, time):
        kwargs: Dict[str, Any] = {}
        allowed = accepted_call_args(net) if method is None else {
            "labels", "time", "train"  # encode/decode methods share this contract
        }
        if labels is not None and "labels" in allowed:
            kwargs["labels"] = labels
        if time is not None and "time" in allowed:
            kwargs["time"] = time
        if "train" in allowed:
            kwargs["train"] = train
        if method is None:
            return net(x, **kwargs)
        return getattr(net, method)(x, **kwargs)

    @property
    def latent_size(self) -> Tuple[int, ...]:
        """Shape contract after the prior (reference: model/vae.py:191-199)."""
        if self.autoencoder is not None:
            enc_out = tuple(self.autoencoder.latent_size)
        else:
            enc_out = tuple(self.encoder.out_size)
        if self.prior is None:
            return enc_out
        return tuple(self.prior.out_size(enc_out))

    # ---------------------------------------------------------- core ops

    def encode(
        self, x, step=0, key=None, train: bool = False,
        labels=None, time=None, expand: int = 1, return_artifacts: bool = False,
    ):
        """(reference: model/vae.py:201-221)"""
        if self.autoencoder is not None:
            enc = self._call_net(self.autoencoder, "encode", x, train, labels, time)
        else:
            enc = self._call_net(self.encoder, None, x, train, labels, time)

        if expand > 1:
            enc = replicate_batch(enc, expand)
            labels = replicate_batch(labels, expand)
            time = replicate_batch(time, expand)

        if self.prior is None:
            z, loss, artifacts = enc, jnp.zeros(enc.shape[0], enc.dtype), {}
        else:
            if key is None:
                key = jax.random.PRNGKey(0)
            z, loss, artifacts = self.prior(
                enc, step, key, train=train, labels=labels, time=time
            )
        if return_artifacts:
            return z, loss, artifacts
        return z

    def decode(self, z, train: bool = False, labels=None, time=None, expand: int = 1):
        """(reference: model/vae.py:223-229)"""
        if expand > 1:
            labels = replicate_batch(labels, expand)
            time = replicate_batch(time, expand)
        if self.autoencoder is not None:
            return self._call_net(self.autoencoder, "decode", z, train, labels, time)
        return self._call_net(self.decoder, None, z, train, labels, time)

    def __call__(self, x, step=0, key=None, train: bool = False,
                 labels=None, time=None, expand: int = 1):
        z = self.encode(x, step, key, train, labels, time, expand)
        return self.decode(z, train, labels, time, expand)

    def warmup(self, x, step=0, key=None, train: bool = True,
               labels=None, time=None, expand: int = 1):
        """Initialization trace: touches every parameterized path (subclasses
        extend to cover extra submodules, e.g. DAD's AR decoder)."""
        z, ploss, artifacts = self.encode(
            x, step, key, train, labels, time, expand, return_artifacts=True
        )
        return self.decode(z, train, labels, time, expand)

    def sample_latents(self, key, batch_size: int, labels=None, time=None):
        shape = (batch_size, *self.latent_size)
        if self.prior is None:
            return jax.random.normal(key, shape)
        return self.prior.sample(key, shape, labels=labels, time=time)

    def sample(self, key, batch_size: int, labels=None, time=None):
        """(reference: model/vae.py:231-238)"""
        z = self.sample_latents(key, batch_size, labels, time)
        return self.decode(z, train=False, labels=labels, time=time)


class VAE(VisionModel):
    """VAE training logic: ELBO = MSE(recon, target) + prior loss
    (reference: model/vae.py:165-189)."""

    def __init__(
        self,
        metrics: Optional[MetricCollection] = None,
        encoder: Optional[nn.Module] = None,
        decoder: Optional[nn.Module] = None,
        autoencoder: Optional[nn.Module] = None,
        prior: Optional[nn.Module] = None,
        monitor: str = "psnr",
        mode: str = "max",
        conditional: bool = False,
        expansion: int = 1,
        learning_rate: float = 1e-3,
        ema_decay: Optional[float] = None,
        checkpoints: Optional[dict] = None,
        gradient_clip_val: Optional[float] = None,
    ):
        self.metrics = metrics
        self.monitor = monitor
        self.mode = mode
        self.conditional = conditional
        self.expansion = expansion
        self.learning_rate = learning_rate
        self.ema_decay = ema_decay
        self.checkpoints = checkpoints
        self.gradient_clip_val = gradient_clip_val
        self.net = VAENet(
            encoder=encoder, decoder=decoder, autoencoder=autoencoder, prior=prior
        )
        super().__init__()

    # ------------------------------------------------------------ contracts

    @property
    def latent_size(self):
        return self.net.latent_size

    def batch_preprocess(self, batch, key=None, train: bool = True):
        """(samples, labels) → {'samples', 'target', 'kwargs'}
        (reference: model/vae.py:125-133). A curriculum transform set by the
        ProgressiveTransform callback is applied here
        (reference: data/progressive_callback.py:100-118)."""
        samples, labels = batch
        transform = getattr(self, "progressive_transform", None)
        if transform is not None and train:
            samples = transform(samples, key)
        kwargs = {"labels": labels} if self.conditional else {}
        return {"samples": samples, "target": samples, "kwargs": kwargs}

    def init_variables(self, key, sample_batch):
        pbatch = self.batch_preprocess(sample_batch, key)
        k1, k2, k3 = jax.random.split(key, 3)
        return self.net.init(
            {"params": k1, "dropout": k2},
            jnp.asarray(pbatch["samples"]), 0, k3, True,
            **pbatch["kwargs"], expand=self.expansion,
            method="warmup",
        )

    def recon_loss(self, reconstructions, target, **kwargs):
        return jnp.mean((reconstructions - target) ** 2)

    def prior_loss(self, prior_loss, prior_artifacts, aux=None, **kwargs):
        return jnp.mean(prior_loss)

    def _loss_aux(self, net, pbatch, z, ploss, partifacts):
        """Extra in-trace computation hook (runs inside the module apply) —
        e.g. the DAD autoregressive logits (model/discrete_auto_diffuser.py)."""
        return None

    def loss_fn(self, variables, pbatch, step, rngs):
        """nelbo (reference: model/vae.py:165-189). Returns
        (loss, (logs, outputs, mutated_collections))."""
        samples, target = pbatch["samples"], pbatch["target"]
        kwargs = pbatch["kwargs"]
        batch_size = samples.shape[0]

        def run(net):
            z, ploss, partifacts = net.encode(
                samples, step, rngs["prior"], train=True,
                expand=self.expansion, return_artifacts=True, **kwargs,
            )
            recon = net.decode(z, train=True, expand=self.expansion, **kwargs)
            aux = self._loss_aux(net, pbatch, z, ploss, partifacts)
            return z, ploss, partifacts, recon, aux

        (z, ploss, partifacts, recon, aux), mutated = nn.apply(
            lambda net: run(net), self.net, mutable=MUTABLE
        )(variables, rngs={"dropout": rngs["dropout"]})

        recon_mean = mean_replicated_batch(recon, self.expansion)
        p_loss = self.prior_loss(ploss, partifacts, aux=aux, **kwargs) / int(np.prod(samples.shape[1:]))
        r_loss = self.recon_loss(recon_mean, target, **kwargs)
        loss = r_loss + p_loss
        logs = {
            "train/loss/total": loss,
            "train/loss/recon": r_loss,
            "train/loss/prior": p_loss,
        }
        outputs = {
            **pbatch,
            "preds": recon[:batch_size],
            "latents": z[:batch_size],
            "preds_mean": recon_mean,
            **{k: v for k, v in partifacts.items() if isinstance(v, jax.Array)},
        }
        return loss, (logs, outputs, mutated)

    def eval_forward(self, variables, pbatch, key):
        """Full forward in eval mode (reference: model/base.py:205-213)."""
        return self.net.apply(
            variables, pbatch["samples"], 0, key, False,
            **pbatch["kwargs"],
        )

    def encode_fn(self, variables, samples, key=None, **kwargs):
        return self.net.apply(
            variables, samples, 0, key, False, **kwargs,
            method=VAENet.encode,
        )

    def decode_fn(self, variables, latents, **kwargs):
        return self.net.apply(
            variables, latents, False, **kwargs, method=VAENet.decode
        )

    def sample_fn(self, variables, key, batch_size, kwargs):
        return self.net.apply(
            variables, key, batch_size, **kwargs, method=VAENet.sample
        )

    # ------------------------------------------------------------ user API
    # (reference inference semantics: model/base.py:243-292 — inference
    # transforms wrap encode/decode/sample/__call__ when model.inference=True)

    def _require_variables(self):
        if self.variables is None:
            raise RuntimeError("model has no variables — fit or load a checkpoint first")
        return self.variables

    def encode(self, x, key=None, **kwargs):
        v = self._require_variables()
        x = self.maybe_preprocess(jnp.asarray(x))
        return self.encode_fn(v, x, key, **kwargs)

    def decode(self, z, **kwargs):
        v = self._require_variables()
        return self.maybe_postprocess(self.decode_fn(v, jnp.asarray(z), **kwargs))

    def sample(self, batch_size: int, key=None, **kwargs):
        v = self._require_variables()
        if key is None:
            # deterministic default (explicit-key discipline): successive
            # calls step a per-model counter instead of np.random
            count = getattr(self, "_sample_calls", 0)
            self._sample_calls = count + 1
            key = jax.random.fold_in(jax.random.PRNGKey(0), count)
        return self.maybe_postprocess(self.sample_fn(v, key, batch_size, kwargs))

    def __call__(self, x, key=None, **kwargs):
        v = self._require_variables()
        x = self.maybe_preprocess(jnp.asarray(x))
        key = key if key is not None else jax.random.PRNGKey(0)
        out = self.net.apply(v, x, 0, key, False, **kwargs)
        return self.maybe_postprocess(out)

    # ------------------------------------------------------------ collages
    # (reference: model/vae.py:240-253 — methods discovered by the Collage
    # callback via the `collage_methods` registry)

    collage_methods = ["reconstruction", "generation"]

    def reconstruction(self, pbatch, key):
        v = self._require_variables()
        samples, target, kwargs = pbatch["samples"], pbatch["target"], pbatch["kwargs"]
        recon = self.net.apply(
            v, samples, 0, key, False, expand=self.expansion, **kwargs
        )
        mean = mean_replicated_batch(recon, self.expansion)
        std = std_replicated_batch(recon, self.expansion)
        bs = samples.shape[0]
        reals = [recon[bs * i : bs * (i + 1)] for i in range(self.expansion)]
        return [target, mean, *reals, std]

    def generation(self, pbatch, key):
        v = self._require_variables()
        n = pbatch["samples"].shape[0]
        kwargs = replicate_batch(pbatch["kwargs"], 4) if self.conditional else {}
        out = self.sample_fn(v, key, n * 4, kwargs)
        return list(jnp.split(out, 4, axis=0))
