"""Serving: pre-compiled inference engine over a trained checkpoint.

The reference's deployment story is ``VAE.load_from_checkpoint`` +
``model.inference = True`` (reference: tests/test_mnist_cnn_vae.py:199-251).
This module packages that as a production path: load once, AOT-compile
``encode``/``decode``/``sample``/``reconstruct`` for fixed batch sizes, and
serve with zero Python-side tracing at request time. Raw inputs are
normalized/denormalized with the transforms stored in the checkpoint sidecar.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["InferenceEngine"]


class InferenceEngine:
    """Pre-compiled inference over a model restored from a checkpoint.

    :param model: a VisionModel (e.g. VAE) — architecture must match the
                  checkpoint
    :param checkpoint_path: directory written by ``save_checkpoint``
    :param batch_sizes: batch sizes to pre-compile (requests are padded up to
                        the nearest compiled size — static shapes for XLA)
    :param use_ema: serve the EMA shadow weights when present
    :param mesh: optional ``jax.sharding.Mesh`` — inputs are sharded on the
                 ``data`` axis and parameters replicated, so one request fans
                 out over all chips (the reference's "distributed inference"
                 via ``Trainer(gpus=..., strategy=...)`` + ``predict``,
                 reference README.md). Batch sizes should be divisible by the
                 data-axis size.
    """

    def __init__(
        self,
        model,
        checkpoint_path: Optional[str] = None,
        batch_sizes: Sequence[int] = (1, 8, 64),
        use_ema: bool = False,
        mesh=None,
    ):
        from ot_vae_tpu.trainer.checkpoint import load_checkpoint

        self.model = model
        if checkpoint_path is not None:
            tree, _ = load_checkpoint(checkpoint_path, model)
            if use_ema and tree.get("ema_params") is not None:
                model.variables = {**model.variables, "params": tree["ema_params"]}
        if model.variables is None:
            raise ValueError("model has no variables — pass a checkpoint_path")
        model.inference = True
        self.batch_sizes = tuple(sorted(batch_sizes))
        self.mesh = mesh
        if mesh is not None:
            from ot_vae_tpu.parallel.mesh import put_replicated

            self._variables = put_replicated(mesh, model.variables)
        else:
            self._variables = jax.device_put(model.variables)
        self._fns: Dict[Tuple, callable] = {}
        # Restore programs close over a transport's _flatten/_unflatten and
        # operator, so they are cached PER TRANSPORT OBJECT in a weak-key map:
        # entries die with the transport (no unbounded growth in a long-lived
        # server), and reconfiguring a served transport requires a new object
        # (the compiled pipeline is pinned at first use).
        import weakref

        self._restore_fns = weakref.WeakKeyDictionary()
        # Deterministic default keys (explicit-key discipline): when a caller
        # passes no key, EVERY endpoint draws from a per-engine counter folded
        # into a fixed root key — a fresh engine reproduces the same sequence.
        self._default_calls = 0

    # ------------------------------------------------------------ compile

    def _get(self, kind: str, batch: int, kw_keys: Tuple[str, ...] = ()):
        """One jitted program per (endpoint, bucket, conditioning-key set);
        conditioning kwargs (labels, time) are traced dict arguments resolved
        statically by the model's kwargs routing."""
        key = (kind, batch, kw_keys)
        if key in self._fns:
            return self._fns[key]
        model = self.model

        if kind == "encode":
            fn = jax.jit(lambda v, x, k, kw: model.encode_fn(v, x, k, **kw))
        elif kind == "decode":
            fn = jax.jit(lambda v, z, k, kw: model.decode_fn(v, z, **kw))
        elif kind == "sample":
            fn = jax.jit(lambda v, _, k, kw: model.sample_fn(v, k, batch, kw))
        elif kind == "reconstruct":
            fn = jax.jit(
                lambda v, x, k, kw: model.net.apply(v, x, 0, k, False, **kw)
            )
        else:
            raise ValueError(kind)
        self._fns[key] = fn
        return fn

    def _prep_kwargs(self, kwargs, n_req: int, bucket: int):
        """Device-ready conditioning kwargs: batch-shaped arrays are padded
        up to the bucket alongside the images."""
        kw = {}
        for k, v in kwargs.items():
            v = np.asarray(v)
            if v.ndim >= 1 and v.shape[0] == n_req and bucket > n_req:
                pad = np.zeros((bucket - n_req, *v.shape[1:]), v.dtype)
                v = np.concatenate([v, pad])
            kw[k] = jnp.asarray(v)
        return kw

    def _pad_to_bucket(self, x: np.ndarray) -> Tuple[jax.Array, int]:
        n = x.shape[0]
        bucket = next((b for b in self.batch_sizes if b >= n), None)
        if bucket is None:
            bucket = int(np.ceil(n / self.batch_sizes[-1]) * self.batch_sizes[-1])
        if n < bucket:
            pad = np.zeros((bucket - n, *x.shape[1:]), x.dtype)
            x = np.concatenate([x, pad])
        if self.mesh is not None:
            from ot_vae_tpu.parallel.mesh import data_sharding

            return jax.device_put(x, data_sharding(self.mesh, x.ndim)), n
        return jnp.asarray(x), n

    # ------------------------------------------------------------ serving API

    def encode(self, images, key=None, **kwargs):
        n_req = int(np.asarray(images).shape[0])
        x = self.model.inference_preprocess(np.asarray(images, np.float32))
        xb, n = self._pad_to_bucket(np.asarray(x))
        key = key if key is not None else self._default_key()
        kw = self._prep_kwargs(kwargs, n_req, xb.shape[0])
        z = self._get("encode", xb.shape[0], tuple(sorted(kw)))(
            self._variables, xb, key, kw)
        return np.asarray(z)[:n]

    def decode(self, latents, key=None, **kwargs):
        n_req = int(np.asarray(latents).shape[0])
        zb, n = self._pad_to_bucket(np.asarray(latents, np.float32))
        kw = self._prep_kwargs(kwargs, n_req, zb.shape[0])
        out = self._get("decode", zb.shape[0], tuple(sorted(kw)))(
            self._variables, zb, None, kw)
        return np.asarray(self.model.inference_postprocess(out))[:n]

    def _default_key(self):
        k = jax.random.fold_in(jax.random.PRNGKey(0), self._default_calls)
        self._default_calls += 1
        return k

    def sample(self, batch_size: int, key=None, **kwargs):
        """Conditioning kwargs (labels, time) thread into the prior sample
        and decode like the reference's ``VAE.sample(B, **cond_kwargs)``."""
        key = key if key is not None else self._default_key()
        kw = self._prep_kwargs(kwargs, batch_size, batch_size)
        out = self._get("sample", batch_size, tuple(sorted(kw)))(
            self._variables, None, key, kw)
        return np.asarray(self.model.inference_postprocess(out))

    def reconstruct(self, images, key=None, **kwargs):
        n_req = int(np.asarray(images).shape[0])
        x = self.model.inference_preprocess(np.asarray(images, np.float32))
        xb, n = self._pad_to_bucket(np.asarray(x))
        key = key if key is not None else self._default_key()
        kw = self._prep_kwargs(kwargs, n_req, xb.shape[0])
        out = self._get("reconstruct", xb.shape[0], tuple(sorted(kw)))(
            self._variables, xb, key, kw)
        return np.asarray(self.model.inference_postprocess(out))[:n]

    def _get_restore(self, transport, bucket: int, kw_keys: Tuple[str, ...]):
        """One jitted encode→flatten→transport→unflatten→decode program per
        (transport, bucket, conditioning-keys) — the fitted operator state is
        a traced ARGUMENT, so re-fitting the operator does not recompile."""
        per_transport = self._restore_fns.setdefault(transport, {})
        cache_key = (bucket, kw_keys)
        if cache_key in per_transport:
            return per_transport[cache_key]
        model = self.model
        flatten, unflatten = transport._flatten, transport._unflatten
        operator = transport.operator

        @jax.jit
        def fn(v, state, x, key, kw):
            k_enc, k_tr = jax.random.split(key)
            z = model.encode_fn(v, x, k_enc, **kw)
            z_t = unflatten(operator.transport(state, flatten(z), k_tr))
            return model.decode_fn(v, z_t, **kw)

        per_transport[cache_key] = fn
        return fn

    def restore(self, images, transport, key=None, **kwargs):
        """Restoration serving: encode degraded raw images, transport their
        latents source→target through a FITTED ``LatentTransport``, decode.

        This is the reference's test-time restoration path
        (reference: ot/transport_callback.py:238-254) exposed as a serving
        endpoint: ``transport`` is a ``LatentTransport`` whose operator state
        was fitted during training — either still in-process, or re-loaded
        with ``LatentTransport.load_state`` (the reference cannot do the
        latter: its fitted operator buffers are never checkpointed).

        The whole request is ONE pre-compilable XLA program per batch bucket
        (same AOT story as ``encode``/``decode``), the request ``key`` is
        split over the encoder and the transport draw (stochastic operators
        are reproducible per key and the callback's internal RNG is never
        touched), and conditioning ``kwargs`` (e.g. ``labels``) are threaded
        through both encode and decode like the reference's restoration path.
        """
        if transport.state is None:
            raise ValueError(
                "transport has no fitted state — fit it during training or "
                "load one with LatentTransport.load_state()"
            )
        n_req = int(np.asarray(images).shape[0])
        x = self.model.inference_preprocess(np.asarray(images, np.float32))
        xb, n = self._pad_to_bucket(np.asarray(x))
        key = key if key is not None else self._default_key()
        kw = self._prep_kwargs(kwargs, n_req, xb.shape[0])
        fn = self._get_restore(transport, xb.shape[0], tuple(sorted(kw)))
        out = fn(self._variables, transport.state, xb, key, kw)
        return np.asarray(self.model.inference_postprocess(out))[:n]

    def warmup(self, **kwargs):
        """Compile the sample path for every bucket ahead of serving;
        conditional models pass their conditioning kwargs (per-bucket arrays
        are tiled/truncated to each bucket size)."""
        for b in self.batch_sizes:
            kw = {}
            for k, v in kwargs.items():
                v = np.asarray(v)
                if v.ndim >= 1:
                    reps = int(np.ceil(b / v.shape[0]))
                    v = np.concatenate([v] * reps)[:b]
                kw[k] = v
            self.sample(b, **kw)
        return self
