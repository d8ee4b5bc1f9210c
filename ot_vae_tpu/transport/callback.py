"""LatentTransport callback: learn latent-space transport operators online
during training (reference: ot_vae_lightning/ot/transport_callback.py:56-453).

During validation, clean latents feed the target distribution (even batches)
and degraded-image latents the source (odd batches, unpaired); at epoch end
the transport operator is fit and its cost logged + a 6-panel collage written;
at test time degraded latents are transported and the restored images scored
with cloned test metrics.

``transport_dims`` are 1-based dims of the NHWC latent ([B, H, W, C]):
(3,) transports each pixel's channel vector, (1, 2) each channel's spatial
map, (1, 2, 3) the whole tensor (the reference's NCHW examples map to these).

Class-conditional filtering (``class_idx``) is jit-safe: samples of other
classes get zero weight in the streaming update (the reference filters
host-side with boolean masks, transport_callback.py:691-694).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.trainer.callbacks import Callback, list_to_collage
from ot_vae_tpu.utils import camel2snake, permute_and_flatten, unflatten_and_unpermute

__all__ = ["LatentTransport", "ConditionalLatentTransport"]


# eq=False keeps identity-based __hash__: instances key weak-ref caches
# (serving.InferenceEngine restore programs) and field-wise __eq__ over
# pytree/array fields is meaningless anyway.
@dataclasses.dataclass(eq=False)
class LatentTransport(Callback):
    """:param size: latent tensor size WITHOUT batch, NHWC, e.g. (H, W, C)
    :param transport_dims: 1-based dims of [B, *size] to transport together
    :param transport_operator: a configured TransportOperator factory — built
        here with the leading/dim shapes derived from ``transport_dims``
        (pass the *class* plus ``operator_kwargs``)
    :param transformations: device-side degradation transform (jit-safe)
    :param common_operator: one operator for all needles vs one per position
    (reference: transport_callback.py:409-505)
    """

    size: Tuple[int, ...] = ()
    transport_dims: Tuple[int, ...] = ()
    transport_operator: type = None
    transformations: Callable = None
    common_operator: bool = False
    unpaired: bool = True
    source_latents_from_train: bool = False
    target_latents_from_train: bool = False
    store_source: bool = False
    store_target: bool = False
    logging_prefix: Optional[str] = None
    num_samples_to_log: int = 8
    class_idx: Optional[int] = None
    operator_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    seed: int = 0

    def __post_init__(self):
        all_dims = list(range(1, len(self.size) + 1))
        if not set(self.transport_dims).issubset(all_dims):
            raise ValueError(
                f"`transport_dims` must be a subset of {all_dims}"
            )
        batch_dims = sorted(set(all_dims).difference(self.transport_dims))
        self.batch_shape = tuple(self.size[i - 1] for i in batch_dims)
        self.event_shape = tuple(self.size[i - 1] for i in self.transport_dims)
        self.dim = int(np.prod(self.event_shape))

        leading = () if self.common_operator else (int(np.prod(self.batch_shape)),)
        self.operator = self.transport_operator(
            leading_shape=leading, dim=self.dim,
            store_source=self.store_source, store_target=self.store_target,
            **self.operator_kwargs,
        )

        flatten_batch = self.common_operator and len(self.size) > len(self.transport_dims)
        self._flatten = functools.partial(
            permute_and_flatten, permute_dims=self.transport_dims,
            batch_first=self.common_operator, flatten_batch=flatten_batch,
        )
        self._unflatten = functools.partial(
            unflatten_and_unpermute, orig_shape=(-1, *self.size),
            permute_dims=self.transport_dims,
            batch_first=self.common_operator, flatten_batch=flatten_batch,
        )
        op_name = camel2snake(type(self.operator).__name__).replace("_transport", "")
        suffix = f"/{self.logging_prefix}" if self.logging_prefix else ""
        self.logging_prefix_full = f"transport/{op_name}{suffix}/"

        self.state = None
        self.test_metrics = None
        self._test_metric_states = None
        self._stored: Dict[str, list] = {"source": [], "target": []}
        self._rng = jax.random.PRNGKey(self.seed)
        self._last_cost = None
        self._jit_update = jax.jit(self.operator.update, static_argnames=())
        self._jit_compute = jax.jit(self.operator.compute)
        self._jit_transport = jax.jit(self.operator.transport)

    # ------------------------------------------------------------ helpers

    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _class_weights(self, latents_leading: int, outputs) -> Optional[jax.Array]:
        if self.class_idx is None:
            return None
        labels = outputs.get("kwargs", {}).get("labels")
        if labels is None:
            raise ValueError("class_idx set but no `labels` in batch kwargs")
        w = (labels == self.class_idx).astype(jnp.float32)  # [B]
        if self.common_operator and len(self.batch_shape) > 0:
            # flatten_batch: [B] -> [B * prod(batch_shape)]
            w = jnp.repeat(w, int(np.prod(self.batch_shape)))
            return w
        if not self.common_operator:
            # leading operator dim: [L, B]
            return jnp.broadcast_to(w, (int(np.prod(self.batch_shape)), w.shape[0]))
        return w

    def _update(self, latents, outputs, source: bool):
        flat = self._flatten(latents)
        weights = self._class_weights(flat.shape[0], outputs)
        kw = dict(sample_weights=weights) if weights is not None else {}
        side = "source" if source else "target"
        if (self.store_source if source else self.store_target):
            self._stored[side].append(flat)
        self.state = self._jit_update(
            self.state,
            source_samples=flat if source else None,
            target_samples=None if source else flat,
            key=self._next_key(), **kw,
        )

    def _encode(self, model, samples, kwargs):
        variables = model.variables
        return model.encode_fn(variables, samples, self._next_key(), **kwargs)

    def _decode(self, model, latents, kwargs):
        return model.decode_fn(model.variables, latents, **kwargs)

    def transport(self, latents: jax.Array, key=None) -> jax.Array:
        """permute-flatten → operator → unflatten
        (reference: transport_callback.py:622-625).

        ``key`` makes stochastic operators reproducible per call: identical
        requests with the same key give identical outputs and the callback's
        internal RNG is left untouched (serving endpoints pass a request
        key; training-time calls use the internal stream as before).
        """
        flat = self._flatten(latents)
        moved = self._jit_transport(
            self.state, flat, self._next_key() if key is None else key
        )
        return self._unflatten(moved)

    # ------------------------------------------------------- state persistence

    def save_state(self, path: str) -> None:
        """Persist the (fitted) operator state pytree to an ``.npz`` file.

        The reference's operator buffers live on an ``nn.Module`` owned by
        the callback, which Lightning does NOT checkpoint (the callback
        implements no ``state_dict``) — a fitted operator dies with the
        training process there. Here the state is an explicit pytree, so it
        can be saved after ``compute()`` and re-loaded in a serving process
        (:meth:`ot_vae_tpu.serving.InferenceEngine.restore`) without
        re-fitting.
        """
        if self.state is None:
            raise ValueError("no operator state to save — call init/fit first")
        leaves, treedef = jax.tree_util.tree_flatten(self.state)
        np.savez(
            path,
            __treedef__=np.asarray(str(treedef)),
            **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
        )

    def load_state(self, path: str) -> "LatentTransport":
        """Load an operator state saved by :meth:`save_state` into ``self``.

        The structure comes from a freshly-initialized state of THIS
        callback's operator (only leaf values are read from disk), so a file
        saved under a different operator configuration fails loudly instead
        of deserializing into the wrong shapes.
        """
        data = np.load(path if str(path).endswith(".npz") else f"{path}.npz")
        template = self.operator.init(jax.random.PRNGKey(0))
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        saved_def = str(data["__treedef__"])
        if saved_def != str(treedef):
            raise ValueError(
                f"saved operator state structure does not match this "
                f"callback's operator:\n  saved: {saved_def}\n  "
                f"expected: {treedef}"
            )
        leaves = []
        for i, t_leaf in enumerate(t_leaves):
            leaf = data[f"leaf_{i}"]
            if np.shape(leaf) != np.shape(t_leaf):
                raise ValueError(
                    f"saved leaf {i} has shape {np.shape(leaf)}, operator "
                    f"expects {np.shape(t_leaf)}"
                )
            # Cast to the template dtype: a state saved under a different
            # precision config (x64 session) would otherwise load float64
            # leaves that silently promote the f32 pipeline and break
            # lax.cond branch dtype matching downstream.
            leaves.append(jnp.asarray(leaf, dtype=jnp.asarray(t_leaf).dtype))
        self.state = jax.tree_util.tree_unflatten(treedef, leaves)
        return self

    # ------------------------------------------------------------ hooks

    def on_fit_start(self, trainer, model):
        if model.test_metrics is not None:
            self.test_metrics = model.test_metrics.clone(self.logging_prefix_full)
        self.state = self.operator.init(self._next_key())

    def on_train_batch_end(self, trainer, model, outputs, batch, batch_idx):
        """(reference: transport_callback.py:511-553)"""
        if not (self.target_latents_from_train or self.source_latents_from_train):
            return
        if self.target_latents_from_train and (
            not self.unpaired or not self.source_latents_from_train or batch_idx % 2 == 0
        ):
            if "latents" in outputs:
                latents = outputs["latents"]
            else:
                latents = self._encode(model, outputs["samples"], outputs.get("kwargs", {}))
            self._update(jax.lax.stop_gradient(latents), outputs, source=False)
        if self.source_latents_from_train and (
            not self.unpaired or not self.target_latents_from_train or batch_idx % 2 == 1
        ):
            degraded = self.transformations(outputs["samples"], self._next_key())
            latents = self._encode(model, degraded, outputs.get("kwargs", {}))
            self._update(latents, outputs, source=True)

    def on_validation_epoch_start(self, trainer, model):
        """(reference: transport_callback.py:604-605)"""
        if self.state is None:
            self.state = self.operator.init(self._next_key())
        self.state = self.operator.reset(self.state, self._next_key())
        self._stored = {"source": [], "target": []}

    def on_validation_batch_end(self, trainer, model, outputs, batch, batch_idx):
        """Even batches → target, odd → source (unpaired)
        (reference: transport_callback.py:555-574)."""
        if not self.target_latents_from_train and (
            not self.unpaired or self.source_latents_from_train or batch_idx % 2 == 0
        ):
            latents = outputs.get("latents")
            if latents is None:
                latents = self._encode(model, outputs["samples"], outputs.get("kwargs", {}))
            self._update(latents, outputs, source=False)
        if not self.source_latents_from_train and (
            not self.unpaired or self.target_latents_from_train or batch_idx % 2 == 1
        ):
            degraded = self.transformations(outputs["samples"], self._next_key())
            latents = self._encode(model, degraded, outputs.get("kwargs", {}))
            self._update(latents, outputs, source=True)

    @staticmethod
    def _gather_processes(x):
        """All-gather host-buffered samples across processes along the batch
        (-2) axis, so multi-host fits see the global sample set (reference
        rank gather: ot/transport/base.py:134-149). No-op single-process; in
        single-process GSPMD the buffers already hold global arrays."""
        if x is None or jax.process_count() == 1:
            return x
        from jax.experimental import multihost_utils

        g = multihost_utils.process_allgather(x)  # [P, ..., B, D]
        g = jnp.moveaxis(g, 0, -3)  # [..., P, B, D]
        return g.reshape(*g.shape[:-3], -1, g.shape[-1])

    def on_validation_epoch_end(self, trainer, model):
        """Fit the operator, log cost, collage
        (reference: transport_callback.py:594-602)."""
        stored_src = self._gather_processes(
            jnp.concatenate(self._stored["source"], axis=-2)
            if self._stored["source"] else None
        )
        stored_tgt = self._gather_processes(
            jnp.concatenate(self._stored["target"], axis=-2)
            if self._stored["target"] else None
        )
        self.state, cost = self.operator.compute(
            self.state, stored_src, stored_tgt, key=self._next_key()
        )
        self._last_cost = float(jnp.mean(cost))
        trainer.logged_metrics[self.logging_prefix_full + "avg_transport_cost"] = self._last_cost
        trainer.logger.log_metrics(
            {self.logging_prefix_full + "avg_transport_cost": self._last_cost},
            trainer.global_step,
        )
        self._log_images(trainer, model)

    def on_test_epoch_start(self, trainer, model):
        if self.test_metrics is not None:
            self._test_metric_states = self.test_metrics.init()

    def on_test_batch_end(self, trainer, model, outputs, batch, batch_idx):
        """Transport degraded latents, score restored images
        (reference: transport_callback.py:576-592)."""
        if self._test_metric_states is None or self.state is None:
            return
        samples = outputs["samples"]
        kwargs = outputs.get("kwargs", {})
        degraded = self.transformations(samples, self._next_key())
        latents = self._encode(model, degraded, kwargs)
        restored = self._decode(model, self.transport(latents), kwargs)
        self._test_metric_states = self.test_metrics.update(
            self._test_metric_states, preds=restored, target=samples
        )

    def on_test_epoch_end(self, trainer, model):
        if self._test_metric_states is None:
            return
        results = {
            k: float(v)
            for k, v in self.test_metrics.compute(self._test_metric_states).items()
        }
        trainer.logged_metrics.update(results)
        trainer.logger.log_metrics(results, trainer.global_step)

    def compute_test_metrics(self):
        if self._test_metric_states is None:
            return {}
        return {
            k: float(v)
            for k, v in self.test_metrics.compute(self._test_metric_states).items()
        }

    # ------------------------------------------------------------ collage

    def sample(self, batch_size: int, from_dist: str = "source"):
        """Decode-ready latents drawn from the fitted source/target models
        (reference: transport_callback.py:627-635)."""
        n = batch_size * int(np.prod(self.batch_shape)) if (
            self.common_operator and len(self.batch_shape) > 0
        ) else batch_size
        draws = self.operator.sample(
            self.state, self._next_key(), n, source=(from_dist == "source")
        )
        return self._unflatten(draws)

    def _log_images(self, trainer, model):
        """6-panel collage (reference: transport_callback.py:637-653)."""
        if self.num_samples_to_log <= 0 or jax.process_index() != 0:
            return
        batch = trainer.first_val_batch
        if batch is None:
            return
        try:
            pbatch = model.batch_preprocess(
                jax.tree_util.tree_map(jnp.asarray, batch), train=False
            )
            samples, kwargs = pbatch["samples"], pbatch["kwargs"]
            transformed = self.transformations(samples, self._next_key())
            latents = self._encode(model, transformed, kwargs)
            transformed_decoded = self._decode(model, latents, kwargs)
            transported = self._decode(model, self.transport(latents), kwargs)
            src = self._decode(model, self.sample(samples.shape[0], "source"), kwargs)
            tgt = self._decode(model, self.sample(samples.shape[0], "target"), kwargs)
            img_list = [src, transformed, transformed_decoded, transported, samples, tgt]
            grid = list_to_collage(
                [np.asarray(i) for i in img_list],
                min(samples.shape[0], self.num_samples_to_log),
            )
            self._save(trainer, grid)
        except Exception as e:  # collage must never kill training
            trainer.print(f"transport collage failed: {e}")

    def _save(self, trainer, grid):
        import os
        from pathlib import Path

        if hasattr(trainer.logger, "log_image"):
            trainer.logger.log_image(self.logging_prefix_full, grid, trainer.global_step)
            return
        out = Path("collages")
        os.makedirs(out, exist_ok=True)
        arr = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        try:
            from PIL import Image

            name = self.logging_prefix_full.replace("/", "_")
            Image.fromarray(arr).save(out / f"{name}epoch{trainer.current_epoch}.png")
        except Exception:
            pass


class ConditionalLatentTransport(Callback):
    """One LatentTransport per class (reference: transport_callback.py:726-791)."""

    def __init__(self, num_classes: int, num_samples_to_log: int = 10, **kwargs):
        self.num_classes = num_classes
        self.transports = [
            LatentTransport(
                class_idx=i,
                num_samples_to_log=max(1, num_samples_to_log // num_classes),
                **kwargs,
            )
            for i in range(num_classes)
        ]

    # explicit fan-out: the Callback base class defines no-op hooks, so a
    # __getattr__-based fan-out would never fire
    def on_fit_start(self, trainer, model):
        for t in self.transports:
            t.on_fit_start(trainer, model)

    def on_train_batch_end(self, trainer, model, outputs, batch, batch_idx):
        for t in self.transports:
            t.on_train_batch_end(trainer, model, outputs, batch, batch_idx)

    def on_validation_epoch_start(self, trainer, model):
        for t in self.transports:
            t.on_validation_epoch_start(trainer, model)

    def on_validation_batch_end(self, trainer, model, outputs, batch, batch_idx):
        for t in self.transports:
            t.on_validation_batch_end(trainer, model, outputs, batch, batch_idx)

    def on_test_epoch_start(self, trainer, model):
        for t in self.transports:
            t.on_test_epoch_start(trainer, model)

    def on_test_batch_end(self, trainer, model, outputs, batch, batch_idx):
        for t in self.transports:
            t.on_test_batch_end(trainer, model, outputs, batch, batch_idx)

    def on_test_epoch_end(self, trainer, model):
        for t in self.transports:
            t.on_test_epoch_end(trainer, model)

    def on_validation_epoch_end(self, trainer, model):
        costs = []
        for t in self.transports:
            t.on_validation_epoch_end(trainer, model)
            costs.append(t._last_cost)
        avg = float(np.mean([c for c in costs if c is not None]))
        trainer.logged_metrics["transport/conditional/avg_transport_cost"] = avg

    # ------------------------------------------------------- state persistence

    def save_state(self, path: str) -> None:
        """Persist every per-class operator state: ``<path>.class<i>.npz``
        (see :meth:`LatentTransport.save_state`). Validated upfront,
        best-effort rename: every per-class state is checked as fitted BEFORE
        any file is written and all payloads are fully written to temporary
        names before the first rename, so write errors (disk full, mid-write
        crash) never leave a partial final file set. The rename loop itself
        is per-file (``os.replace``) — a failure there (permissions ripped
        away mid-loop) can leave a mix of old and new final files, which is
        the strongest guarantee multiple separate files allow."""
        import os

        unfitted = [i for i, t in enumerate(self.transports) if t.state is None]
        if unfitted:
            raise ValueError(
                f"per-class operator state missing for classes {unfitted} — "
                "call init/fit first"
            )
        tmp_paths = []
        try:
            for i, t in enumerate(self.transports):
                tmp = f"{path}.class{i}.npz.tmp"
                # record the tmp name BEFORE writing so a mid-write np.savez
                # failure still gets its orphan cleaned up in the finally
                # (np.savez appends .npz when missing — tmp already ends .tmp)
                tmp_paths.append((f"{tmp}.npz", f"{path}.class{i}.npz"))
                t.save_state(tmp)
            for tmp, final in tmp_paths:
                os.replace(tmp, final)
        finally:
            for tmp, _ in tmp_paths:
                if os.path.exists(tmp):
                    os.remove(tmp)

    def load_state(self, path: str) -> "ConditionalLatentTransport":
        """Load states saved by :meth:`save_state` into the per-class
        callbacks; the class count must match (missing files fail loudly)."""
        for i, t in enumerate(self.transports):
            t.load_state(f"{path}.class{i}.npz")
        return self
