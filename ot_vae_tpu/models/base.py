"""Model framework base (reference: ot_vae_lightning/model/base.py:36-292).

``VisionModel`` is the Lightning-`VisionModule` equivalent: it owns a flax
network, metric collections, the monitored quantity, EMA decay, inference
transforms, and partial-checkpoint specs — and exposes the pure functions the
trainer jits (``loss_fn``, ``eval_forward``). Unlike Lightning there is no
inheritance-based training loop: state is explicit
(:class:`~ot_vae_tpu.trainer.state.TrainState`) and every step function is
pure.

Static conditioning routing: the reference inspects signatures at call time
through ``FilterKwargs`` (utils/__init__.py:78-109) — incompatible with
tracing. Here the accepted kwargs of each submodule are resolved once at
construction (``accepted_call_args``) and calls are specialized statically.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional, Set

import jax

from ot_vae_tpu.data.transforms import Identity, Transform
from ot_vae_tpu.metrics import MetricCollection

__all__ = ["VisionModel", "accepted_call_args", "filter_kwargs"]


def accepted_call_args(module) -> Set[str]:
    """Kwargs a flax module's ``__call__`` accepts — resolved statically
    (the trace-safe replacement for the reference's FilterKwargs)."""
    try:
        sig = inspect.signature(type(module).__call__)
    except (TypeError, ValueError):
        return set()
    return {p for p in sig.parameters if p != "self"}


def filter_kwargs(module, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    allowed = accepted_call_args(module)
    return {k: v for k, v in kwargs.items() if k in allowed}


class VisionModel:
    """Base training-logic unit.

    Subclasses define:
      * ``net`` — the flax module
      * ``batch_preprocess(batch, key, train) -> pbatch`` (jit-safe)
      * ``loss_fn(variables, pbatch, step, rngs) -> (loss, (logs, outputs, mutated))``
      * ``eval_forward(variables, pbatch, key) -> preds``
      * ``sample_fn(variables, key, batch_size, kwargs) -> images``
    """

    net = None
    monitor: str = "psnr"
    mode: str = "max"
    learning_rate: float = 1e-3
    ema_decay: Optional[float] = None
    metrics: Optional[MetricCollection] = None
    checkpoints: Optional[Dict[str, Any]] = None  # attr -> PartialCheckpoint
    # Lightning Trainer(gradient_clip_val=...) parity — the reference's own
    # DDP recipe sets 1.0 (configs/ddp.yaml:4). None disables. Clips by
    # global 2-norm before Adam (Lightning's default algorithm="norm").
    gradient_clip_val: Optional[float] = None

    def __init__(self):
        self.inference_preprocess: Transform = Identity()
        self.inference_postprocess: Transform = Identity()
        self._inference = False
        self.variables = None  # populated by Trainer.fit / checkpoint load
        # cloned metric collections (reference: model/base.py:90-93)
        if self.metrics is not None:
            self.val_metrics = self.metrics.clone("val/metrics/")
            self.test_metrics = self.metrics.clone("test/metrics/")
        else:
            self.val_metrics = self.test_metrics = None

    # ------------------------------------------------------------ inference flag

    @property
    def inference(self) -> bool:
        return self._inference

    @inference.setter
    def inference(self, on: bool):
        if on:
            assert self.inference_preprocess is not None
            assert self.inference_postprocess is not None
        self._inference = on

    def maybe_preprocess(self, x):
        """Apply inference preprocess when in inference mode
        (reference ``@preprocess`` decorator: model/base.py:258-272)."""
        return self.inference_preprocess(x) if self._inference else x

    def maybe_postprocess(self, x):
        return self.inference_postprocess(x) if self._inference else x

    # ------------------------------------------------------------ contracts

    def batch_preprocess(self, batch, key=None, train: bool = True):
        raise NotImplementedError

    def loss_fn(self, variables, pbatch, step, rngs):
        raise NotImplementedError

    def eval_forward(self, variables, pbatch, key):
        raise NotImplementedError

    def init_variables(self, key, sample_batch):
        raise NotImplementedError

    def optimizer(self):
        import optax

        # reference: Adam(1e-3, (0.9, 0.999)) + ReduceLROnPlateau
        # (model/vae.py:148-156); the plateau scale is injected by the trainer.
        base = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.learning_rate, b1=0.9, b2=0.999
        )
        if self.gradient_clip_val:
            base = optax.chain(
                optax.clip_by_global_norm(float(self.gradient_clip_val)), base
            )
        frozen = self.frozen_param_paths()
        if not frozen:
            return base
        # zero the updates of frozen subtrees so grafted weights stay
        # bit-identical through training (reference freeze support,
        # utils/partial_checkpoint.py:70-76 — requires_grad_(False))
        return optax.chain(
            base,
            optax.masked(optax.set_to_zero(), lambda p: self.frozen_mask(p)),
        )

    def frozen_param_paths(self) -> list:
        """'/': separated param paths to freeze — by default the subtrees of
        partial checkpoints declared with ``freeze=True``."""
        return [
            attr
            for attr, pc in (self.checkpoints or {}).items()
            if getattr(pc, "freeze", False)
        ]

    def frozen_mask(self, params):
        """Bool pytree matching ``params``: True where the leaf lies inside a
        frozen subtree (consumed by ``optax.masked``)."""
        from flax import traverse_util

        frozen = [tuple(p.split("/")) for p in self.frozen_param_paths()]
        flat = traverse_util.flatten_dict(params)
        mask = {
            k: any(tuple(k[: len(f)]) == f for f in frozen) for k in flat
        }
        return traverse_util.unflatten_dict(mask)

    def trainable_params(self, params):
        """The params subtree the optimizer updates — everything outside the
        frozen subtrees (reference freeze support,
        utils/partial_checkpoint.py:70-76)."""
        from flax import traverse_util

        flat = traverse_util.flatten_dict(params)
        frozen = [tuple(p.split("/")) for p in self.frozen_param_paths()]
        kept = {
            k: v
            for k, v in flat.items()
            if not any(tuple(k[: len(f)]) == f for f in frozen)
        }
        return traverse_util.unflatten_dict(kept)

    def setup(self):
        """Apply partial checkpoints (reference: model/base.py:192-195)."""
        if self.checkpoints and self.variables is not None:
            from ot_vae_tpu.trainer.checkpoint import apply_partial_checkpoints

            self.variables = apply_partial_checkpoints(self.variables, self.checkpoints)
