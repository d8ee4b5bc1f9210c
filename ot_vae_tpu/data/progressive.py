"""Progressive (curriculum) data transforms
(reference: ot_vae_lightning/data/progressive_callback.py:30-118).

``PgTransform`` indexes a sequence of transform parameters by epoch;
``ProgressiveTransform`` (a trainer callback) rebinds the model's
``progressive_transform`` at every train-epoch start. The trainer detects the
change through ``model._transform_version`` and rebuilds the jitted train
step (the transform parameters are static Python values — one recompile per
schedule step, matching the reference's per-epoch transform rebind).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

from ot_vae_tpu.trainer.callbacks import Callback

__all__ = ["PgTransform", "PgCompose", "ProgressiveTransform"]


@dataclasses.dataclass
class PgTransform:
    """Builds ``transform_cls(*args_schedule[epoch])`` — epochs past the end
    of the schedule reuse the last entry (reference: progressive_callback.py:30-46)."""

    transform_cls: Callable
    args_schedule: Sequence[Any]

    def at_epoch(self, epoch: int):
        args = self.args_schedule[min(epoch, len(self.args_schedule) - 1)]
        if not isinstance(args, (tuple, list)):
            args = (args,)
        return self.transform_cls(*args)


@dataclasses.dataclass
class PgCompose:
    """Compose several PgTransforms (reference: progressive_callback.py:49-56)."""

    transforms: Sequence[PgTransform]

    def at_epoch(self, epoch: int):
        from ot_vae_tpu.data.transforms import Compose

        return Compose([t.at_epoch(epoch) for t in self.transforms])


@dataclasses.dataclass
class ProgressiveTransform(Callback):
    """Rebinds the model's batch-preprocess transform each epoch
    (reference: progressive_callback.py:82-97)."""

    schedule: Any  # PgTransform | PgCompose

    def on_train_epoch_start(self, trainer, model):
        model.progressive_transform = self.schedule.at_epoch(trainer.current_epoch)
        model._transform_version = getattr(model, "_transform_version", 0) + 1
