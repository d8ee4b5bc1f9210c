"""Trainer framework: loop, state, callbacks, checkpointing
(replaces the pytorch-lightning runtime the reference delegates to)."""
from ot_vae_tpu.trainer.callbacks import (
    Callback,
    Collage,
    EarlyStopping,
    ModelCheckpointCallback,
    list_to_collage,
)
from ot_vae_tpu.trainer.checkpoint import (
    PartialCheckpoint,
    apply_partial_checkpoints,
    human_format,
    load_checkpoint,
    save_checkpoint,
)
from ot_vae_tpu.trainer.loggers import (
    CSVLogger,
    MultiLogger,
    PrintLogger,
    TensorBoardLogger,
    WandbLogger,
)
from ot_vae_tpu.trainer.state import TrainState
from ot_vae_tpu.trainer.trainer import Trainer

__all__ = [
    "Trainer",
    "TrainState",
    "PrintLogger",
    "CSVLogger",
    "WandbLogger",
    "TensorBoardLogger",
    "MultiLogger",
    "Callback",
    "EarlyStopping",
    "ModelCheckpointCallback",
    "Collage",
    "list_to_collage",
    "save_checkpoint",
    "load_checkpoint",
    "PartialCheckpoint",
    "apply_partial_checkpoints",
    "human_format",
]
