"""Training: losses, train state/steps, checkpointing, trainer loop."""
from .losses import (
    PerceptualLoss,
    l1_spectrogram_loss,
    multi_resolution_stft_loss,
    source_separation_loss,
)
from .train_state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_sharded_eval_step,
    make_sharded_train_step,
    make_train_step,
)
from .checkpointing import CheckpointManager, restore_variables

__all__ = [
    "PerceptualLoss",
    "l1_spectrogram_loss",
    "multi_resolution_stft_loss",
    "source_separation_loss",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_sharded_train_step",
    "make_sharded_eval_step",
    "make_optimizer",
    "CheckpointManager",
    "restore_variables",
]
