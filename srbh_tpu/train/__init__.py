"""Training subsystem: states, steps, schedules, checkpoints, drivers."""
from srbh_tpu.train.checkpoint import (
    load_checkpoint,
    restore_into_state,
    save_checkpoint,
)
from srbh_tpu.train.config import TrainConfig, get_args
from srbh_tpu.train.schedule import step_decay_lr
from srbh_tpu.train.state import TrainState, torch_adam
from srbh_tpu.train.steps import make_eval_step, make_predict_step, make_train_step

__all__ = [
    "load_checkpoint", "restore_into_state", "save_checkpoint",
    "TrainConfig", "get_args", "step_decay_lr", "TrainState", "torch_adam",
    "make_eval_step", "make_predict_step", "make_train_step",
]
