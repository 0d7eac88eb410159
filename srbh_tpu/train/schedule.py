"""Learning-rate schedules.

``step_decay_lr`` mirrors train.py:68-81: full LR through epoch 10, x0.1
through epoch 20, x0.01 after — applied per epoch to BOTH param groups.
The reference's lossweight-skip condition (``'lossweight' in param_group``
tests dict keys) never fires, so its log_var group follows the same
schedule — verified by executing the torch path; see
``srbh_tpu.train.state:set_learning_rate`` and the 3-step train oracle.
"""
from __future__ import annotations


def step_decay_lr(init_lr: float, epoch: int) -> float:
    """Epoch is 1-based, as in the reference loop (train.py:184)."""
    if epoch <= 10:
        return init_lr
    if epoch <= 20:
        return 0.1 * init_lr
    return 0.01 * init_lr
