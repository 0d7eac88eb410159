"""Train state: params + batch stats + adaptive loss log-vars + optimizer.

Reproduces the reference's optimisation setup (train.py:170-179):

* torch ``Adam(lr, weight_decay=1e-4)`` over model params — torch's
  ``weight_decay`` is L2 added to the gradient *before* the Adam moments
  (not AdamW's decoupled decay), so the optax chain is
  ``add_decayed_weights -> scale_by_adam -> scale(-lr)``.
* a separate ``lossweight`` param group holding the three ``log_var``
  scalars — realised as an optax ``multi_transform`` partition over a
  combined ``{"model": ..., "log_vars": ...}`` pytree. The reference
  *looks* like it pins this group at a fixed lr with no decay, but its
  actual torch behaviour (verified by executing the optimizer path) is:
  ``adjust_learning_rate``'s skip condition ``'lossweight' in param_group``
  tests dict KEYS and never fires, so the group's lr IS overwritten by the
  epoch schedule; and ``add_param_group`` inherits ``weight_decay=1e-4``
  from the Adam defaults. Both groups therefore train identically in the
  reference, and this state reproduces that: the scheduled lr is written to
  BOTH groups each step and log_vars carry the same coupled L2.

The per-epoch LR is fed as a scalar through ``optax.inject_hyperparams`` so
the jitted step never recompiles on LR changes.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


def torch_adam(
    learning_rate, weight_decay: float = 0.0,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch.optim.Adam semantics (coupled L2 weight decay)."""

    def make(lr):
        steps = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
        steps += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps), optax.scale(-lr)]
        return optax.chain(*steps)

    # inject_hyperparams handles schedules and constants uniformly
    return optax.inject_hyperparams(lambda lr: make(lr))(lr=learning_rate)


class TrainState(flax.struct.PyTreeNode):
    """Immutable train state; one pytree, shardable as a unit."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    log_vars: jnp.ndarray  # (n_tasks,) adaptive loss log-variances
    opt_state: optax.OptState
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, n_log_vars: int = 3, lr: float = 1e-3,
               weight_decay: float = 1e-4, log_var_lr: float = 1e-3,
               log_vars: Optional[jnp.ndarray] = None):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        lv = (jnp.zeros((n_log_vars,), jnp.float32)
              if log_vars is None else jnp.asarray(log_vars, jnp.float32))
        tx = optax.multi_transform(
            {
                "model": torch_adam(lr, weight_decay),
                # lossweight group (train.py:178-179): starts at
                # log_var_lr but — like the reference's group, whose
                # schedule exemption never fires and which inherits
                # weight_decay from the Adam defaults — it follows the
                # epoch schedule and carries the same coupled L2
                "log_vars": torch_adam(log_var_lr, weight_decay),
            },
            param_labels={"model": "model", "log_vars": "log_vars"},
        )
        opt_state = tx.init({"model": params, "log_vars": lv})
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, log_vars=lv,
                   opt_state=opt_state, tx=tx)

    def apply_gradients(self, grads_model, grads_log_vars, lr: jnp.ndarray):
        """One optimiser step; ``lr`` is the current epoch's model LR."""
        opt_state = set_learning_rate(self.opt_state, lr)
        grads = {"model": grads_model, "log_vars": grads_log_vars}
        params = {"model": self.params, "log_vars": self.log_vars}
        updates, new_opt = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params["model"],
            log_vars=new_params["log_vars"],
            opt_state=new_opt,
        )


def set_learning_rate(opt_state, lr):
    """Overwrite the injected LR hyperparameter of BOTH groups (the
    reference's adjust_learning_rate writes every param group —
    train.py:77-80; its lossweight skip condition never fires)."""

    def set_group(s, name):
        inner = s.inner_states[name].inner_state
        inner = inner._replace(hyperparams={
            **inner.hyperparams, "lr": jnp.asarray(lr, jnp.float32)})
        masked = s.inner_states[name]._replace(inner_state=inner)
        return s._replace(inner_states={**s.inner_states, name: masked})

    return set_group(set_group(opt_state, "model"), "log_vars")
