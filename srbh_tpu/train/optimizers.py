"""Extra optimizers: poly-warmup AdamW (utils/optimizer.py:3-34 twin).

The reference mutates optimizer LRs imperatively per step; the optax
equivalent is a schedule: linear warm-up from ``warmup_ratio`` to 1 over
``warmup_iter`` steps, then polynomial decay ``(1 - t/max_iter)^power``.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def poly_warmup_schedule(base_lr: float, warmup_iter: int, max_iter: int,
                         warmup_ratio: float = 1e-6, power: float = 1.0):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = 1.0 - (1.0 - step / warmup_iter) * (1.0 - warmup_ratio)
        poly = jnp.power(jnp.clip(1.0 - step / max_iter, 0.0), power)
        return base_lr * jnp.where(step < warmup_iter, warm, poly)

    return schedule


def poly_warmup_adamw(base_lr: float, weight_decay: float,
                      betas=(0.9, 0.999), warmup_iter: int = 1500,
                      max_iter: int = 80000, warmup_ratio: float = 1e-6,
                      power: float = 1.0) -> optax.GradientTransformation:
    return optax.adamw(
        poly_warmup_schedule(base_lr, warmup_iter, max_iter, warmup_ratio,
                             power),
        b1=betas[0], b2=betas[1], eps=1e-8, weight_decay=weight_decay)
