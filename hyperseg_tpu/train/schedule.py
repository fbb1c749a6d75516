"""Learning-rate schedules (optax-style: step -> lr scale factor or value)."""

from __future__ import annotations

import jax.numpy as jnp


def poly_lr(base_lr: float, max_steps: int, power: float = 0.9):
    """lr(step) = base_lr * (1 - step/max_steps)^power — utils/polylr.py:4-22.
    All shipped configs step this per *batch* (batch_scheduler=True,
    train.py:135-136); pass the total batch count as max_steps."""

    def schedule(step):
        frac = 1.0 - jnp.asarray(step, jnp.float32) / float(max_steps)
        return base_lr * jnp.clip(frac, 0.0, 1.0) ** power

    return schedule


def constant_lr(base_lr: float):
    return lambda step: jnp.float32(base_lr)


SCHEDULES = {"poly": poly_lr, "constant": constant_lr}
