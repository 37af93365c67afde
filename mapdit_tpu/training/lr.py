"""Learning-rate schedule: linear warmup -> flat -> inverse-sqrt decay.

Parity with reference `train.py:179-197` (`create_lr_lambda`): the multiplier
at optimizer step k is
    (k+1)/warmup          if k+1 < warmup
    1/sqrt(max(k/start_decay, 1))   if k >= start_decay
    1.0                   otherwise
Defaults derive from num_steps: warmup = steps//150, start_decay = steps//10
(`train.py:59-66`).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_flat_invsqrt(base_lr: float, num_lin_warmup: int, start_decay: int):
    """optax-style schedule fn: step (int array/scalar) -> lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (step + 1.0) / max(num_lin_warmup, 1)
        decay = 1.0 / jnp.sqrt(jnp.maximum(step / max(start_decay, 1), 1.0))
        mult = jnp.where(
            step + 1 < num_lin_warmup, warm, jnp.where(step >= start_decay, decay, 1.0)
        )
        return base_lr * mult

    return schedule


def default_schedule_steps(num_steps: int, num_lin_warmup=None, start_decay=None):
    """Fill reference defaults (`train.py:59-66`)."""
    if num_lin_warmup is None:
        num_lin_warmup = num_steps // 150
    if start_decay is None:
        start_decay = num_steps // 10
    return num_lin_warmup, start_decay
