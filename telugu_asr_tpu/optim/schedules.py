"""Learning-rate schedules.

``transformer_schedule`` is the Noam schedule with min/max clamping from
src/optimizers/schedules.py:4-31:
``lr = scale * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)`` clamped to
``[min_lr, max_lr]``.  (In the shipped config min_lr == max_lr, making the
effective LR constant — we reproduce the formula faithfully either way.)
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

__all__ = ["transformer_schedule", "TransformerLearningRateSchedule"]


def transformer_schedule(
    d_model: int,
    scale: float = 1.0,
    warmup_steps: int = 4000,
    max_lr: Optional[float] = None,
    min_lr: Optional[float] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    d_model_f = float(d_model)
    warmup_f = float(warmup_steps)
    # The reference eval()s string lr values (schedules.py:10-11) to allow
    # YAML expressions; we accept plain floats or numeric strings.
    max_lr = float(max_lr) if max_lr is not None else None
    min_lr = float(min_lr) if min_lr is not None else None

    def schedule(step) -> jnp.ndarray:
        step_f = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        lr = (d_model_f ** -0.5) * jnp.minimum(step_f ** -0.5, step_f * (warmup_f ** -1.5))
        lr = scale * lr
        if max_lr is not None:
            lr = jnp.minimum(lr, max_lr)
        if min_lr is not None:
            lr = jnp.maximum(lr, min_lr)
        return lr

    return schedule


class TransformerLearningRateSchedule:
    """Object form for config-registry resolution (model.yaml:99-104)."""

    def __init__(self, d_model, scale=1.0, warmup_steps=4000, max_lr=None, min_lr=None):
        self.config = dict(
            d_model=d_model, scale=scale, warmup_steps=warmup_steps, max_lr=max_lr, min_lr=min_lr
        )
        self._fn = transformer_schedule(d_model, scale, warmup_steps, max_lr, min_lr)

    def __call__(self, step):
        return self._fn(step)

    def get_config(self):
        return dict(self.config)
