"""Training state: one pytree holding params + optimizer state + step.

Replaces the reference's Keras-object state (model variables + optimizer
slots + BackupAndRestore files, SURVEY §5) with a single functional pytree
that checkpoints atomically through Orbax and shards trivially.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
        )
