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
    # Non-trainable model state (Conformer BatchNorm running stats); empty
    # dict for stateless families.
    model_state: Any = dataclasses.field(default_factory=dict)

    @classmethod
    def create(
        cls, params, optimizer: optax.GradientTransformation, model_state: Any = None
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            model_state=model_state if model_state is not None else {},
        )
