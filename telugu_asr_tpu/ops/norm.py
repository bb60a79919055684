"""Normalization layers as pure functions.

LayerNorm keeps the Keras default ``epsilon=1e-3`` (the reference never
overrides it — src/models/layers/attention.py:562, mlp.py:29), which differs
from the common 1e-5/1e-6; reproducing it matters for weight-conversion
parity.  BatchNorm (Conformer conv module) is provided in inference form plus
batch-statistics training form with explicit running-state threading.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "layer_norm_init",
    "layer_norm",
    "batch_norm_init",
    "batch_norm",
]

KERAS_LN_EPSILON = 1e-3
KERAS_BN_EPSILON = 1e-3
KERAS_BN_MOMENTUM = 0.99


def layer_norm_init(dim: int) -> dict:
    return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}


def layer_norm(params: dict, x: jnp.ndarray, epsilon: float = KERAS_LN_EPSILON) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + epsilon)
    out = normed * params["gamma"] + params["beta"]
    return out.astype(dtype)


def batch_norm_init(dim: int) -> Tuple[dict, dict]:
    """Returns (trainable params, running state)."""
    params = {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}
    return params, state


def batch_norm(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    training: bool = False,
    mask: jnp.ndarray | None = None,
    momentum: float = KERAS_BN_MOMENTUM,
    epsilon: float = KERAS_BN_EPSILON,
) -> Tuple[jnp.ndarray, dict]:
    """BatchNorm over all axes but the last; returns (out, new_state).

    ``mask`` (``[B, T]`` bool) restricts statistics to valid frames.
    """
    if training:
        x32 = x.astype(jnp.float32)
        if mask is not None:
            m = mask[..., None].astype(jnp.float32)
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x32 * m, axis=tuple(range(x.ndim - 1))) / count
            var = jnp.sum(m * (x32 - mean) ** 2, axis=tuple(range(x.ndim - 1))) / count
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
        new_state = {
            "mean": momentum * state["mean"] + (1.0 - momentum) * mean,
            "var": momentum * state["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    out = (x - mean) * jax.lax.rsqrt(var + epsilon) * params["gamma"] + params["beta"]
    return out.astype(x.dtype), new_state
