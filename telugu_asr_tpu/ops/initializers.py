"""Weight initializers matching the Keras defaults the reference relies on.

The reference configures ``glorot_uniform`` kernels / ``zeros`` biases
(config/model.yaml:52-56); Keras ``Embedding`` defaults to
``uniform(-0.05, 0.05)``.  Distribution-level parity is what matters (exact
draws differ — different PRNG), so these mirror fan-in/fan-out math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["glorot_uniform", "zeros", "embedding_uniform", "get_initializer"]


def glorot_uniform(key: jax.Array, shape, fan_in: int = None, fan_out: int = None, dtype=jnp.float32):
    if fan_in is None or fan_out is None:
        # Keras convention: last two dims are (fan_in, fan_out); leading dims
        # are receptive field multiplying both.
        receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        fan_in = shape[-2] * receptive if len(shape) >= 2 else shape[-1]
        fan_out = shape[-1] * receptive
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def zeros(key: jax.Array, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def embedding_uniform(key: jax.Array, shape, dtype=jnp.float32, scale: float = 0.05):
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def get_initializer(spec):
    """Resolve a Keras-style initializer spec (dict/class_name or string)."""
    if spec is None:
        return glorot_uniform
    if isinstance(spec, dict):
        name = spec.get("class_name", "glorot_uniform")
    else:
        name = str(spec)
    name = name.lower()
    if name in ("glorot_uniform", "glorotuniform"):
        return glorot_uniform
    if name == "zeros":
        return zeros
    raise ValueError(f"unsupported initializer: {spec}")
