"""Feed-forward modules and gated activations.

Mirrors src/models/layers/{mlp.py, activation.py}:

* ``FFNModule`` (mlp.py:9-60): Dense(d·fc_factor, act) → dropout → Dense(d) →
  residual → post-LayerNorm.  With ``swiglu`` the activation SPLITS the hidden
  width in half (activation.py:50-53), so dense2's input is d·fc_factor/2.
* ``ConformerFFModule`` (mlp.py:81-134): pre-LN → Dense(4d) → swish → dropout
  → Dense(d) → dropout → residual scaled by fc_factor (½).
* ``glu``/``swiglu`` are split-gate functions; ``gelu`` is the EXACT erf form
  (Keras default approximate=False).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from telugu_asr_tpu.ops.attention import dropout
from telugu_asr_tpu.ops.initializers import glorot_uniform
from telugu_asr_tpu.ops.norm import layer_norm, layer_norm_init

__all__ = [
    "glu",
    "swiglu",
    "get_activation",
    "dense_init",
    "ffn_module_init",
    "ffn_module_apply",
    "conformer_ff_init",
    "conformer_ff_apply",
]


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def swiglu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.silu(b)


_ACTIVATIONS: dict = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "glu": glu,
    "swiglu": swiglu,
    "linear": lambda x: x,
    None: lambda x: x,
}


def get_activation(name) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if callable(name):
        return name
    if name not in _ACTIVATIONS:
        raise ValueError(f"Activation {name} not supported; have {sorted(k for k in _ACTIVATIONS if k)}")
    return _ACTIVATIONS[name]


def halves_width(name) -> bool:
    return name in ("glu", "swiglu")


def dense_init(key: jax.Array, in_dim: int, out_dim: int, use_bias: bool = True) -> dict:
    p = {"kernel": glorot_uniform(key, (in_dim, out_dim))}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,))
    return p


def dense_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params["kernel"]
    if "bias" in params:
        y = y + params["bias"]
    return y


def ffn_module_init(
    key: jax.Array, input_dim: int, fc_factor: int = 1, activation: str = "gelu"
) -> dict:
    k1, k2 = jax.random.split(key)
    hidden = input_dim * fc_factor
    inner = hidden // 2 if halves_width(activation) else hidden
    return {
        "dense1": dense_init(k1, input_dim, hidden),
        "dense2": dense_init(k2, inner, input_dim),
        "ln": layer_norm_init(input_dim),
    }


def ffn_module_apply(
    params: dict,
    inputs: jnp.ndarray,
    activation: str = "gelu",
    *,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    act = get_activation(activation)
    out = act(dense_apply(params["dense1"], inputs))
    out = dropout(dropout_key, dropout_rate, out, deterministic)
    out = dense_apply(params["dense2"], out)
    return layer_norm(params["ln"], out + inputs)


def conformer_ff_init(key: jax.Array, input_dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "ln": layer_norm_init(input_dim),
        "ffn1": dense_init(k1, input_dim, 4 * input_dim),
        "ffn2": dense_init(k2, 4 * input_dim, input_dim),
    }


def conformer_ff_apply(
    params: dict,
    inputs: jnp.ndarray,
    fc_factor: float = 0.5,
    *,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    keys = (None, None) if dropout_key is None else jax.random.split(dropout_key)
    out = layer_norm(params["ln"], inputs)
    out = jax.nn.silu(dense_apply(params["ffn1"], out))
    out = dropout(keys[0], dropout_rate, out, deterministic)
    out = dense_apply(params["ffn2"], out)
    out = dropout(keys[1], dropout_rate, out, deterministic)
    return inputs + fc_factor * out
