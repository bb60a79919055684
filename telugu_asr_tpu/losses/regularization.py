"""L2 weight regularization as an explicit loss term.

The reference attaches Keras ``l2`` regularizers to every kernel, bias and
LayerNorm gamma/beta (model.yaml:44-51 wires the same coefficient into
kernel_regularizer and bias_regularizer; MHSAModule passes them to LN too,
attention.py:562-566).  Keras adds ``l2 * sum(w^2)`` per weight to the loss.
The text embedding and RoPE inv_freq carry NO regularizer
(moonshine/model.py:54-58).  We reproduce that as one traversal with an
exclusion predicate.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["l2_regularization"]

_EXCLUDED_PATH_KEYS = ("text_embedding", "rope_inv_freq")


def _default_exclude(path: str) -> bool:
    return any(k in path for k in _EXCLUDED_PATH_KEYS)


def l2_regularization(
    params,
    l2: float,
    exclude: Optional[Callable[[str], bool]] = None,
) -> jnp.ndarray:
    """``l2 * sum over included leaves of sum(w^2)``."""
    if l2 == 0.0:
        return jnp.asarray(0.0, jnp.float32)
    exclude = exclude or _default_exclude
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = jnp.asarray(0.0, jnp.float32)
    for path, leaf in leaves:
        path_str = jax.tree_util.keystr(path)
        if exclude(path_str):
            continue
        total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return l2 * total
