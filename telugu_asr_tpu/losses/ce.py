"""Masked cross-entropy loss for the seq2seq family.

Mirrors src/losses/ce_loss.py:4-47: sparse CE with ``ignore_class = PAD``,
summed per example, then averaged over the GLOBAL batch size (the
``tf.nn.compute_average_loss`` DP-correct scaling — under data parallelism
each shard divides by the global batch, so the cross-replica ``psum`` of
per-shard losses equals the true global mean).

The reference computes CE on softmax PROBS (its classifier bakes softmax in);
we take logits and use log-softmax — the same function, numerically stabler.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["masked_cross_entropy"]


def masked_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    pad_id: int = 2,
    global_batch_size: Optional[int] = None,
) -> jnp.ndarray:
    """CE over ``[B, U, V]`` logits vs ``[B, U]`` int targets.

    Padding positions (``targets == pad_id``) contribute zero.  Returns the
    summed-per-example loss divided by ``global_batch_size`` (scalar), or the
    per-example loss vector ``[B]`` when ``global_batch_size`` is None —
    matching the reference's two call modes (ce_loss.py:31-38).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != pad_id).astype(jnp.float32)
    per_example = jnp.sum(nll * mask, axis=-1)
    if global_batch_size is None:
        return per_example
    return jnp.sum(per_example) / jnp.asarray(global_batch_size, jnp.float32)
