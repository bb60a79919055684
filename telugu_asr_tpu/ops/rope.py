"""Rotary positional embedding, matching the reference's (unusual) layout.

Reference: src/models/layers/positional_encoding.py:10-93.
Key laws to reproduce exactly (they change the function computed):

* ``rot_dim = max(head_dim // 2, 32)`` (:31) — for the flagship head_dim=32
  this rotates ALL channels.
* ``inv_freq[i] = 1 / base^(2i / rot_dim)`` over ``i in [0, rot_dim/2)``
  (InvFreqInitializer :15-17 — note the denominator is *rot_dim*, because the
  initializer is constructed with ``head_dim=rot_dim`` at :40).
* Angles are interleaved pairwise: ``freq = reshape(stack([f, f], -1))``
  (:50-52) so channels (2i, 2i+1) share angle ``pos * inv_freq[i]``.
* ``rotate_half`` swaps interleaved pairs with sign: ``(x0,x1) -> (-x1,x0)``
  (:56-66).
* The FIRST ``rot_dim`` channels are rotated and the output is reassembled as
  ``concat([unrotated_tail, rotated_head])`` (:77-86) — i.e. the channel
  order CHANGES when rot_dim < head_dim.  We reproduce this faithfully.

Positions are explicit (``[T]`` or ``[B, T]``) so KV-cached decoding can feed
absolute offsets.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["rope_rot_dim", "rope_inv_freq", "apply_rope"]


def rope_rot_dim(head_dim: int) -> int:
    # Clamped to head_dim: the reference formula assumes head_dim >= 32 (its
    # shipped configs use 32); smaller heads would index out of range.
    return min(max(head_dim // 2, 32), head_dim)


def rope_inv_freq(head_dim: int, base: float = 10000.0) -> np.ndarray:
    rot_dim = rope_rot_dim(head_dim)
    index = np.arange(0, rot_dim, 2, dtype=np.float32)
    return (1.0 / np.power(base, index / np.float32(rot_dim))).astype(np.float32)


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    shape = x.shape
    x = x.reshape(shape[:-1] + (shape[-1] // 2, 2))
    x0, x1 = x[..., 0], x[..., 1]
    return jnp.stack([-x1, x0], axis=-1).reshape(shape)


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    inv_freq: jnp.ndarray,
    rot_dim: Optional[int] = None,
) -> jnp.ndarray:
    """Rotate ``x [B, T, H, Dh]`` (or ``[B, H, T, Dh]``-free: T must be axis 1).

    Args:
      x: queries or keys, ``[B, T, H, Dh]``.
      positions: absolute positions, ``[T]`` or ``[B, T]`` int32.
      inv_freq: ``[rot_dim // 2]`` from :func:`rope_inv_freq`.
      rot_dim: channels to rotate; defaults to ``2 * len(inv_freq)``.
    """
    if rot_dim is None:
        rot_dim = 2 * inv_freq.shape[-1]
    positions = positions.astype(jnp.float32)
    freq = positions[..., None] * inv_freq  # [T, r/2] or [B, T, r/2]
    freq = jnp.stack([freq, freq], axis=-1).reshape(freq.shape[:-1] + (rot_dim,))
    if freq.ndim == 2:  # [T, r] -> [1, T, 1, r]
        freq = freq[None, :, None, :]
    else:  # [B, T, r] -> [B, T, 1, r]
        freq = freq[:, :, None, :]
    cos = jnp.cos(freq).astype(x.dtype)
    sin = jnp.sin(freq).astype(x.dtype)

    head = x[..., :rot_dim]
    tail = x[..., rot_dim:]
    rotated = head * cos + _rotate_half_interleaved(head) * sin
    # Reference output layout: [unrotated_tail, rotated_head] (:86).
    return jnp.concatenate([tail, rotated], axis=-1)
