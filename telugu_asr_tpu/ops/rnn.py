"""Recurrent cells for the transducer prediction network.

Keras-compatible LSTM/GRU as pure ``lax.scan`` recurrences (reference:
``layer_util.get_rnn`` + Keras layers, conformer/decoder.py:33-46).  Gate
conventions match Keras so converted weights behave identically: kernel
``[in, 4H]`` and recurrent kernel ``[H, 4H]`` in i|f|c|o gate order, sigmoid
recurrent activation, tanh cell activation, unit_forget_bias.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.ops.initializers import glorot_uniform

__all__ = ["lstm_init", "lstm_apply", "lstm_step", "gru_init", "gru_apply", "gru_step"]


def _orthogonal(key: jax.Array, shape) -> jnp.ndarray:
    # Keras recurrent_initializer default.
    rows, cols = shape
    a = jax.random.normal(key, (max(rows, cols), min(rows, cols)))
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diag(r))
    return (q[:rows, :cols] if rows >= cols else q.T[:rows, :cols]).astype(jnp.float32)


def lstm_init(key: jax.Array, in_dim: int, units: int) -> dict:
    kk, kr = jax.random.split(key)
    bias = jnp.zeros((4 * units,))
    bias = bias.at[units : 2 * units].set(1.0)  # unit_forget_bias
    return {
        "kernel": glorot_uniform(kk, (in_dim, 4 * units)),
        "recurrent_kernel": _orthogonal(kr, (units, 4 * units)),
        "bias": bias,
    }


def lstm_step(
    params: dict, carry: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """One step: carry ``(h, c)``, input ``[B, in]`` → (new carry, output h)."""
    h, c = carry
    units = h.shape[-1]
    z = x @ params["kernel"] + h @ params["recurrent_kernel"] + params["bias"]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return (h_new, c_new), h_new


def lstm_apply(
    params: dict,
    inputs: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    initial_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """``[B, T, in]`` → ``([B, T, H], final (h, c))``.

    ``mask [B, T]``: masked steps pass the previous state through and output
    the previous output (Keras mask semantics for stacked RNNs).
    """
    b, t, _ = inputs.shape
    units = params["recurrent_kernel"].shape[0]
    if initial_state is None:
        initial_state = (jnp.zeros((b, units), inputs.dtype), jnp.zeros((b, units), inputs.dtype))

    def step(carry, xs):
        (h, c), prev_out = carry
        x, m = xs
        (h_new, c_new), out = lstm_step(params, (h, c), x)
        if m is not None:
            keep = m[:, None]
            h_new = jnp.where(keep, h_new, h)
            c_new = jnp.where(keep, c_new, c)
            out = jnp.where(keep, out, prev_out)
        return ((h_new, c_new), out), out

    xs = (
        jnp.swapaxes(inputs, 0, 1),
        jnp.swapaxes(mask, 0, 1) if mask is not None else jnp.ones((t, b), bool),
    )
    prev0 = jnp.zeros((b, units), inputs.dtype)
    (final_state, _), outs = jax.lax.scan(step, (initial_state, prev0), xs)
    return jnp.swapaxes(outs, 0, 1), final_state


def gru_init(key: jax.Array, in_dim: int, units: int) -> dict:
    kk, kr = jax.random.split(key)
    return {
        "kernel": glorot_uniform(kk, (in_dim, 3 * units)),
        "recurrent_kernel": _orthogonal(kr, (units, 3 * units)),
        "bias": jnp.zeros((2, 3 * units)),  # Keras reset_after=True dual bias
    }


def gru_step(params: dict, h: jnp.ndarray, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    units = h.shape[-1]
    xz = x @ params["kernel"] + params["bias"][0]
    hz = h @ params["recurrent_kernel"] + params["bias"][1]
    xr, xu, xn = jnp.split(xz, 3, axis=-1)
    hr, hu, hn = jnp.split(hz, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    u = jax.nn.sigmoid(xu + hu)
    n = jnp.tanh(xn + r * hn)
    h_new = u * h + (1.0 - u) * n
    return h_new, h_new


def gru_apply(
    params: dict,
    inputs: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    initial_state: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, t, _ = inputs.shape
    units = params["recurrent_kernel"].shape[0]
    if initial_state is None:
        initial_state = jnp.zeros((b, units), inputs.dtype)

    def step(carry, xs):
        h, prev_out = carry
        x, m = xs
        h_new, out = gru_step(params, h, x)
        keep = m[:, None]
        h_new = jnp.where(keep, h_new, h)
        out = jnp.where(keep, out, prev_out)
        return (h_new, out), out

    xs = (
        jnp.swapaxes(inputs, 0, 1),
        jnp.swapaxes(mask, 0, 1) if mask is not None else jnp.ones((t, b), bool),
    )
    (h_final, _), outs = jax.lax.scan(step, (initial_state, jnp.zeros((b, units), inputs.dtype)), xs)
    return jnp.swapaxes(outs, 0, 1), h_final
