"""Convolution ops: separable Conv1D subsampling, Conv2D subsampling, and the
Conformer convolution module.

TPU notes: depthwise convs lower to ``lax.conv_general_dilated`` with
``feature_group_count``; pointwise (1×1) convs are expressed as matmuls so XLA
schedules them on the MXU.  Length arithmetic mirrors
src/utils/math_util.py:20-32 (``same``: ceil(L/s); ``valid``:
floor((L-k)/s)+1).

Reference layers:
* ``Conv1DSubsamplingLayer`` (moonshine/encoder.py:10-105): 3×
  ``SeparableConv1D`` with filters ``[d, 2d, d]``, kernel 9, stride 2, per-
  config padding/activations, over ``[B, frames, 80]``.
* ``Conv2dSubsampling`` (conformer/encoder.py:9-74): 2× Conv2D stride 2 +
  relu, then merge (freq × channels).
* ``ConvModule`` (conformer/encoder.py:77-165): LN → pw-conv(2d) → GLU →
  dw-conv(k=31, same) → BN → swish → pw-conv(d) → dropout → residual.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.ops.attention import dropout
from telugu_asr_tpu.ops.initializers import glorot_uniform
from telugu_asr_tpu.ops.mlp import dense_apply, dense_init, get_activation, glu
from telugu_asr_tpu.ops.norm import batch_norm, batch_norm_init, layer_norm, layer_norm_init

__all__ = [
    "get_conv_length",
    "conv1d_subsampling_init",
    "conv1d_subsampling_apply",
    "conv2d_subsampling_init",
    "conv2d_subsampling_apply",
    "conv_module_init",
    "conv_module_apply",
]


def get_conv_length(input_length, kernel_size: int, padding: str, strides: int):
    """Output length law (math_util.py:20-32).  Works on ints or arrays."""
    if padding == "same":
        if isinstance(input_length, (int, np.integer)):
            return int(math.ceil(input_length / strides))
        return jnp.ceil(input_length / strides).astype(jnp.int32)
    if padding == "valid":
        if isinstance(input_length, (int, np.integer)):
            return int((input_length - kernel_size) // strides + 1)
        return ((input_length - kernel_size) // strides + 1).astype(jnp.int32)
    raise ValueError(f"unsupported padding: {padding}")


def _same_pad_1d(length: int, kernel: int, stride: int) -> Tuple[int, int]:
    out = math.ceil(length / stride)
    total = max((out - 1) * stride + kernel - length, 0)
    return total // 2, total - total // 2


def _depthwise_conv1d(
    x: jnp.ndarray, kernel: jnp.ndarray, stride: int, padding
) -> jnp.ndarray:
    """``x [B, T, C]``, ``kernel [k, C]`` → ``[B, T', C]``.

    Implemented as k statically-unrolled shifted FMAs over a padded input
    rather than ``lax.conv_general_dilated`` with ``feature_group_count=C``:
    the grouped-conv lowering measured ~2× slower standalone on v5e, and —
    much worse — fusing a transcendental (silu/sigmoid) onto its OUTPUT
    triggered a pathological ~20× slowdown of the surrounding fusion
    (3.02 ms vs 0.17 ms for the whole Conformer conv module at
    [64, 137, 144]).  The unrolled form is plain VPU code that XLA fuses
    normally, and the tap loop (k=31 flagship) is compile-time static.
    """
    k = kernel.shape[0]
    (lo, hi) = padding[0]
    t_out = (x.shape[1] + lo + hi - k) // stride + 1
    if t_out <= 0:  # degenerate T < k valid conv (lax.conv's T'=0 law)
        return jnp.zeros((x.shape[0], 0, x.shape[-1]), x.dtype)
    xp = jnp.pad(x, [(0, 0), (lo, hi), (0, 0)])
    span = (t_out - 1) * stride + 1
    y = xp[:, 0:span:stride, :] * kernel[0]
    for j in range(1, k):
        y = y + xp[:, j : j + span : stride, :] * kernel[j]
    return y


# ---------------------------------------------------------------------------
# Moonshine Conv1D (separable) subsampling
# ---------------------------------------------------------------------------


def conv1d_subsampling_init(
    key: jax.Array,
    model_dim: int,
    in_channels: int = 80,
    kernel_size: Sequence[int] = (9, 9, 9),
) -> dict:
    filters = [model_dim, 2 * model_dim, model_dim]
    layers = []
    c_in = in_channels
    for i, (k, f) in enumerate(zip(kernel_size, filters)):
        kd, kp, key = jax.random.split(key, 3)
        layers.append(
            {
                # Keras SeparableConv1D: depthwise (k, C_in, 1), pointwise
                # (1, C_in, F), single bias after pointwise.
                "depthwise": glorot_uniform(kd, (k, c_in), fan_in=k * c_in, fan_out=k),
                "pointwise": glorot_uniform(kp, (c_in, f), fan_in=c_in, fan_out=f),
                "bias": jnp.zeros((f,)),
            }
        )
        c_in = f
    return {"layers": layers}


def conv1d_subsampling_apply(
    params: dict,
    features: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    *,
    kernel_size: Sequence[int] = (9, 9, 9),
    strides: Sequence[int] = (2, 2, 2),
    padding: Sequence[str] = ("valid", "valid", "valid"),
    activations: Sequence[str] = ("gelu", "gelu", "gelu"),
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """``[B, T, 80]`` (+ lengths) → ``[B, T', d]`` (+ new lengths).

    Mirrors moonshine/encoder.py:50-71 (stride on the depthwise stage,
    activation after the pointwise+bias stage).
    """
    x = features
    for i, layer in enumerate(params["layers"]):
        k, s, p, act = kernel_size[i], strides[i], padding[i], activations[i]
        if p == "same":
            pads = [_same_pad_1d(x.shape[1], k, s)]
        else:
            pads = [(0, 0)]
        x = _depthwise_conv1d(x, layer["depthwise"], s, pads)
        x = x @ layer["pointwise"] + layer["bias"]
        x = get_activation(act)(x)
        if lengths is not None:
            lengths = get_conv_length(lengths, k, p, s)
    return x, lengths


def conv1d_subsampled_length(
    length,
    kernel_size: Sequence[int] = (9, 9, 9),
    strides: Sequence[int] = (2, 2, 2),
    padding: Sequence[str] = ("valid", "valid", "valid"),
):
    for k, s, p in zip(kernel_size, strides, padding):
        length = get_conv_length(length, k, p, s)
    return length


# ---------------------------------------------------------------------------
# Conformer Conv2D subsampling
# ---------------------------------------------------------------------------


def conv2d_subsampling_init(
    key: jax.Array, filters: int = 144, kernel_size: int = 3, in_channels: int = 1
) -> dict:
    k1, k2 = jax.random.split(key)
    shape1 = (kernel_size, kernel_size, in_channels, filters)
    shape2 = (kernel_size, kernel_size, filters, filters)
    return {
        "conv1": {"kernel": glorot_uniform(k1, shape1), "bias": jnp.zeros((filters,))},
        "conv2": {"kernel": glorot_uniform(k2, shape2), "bias": jnp.zeros((filters,))},
    }


def conv2d_subsampling_apply(
    params: dict,
    features: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    *,
    stride: int = 2,
    padding: str = "same",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """``[B, T, F, 1]`` → merged ``[B, T/4, F/4 * filters]`` (encoder.py:49-67)."""
    x = features

    def conv(x, p):
        return (
            jax.lax.conv_general_dilated(
                x,
                p["kernel"],
                window_strides=(stride, stride),
                padding=padding.upper(),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + p["bias"]
        )

    x = jax.nn.relu(conv(x, params["conv1"]))
    x = jax.nn.relu(conv(x, params["conv2"]))
    b, t, f, c = x.shape
    x = x.reshape(b, t, f * c)
    if lengths is not None:
        # Reference tracks only ONE stride-2 reduction in lengths
        # (encoder.py:59-65) despite two convs; we track both (correct), and
        # note the divergence for weight-parity checks.
        lengths = get_conv_length(lengths, 3, "same", stride)
        lengths = get_conv_length(lengths, 3, "same", stride)
    return x, lengths


# ---------------------------------------------------------------------------
# Conformer convolution module
# ---------------------------------------------------------------------------


def conv_module_init(
    key: jax.Array, input_dim: int, kernel_size: int = 31, scale_factor: int = 2
) -> Tuple[dict, dict]:
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "ln": layer_norm_init(input_dim),
        "pw_conv_1": dense_init(k1, input_dim, scale_factor * input_dim),
        "dw_conv": {
            "kernel": glorot_uniform(
                k2, (kernel_size, input_dim), fan_in=kernel_size * input_dim, fan_out=kernel_size
            ),
            "bias": jnp.zeros((input_dim,)),
        },
        "pw_conv_2": dense_init(k3, input_dim, input_dim),
    }
    bn_params, bn_state = batch_norm_init(input_dim)
    params["bn"] = bn_params
    return params, bn_state


def conv_module_apply(
    params: dict,
    bn_state: dict,
    inputs: jnp.ndarray,
    *,
    training: bool = False,
    pad_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, dict]:
    """LN → pw(2d) → GLU → dw(k, same) → BN → swish → pw(d) → drop → residual."""
    out = layer_norm(params["ln"], inputs)
    out = glu(dense_apply(params["pw_conv_1"], out))
    k = params["dw_conv"]["kernel"].shape[0]
    pads = [_same_pad_1d(out.shape[1], k, 1)]
    out = _depthwise_conv1d(out, params["dw_conv"]["kernel"], 1, pads) + params["dw_conv"]["bias"]
    out, bn_state = batch_norm(params["bn"], bn_state, out, training=training, mask=pad_mask)
    out = jax.nn.silu(out)
    out = dense_apply(params["pw_conv_2"], out)
    out = dropout(dropout_key, dropout_rate, out, deterministic=not training)
    return inputs + out, bn_state
