"""Int8 weight quantization for on-TPU serving.

The reference's quantized-deployment story is TFLite dynamic-range int8
(src/helpers/exec_helpers.py:41-58; our `export.convert_tflite` reproduces
it).  This module is the on-TPU analog: symmetric per-channel int8 weights
(same scheme TFLite uses for weights: ``scale = absmax / 127``, zero-point
0) living directly in the serving params pytree, so int8 checkpoints
round-trip through the standard Orbax save/restore unchanged.

Rounding is round-to-nearest by default; ``stochastic=True`` uses the TPU's
hardware PRNG via a Pallas kernel (``pltpu.prng_random_bits`` +
``pltpu.stochastic_round``) so repeated quantize-train-quantize cycles stay
unbiased, with a ``jax.random`` fallback off-TPU.

A quantized leaf is the dict ``{"q8": int8 [..., C], "scale": f32 [C]}``
(per-output-channel, last axis); :func:`dequantize_pytree` restores floats
and is jit-safe, so serving code can dequantize inside the compiled step
while the at-rest/HBM copy stays int8 (≈4× smaller than float32 weights).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_array",
    "dequantize_array",
    "quantize_pytree",
    "dequantize_pytree",
    "is_quantized_leaf",
    "pytree_num_bytes",
]

_QMAX = 127.0  # symmetric: -127..127 (avoid int8's asymmetric -128)


def _channel_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Per-last-axis-channel symmetric scale: ``absmax / 127``."""
    reduce_axes = tuple(range(x.ndim - 1))
    absmax = jnp.max(jnp.abs(x), axis=reduce_axes)
    return jnp.where(absmax > 0, absmax / _QMAX, 1.0).astype(jnp.float32)


def _stochastic_round_pallas(scaled: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Stochastically round ``scaled`` (float32, already clipped to ±127) to
    int8 using the TPU hardware PRNG (pallas_guide quantization pattern)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
        # uniform [0,1): mantissa-fill trick (hardware stochastic_round only
        # targets bf16/fp8, so int8 SR is done as floor(x + U) explicitly)
        u = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0
        q = jnp.floor(x_ref[:] + u)
        out_ref[:] = jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)

    flat = scaled.reshape(-1, scaled.shape[-1])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.int8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(flat, jnp.asarray([seed], jnp.int32))
    return out.reshape(scaled.shape)


def _stochastic_round_jnp(scaled: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Fallback: floor(x + U[0,1)) is unbiased stochastic rounding."""
    u = jax.random.uniform(key, scaled.shape, jnp.float32)
    return jnp.clip(jnp.floor(scaled + u), -_QMAX, _QMAX).astype(jnp.int8)


def quantize_array(
    x: jnp.ndarray,
    *,
    stochastic: bool = False,
    key: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``float [..., C] -> (int8 [..., C], scale f32 [C])`` symmetric
    per-channel quantization over the last axis."""
    x = jnp.asarray(x, jnp.float32)
    scale = _channel_scale(x)
    scaled = jnp.clip(x / scale, -_QMAX, _QMAX)
    if not stochastic:
        q = jnp.round(scaled).astype(jnp.int8)
        return q, scale
    if key is None:
        raise ValueError("stochastic=True requires a PRNG key")
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform not in ("cpu",)
    if use_pallas:
        seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
        return _stochastic_round_pallas(scaled, seed), scale
    return _stochastic_round_jnp(scaled, key), scale


def dequantize_array(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return q.astype(dtype) * scale.astype(dtype)


def is_quantized_leaf(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"q8", "scale"}


def _should_quantize(path_key: str, leaf, min_size: int) -> bool:
    if not hasattr(leaf, "ndim") or leaf.ndim < 2 or leaf.size < min_size:
        return False
    if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
        return False
    # matmul weights only: LN/bias are 1-D (excluded by ndim), RoPE tables and
    # BN stats must stay exact.  ``path_key`` is the JOINED path (e.g.
    # "text_embedding/table"), so the embedding table — whose leaf key is
    # just "table" — matches via its parent key.
    name = path_key.lower()
    return (
        "kernel" in name or "embedding" in name or "table" in name
    ) and "inv_freq" not in name


def quantize_pytree(
    params,
    *,
    min_size: int = 1024,
    stochastic: bool = False,
    key: Optional[jax.Array] = None,
):
    """Quantize every matmul weight in a params pytree to int8+scale dicts;
    everything else (biases, LayerNorm, RoPE tables, small tensors) is kept
    in float.  Structure otherwise unchanged, so the result round-trips
    through Orbax checkpoints like any params pytree."""
    counter = [0]

    def walk(node, name: str):
        if isinstance(node, dict):
            return {k: walk(v, f"{name}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [walk(v, name) for v in node]
            return type(node)(out)
        if _should_quantize(name, node, min_size):
            sub = None
            if stochastic:
                counter[0] += 1
                sub = jax.random.fold_in(key, counter[0])
            q, scale = quantize_array(node, stochastic=stochastic, key=sub)
            return {"q8": q, "scale": scale}
        return node

    return walk(params, "")


def dequantize_pytree(params, dtype=jnp.float32):
    """Inverse of :func:`quantize_pytree`; jit-safe (pure jnp ops)."""

    def walk(node):
        if is_quantized_leaf(node):
            return dequantize_array(node["q8"], node["scale"], dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)([walk(v) for v in node])
        return node

    return walk(params)


def pytree_has_quantized(params) -> bool:
    """True if any node in the tree is a quantized ``{"q8","scale"}`` leaf."""

    def walk(node) -> bool:
        if is_quantized_leaf(node):
            return True
        if isinstance(node, dict):
            return any(walk(v) for v in node.values())
        if isinstance(node, (list, tuple)):
            return any(walk(v) for v in node)
        return False

    return walk(params)


def pytree_num_bytes(params) -> int:
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, "size") and hasattr(leaf, "dtype")
    )
