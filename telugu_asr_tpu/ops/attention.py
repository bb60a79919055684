"""Attention ops: RoPE scaled-dot-product MHA and relative-position MHA.

Pure ``init``/``apply`` functions over param dicts, replacing the reference's
Keras layer classes (src/models/layers/attention.py):

* ``mha_*``      — MultiHeadAttention (:9-246): bias-free fused QKV matmuls,
  RoPE on Q and K after head split (:189-190), query pre-scaled by
  ``1/sqrt(head_dim)``, additive ``-1e9`` masking, output projection.
  Supports an explicit KV cache for incremental decode — the reference
  re-runs the full prefix per step (moonshine/model.py:187-195); the cached
  path computes the same function (RoPE depends only on absolute position).
* ``relmha_*``   — RelPositionMultiHeadAttention (:250-515): Transformer-XL
  style with per-head kernels, learned ``pos_bias_u/v`` and the
  relative-shift trick.
* ``mhsa_module_*`` / ``cross_attention_module_*`` — post-norm residual
  wrappers (:519-684).

Masks are boolean (True = attend); conversion to additive ``-1e9`` happens
in one place.  All softmaxes run in float32 regardless of compute dtype.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.ops.initializers import glorot_uniform, zeros
from telugu_asr_tpu.ops.norm import layer_norm, layer_norm_init
from telugu_asr_tpu.ops.rope import apply_rope, rope_inv_freq, rope_rot_dim

__all__ = [
    "dropout",
    "causal_mask",
    "combine_masks",
    "mha_init",
    "mha_apply",
    "relmha_init",
    "relmha_apply",
    "mhsa_module_init",
    "mhsa_module_apply",
    "cross_attention_module_init",
    "cross_attention_module_apply",
]

MASK_BIAS = -1e9  # Keras _masked_softmax adder


def dropout(key: Optional[jax.Array], rate: float, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def causal_mask(q_len: int, k_len: int, offset: int = 0) -> jnp.ndarray:
    """``[q_len, k_len]`` bool; query i attends keys <= i + offset."""
    q = jnp.arange(q_len)[:, None] + offset
    k = jnp.arange(k_len)[None, :]
    return k <= q


def combine_masks(*masks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """AND of broadcastable boolean masks, ignoring ``None``s."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else out & m
    return out


def _masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over the last axis with the Keras additive-mask convention."""
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = scores + jnp.where(mask, 0.0, MASK_BIAS)
    return jax.nn.softmax(scores, axis=-1)


# ---------------------------------------------------------------------------
# RoPE scaled-dot-product MHA
# ---------------------------------------------------------------------------


def mha_init(
    key: jax.Array, d_model: int, num_heads: int, head_dim: int, output_dim: Optional[int] = None
) -> dict:
    output_dim = output_dim or d_model
    kq, kk, kv, ko = jax.random.split(key, 4)
    inner = num_heads * head_dim
    return {
        "query_kernel": glorot_uniform(kq, (d_model, inner)),
        "key_kernel": glorot_uniform(kk, (d_model, inner)),
        "value_kernel": glorot_uniform(kv, (d_model, inner)),
        "projection_kernel": glorot_uniform(ko, (inner, output_dim)),
        # Non-trainable, saved for checkpoint parity (positional_encoding.py:38-43).
        "rope_inv_freq": jnp.asarray(rope_inv_freq(head_dim)),
    }


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, inner = x.shape
    return x.reshape(b, t, num_heads, inner // num_heads)


def mha_apply(
    params: dict,
    query: jnp.ndarray,
    key_value: jnp.ndarray,
    num_heads: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    cache: Optional[dict] = None,
    cache_index: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[dict]]:
    """RoPE MHA.

    Args:
      query: ``[B, Tq, d]``.
      key_value: ``[B, Tk, d]`` — ignored when ``cache`` holds precomputed
        cross-attention K/V (``cache["static"]=True``).
      mask: bool, broadcastable to ``[B, H, Tq, Tk]`` (e.g. ``[B, 1, Tq, Tk]``).
      q_positions / kv_positions: absolute positions for RoPE; default
        ``arange(T)``.
      cache: for incremental self-attention decode, ``{"k","v"}`` buffers of
        shape ``[B, H, Dh, Tmax]`` written at ``cache_index``; with
        ``cache_index=None`` the cache is treated as precomputed static K/V
        (cross-attention) and ``key_value`` is ignored.  The time-minor
        layout matters: TPU tiles the two minor dims (8×128), so a
        ``[B, T, H, Dh]`` cache with Dh=32 lanes inflates every per-step
        full-cache read ~5×; with T minor the padding is ~1.05×.

    Returns ``(output [B, Tq, out_dim], updated_cache_or_None)``.
    """
    head_dim = params["query_kernel"].shape[-1] // num_heads
    rot_dim = rope_rot_dim(head_dim)
    inv_freq = params["rope_inv_freq"]

    b, tq, _ = query.shape
    if q_positions is None:
        q_positions = jnp.arange(tq)
    q = _split_heads(query @ params["query_kernel"], num_heads)
    q = apply_rope(q, q_positions, inv_freq, rot_dim)

    new_cache = None
    cached_layout = False  # True: K/V are [B, H, Dh, T] (time-minor)
    if cache is not None and cache_index is None:
        # Precomputed static K/V (cross-attention over a fixed encoder).
        k, v = cache["k"], cache["v"]
        new_cache = cache
        cached_layout = True
    else:
        tk = key_value.shape[1]
        if kv_positions is None:
            kv_positions = jnp.arange(tk)
        k = _split_heads(key_value @ params["key_kernel"], num_heads)
        v = _split_heads(key_value @ params["value_kernel"], num_heads)
        k = apply_rope(k, kv_positions, inv_freq, rot_dim)
        if cache is not None:
            # Incremental write at cache_index (Tq == tk == 1 step decode):
            # transpose the step's K/V to [B, H, Dh, 1] and write one column.
            k_step = k.transpose(0, 2, 3, 1).astype(cache["k"].dtype)
            v_step = v.transpose(0, 2, 3, 1).astype(cache["v"].dtype)
            k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k_step, cache_index, axis=3)
            v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v_step, cache_index, axis=3)
            new_cache = {"k": k, "v": v}
            cached_layout = True

    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, q.dtype))
    if cached_layout:
        scores = jnp.einsum("bqhd,bhdk->bhqk", q * scale, k)
        probs = _masked_softmax(scores, mask).astype(v.dtype)
        out = jnp.einsum("bhqk,bhdk->bqhd", probs, v)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        probs = _masked_softmax(scores, mask).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    out = out.reshape(b, tq, num_heads * head_dim)
    out = out @ params["projection_kernel"]
    return out, new_cache


def make_cross_attention_cache(
    params: dict, encoder_out: jnp.ndarray, num_heads: int
) -> dict:
    """Precompute encoder K/V once for the whole decode, stored time-minor
    ``[B, H, Dh, T]`` (see the cache-layout note on :func:`mha_apply`)."""
    head_dim = params["key_kernel"].shape[-1] // num_heads
    rot_dim = rope_rot_dim(head_dim)
    tk = encoder_out.shape[1]
    k = _split_heads(encoder_out @ params["key_kernel"], num_heads)
    v = _split_heads(encoder_out @ params["value_kernel"], num_heads)
    k = apply_rope(k, jnp.arange(tk), params["rope_inv_freq"], rot_dim)
    return {"k": k.transpose(0, 2, 3, 1), "v": v.transpose(0, 2, 3, 1)}


def init_self_attention_cache(
    batch: int, max_len: int, num_heads: int, head_dim: int, dtype=jnp.float32
) -> dict:
    return {
        "k": jnp.zeros((batch, num_heads, head_dim, max_len), dtype),
        "v": jnp.zeros((batch, num_heads, head_dim, max_len), dtype),
    }


# ---------------------------------------------------------------------------
# Relative-position MHA (Transformer-XL style, Conformer family)
# ---------------------------------------------------------------------------


def relmha_init(
    key: jax.Array,
    d_model: int,
    num_heads: int,
    head_dim: int,
    output_dim: Optional[int] = None,
    pos_dim: Optional[int] = None,
) -> dict:
    output_dim = output_dim or d_model
    pos_dim = pos_dim or d_model
    kq, kk, kv, ko, kp = jax.random.split(key, 5)

    def per_head(k, in_dim):
        # Keras add_weight [H, in, out] with glorot over (in, out) fans.
        return glorot_uniform(k, (num_heads, in_dim, head_dim), fan_in=in_dim, fan_out=head_dim)

    return {
        "query_kernel": per_head(kq, d_model),
        "key_kernel": per_head(kk, d_model),
        "value_kernel": per_head(kv, d_model),
        "projection_kernel": glorot_uniform(
            ko, (num_heads, head_dim, output_dim), fan_in=head_dim, fan_out=output_dim
        ),
        "pos_kernel": per_head(kp, pos_dim),
        "pos_bias_u": jnp.zeros((num_heads, head_dim)),
        "pos_bias_v": jnp.zeros((num_heads, head_dim)),
    }


def _relative_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift (attention.py:347-354)."""
    b, h, tq, tk = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (1, 0)])
    x = x.reshape(b, h, tk + 1, tq)
    return x[:, :, 1:, :].reshape(b, h, tq, tk)


def _relative_shift_sliced(x: jnp.ndarray, tk: int) -> jnp.ndarray:
    """``_relative_shift(x)[..., :tk]`` without the pad→cross-lane reshape.

    The shift law is ``out[n, m] = x[n, m - n + tq - 1]``; flattening the two
    minor dims, that flat index is ``n*(p-1) + m + (tq-1)`` — i.e. the shift
    is a RESTRIDE of the row-major buffer from row stride ``p`` to ``p-1``:
    one contiguous lane slice instead of the padded reshape XLA lowers as a
    relayout (measured 254→235 µs for the whole flagship relMHA block on
    v5e).  Exact (bit-identical) wherever ``p >= tq + tk - 1``, which holds
    for the Conformer's ``p = 2T-1`` sinusoid stream; falls back otherwise.
    """
    b, h, tq, p = x.shape
    if p < tq + tk - 1:
        return _relative_shift(x)[..., :tk]
    xf = x.reshape(b, h, tq * p)
    xs = jax.lax.slice_in_dim(xf, tq - 1, tq - 1 + tq * (p - 1), axis=2)
    return xs.reshape(b, h, tq, p - 1)[..., :tk]


def relmha_apply(
    params: dict,
    inputs: jnp.ndarray,
    pos: jnp.ndarray,
    num_heads: int,
    *,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Self-attention with relative positional encoding.

    ``inputs [B, T, d]``, ``pos [B or 1, P, d]`` sinusoidal stream.
    Mirrors attention.py:426-467: logits = (q+u)·k + shift((q+v)·p), scaled
    AFTER the sum by ``1/sqrt(head_dim)``.
    """
    head_dim = params["query_kernel"].shape[-1]
    q = jnp.einsum("bni,hio->bnho", inputs, params["query_kernel"])
    k = jnp.einsum("bmi,hio->bmho", inputs, params["key_kernel"])
    v = jnp.einsum("bmi,hio->bmho", inputs, params["value_kernel"])
    p = jnp.einsum("bmi,hio->bmho", pos, params["pos_kernel"])

    qu = q + params["pos_bias_u"]
    qv = q + params["pos_bias_v"]
    logits_u = jnp.einsum("bnho,bmho->bhnm", qu, k)
    logits_v = jnp.einsum("bnho,bmho->bhnm", qv, p)
    logits = logits_u + _relative_shift_sliced(logits_v, logits_u.shape[-1])
    logits = logits / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))

    probs = _masked_softmax(logits, mask).astype(v.dtype)
    out = jnp.einsum("bhnm,bmho->bnho", probs, v)
    # projection_kernel is [H, head_dim, out]: contract heads and head_dim.
    return jnp.einsum("bnhd,hdo->bno", out, params["projection_kernel"])


# ---------------------------------------------------------------------------
# Post-norm residual modules
# ---------------------------------------------------------------------------


def mhsa_module_init(
    key: jax.Array,
    d_model: int,
    num_heads: int,
    head_dim: int,
    attention_type: str = "sdpa",
    output_dim: Optional[int] = None,
) -> dict:
    k_attn, _ = jax.random.split(key)
    if attention_type == "sdpa":
        attn = mha_init(k_attn, d_model, num_heads, head_dim, output_dim)
    elif attention_type == "relmha":
        attn = relmha_init(k_attn, d_model, num_heads, head_dim, output_dim)
    else:
        raise ValueError(f"Unsupported attention_type: {attention_type}")
    return {"mha": attn, "ln": layer_norm_init(output_dim or d_model)}


def mhsa_module_apply(
    params: dict,
    inputs: jnp.ndarray,
    num_heads: int,
    *,
    attention_type: str = "sdpa",
    pos: Optional[jnp.ndarray] = None,
    padding_mask: Optional[jnp.ndarray] = None,
    use_causal_mask: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Self-attention block: attn → dropout → residual add → LayerNorm.

    ``padding_mask``: ``[B, T]`` (True/1 = valid), expanded to query+key+value
    masks exactly like the reference's compute_attention_mask (:205-213).
    """
    t = inputs.shape[1]
    mask = None
    if padding_mask is not None:
        pm = padding_mask.astype(bool)
        mask = combine_masks(pm[:, None, :, None], pm[:, None, None, :])
    if use_causal_mask:
        cm = causal_mask(t, t)[None, None]
        mask = combine_masks(mask, cm)

    if attention_type == "sdpa":
        out, _ = mha_apply(params["mha"], inputs, inputs, num_heads, mask=mask)
    else:
        out = relmha_apply(params["mha"], inputs, pos, num_heads, mask=mask)
    out = dropout(dropout_key, dropout_rate, out, deterministic)
    return layer_norm(params["ln"], inputs + out)


def cross_attention_module_init(
    key: jax.Array, d_model: int, num_heads: int, head_dim: int
) -> dict:
    return {
        "mha": mha_init(key, d_model, num_heads, head_dim, d_model),
        "ln": layer_norm_init(d_model),
    }


def cross_attention_module_apply(
    params: dict,
    decoder_query: jnp.ndarray,
    encoder_key_value: Optional[jnp.ndarray],
    num_heads: int,
    *,
    key_value_mask: Optional[jnp.ndarray] = None,
    q_positions: Optional[jnp.ndarray] = None,
    cross_cache: Optional[dict] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Cross-attention block (attention.py:617-665): decoder queries over
    encoder K/V masked by ``key_value_mask [B, T_enc]`` → residual → LN.

    Note the reference does NOT dropout the cross-attention output before the
    residual (its ``self.do`` is created but unused, :654-665); we match that,
    keeping the arguments for API symmetry.
    """
    del dropout_rate, dropout_key, deterministic
    mask = None
    if key_value_mask is not None:
        kv = key_value_mask.astype(bool)
        mask = kv[:, None, None, :]
    out, _ = mha_apply(
        params["mha"],
        decoder_query,
        encoder_key_value,
        num_heads,
        mask=mask,
        q_positions=q_positions,
        cache=cross_cache,
    )
    return layer_norm(params["ln"], decoder_query + out)
