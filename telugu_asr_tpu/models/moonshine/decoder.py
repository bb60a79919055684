"""Moonshine decoder: causal MHSA → cross-attention → SwiGLU FFN blocks.

Functional rework of src/models/moonshine/decoder.py:10-178, with a first-class
incremental path (``decoder_step``) the reference lacks: the reference re-runs
the full decoder over the whole prefix every decode step
(moonshine/model.py:187-195); here each block carries a KV cache
(self-attention K/V written at the step index, cross-attention K/V precomputed
once from the encoder output), so each step is O(prefix) attention reads
instead of O(prefix²) recompute.  Both paths compute the same function — RoPE
depends only on absolute positions, which the cached path feeds explicitly.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.ops.attention import (
    combine_masks,
    cross_attention_module_apply,
    cross_attention_module_init,
    init_self_attention_cache,
    make_cross_attention_cache,
    mha_apply,
    mhsa_module_init,
)
from telugu_asr_tpu.ops.norm import layer_norm
from telugu_asr_tpu.ops.attention import causal_mask, dropout
from telugu_asr_tpu.ops.mlp import ffn_module_apply, ffn_module_init

__all__ = [
    "DecoderConfig",
    "decoder_init",
    "decoder_apply",
    "decoder_init_cache",
    "decoder_step",
]


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    d_model: int = 192
    num_blocks: int = 6
    num_heads: int = 6
    head_dim: int = 32
    activation: str = "swiglu"
    fc_factor: int = 1
    dropout: float = 0.1


def decoder_init(key: jax.Array, cfg: DecoderConfig) -> dict:
    blocks = []
    for kb in jax.random.split(key, cfg.num_blocks):
        km, kc, kf = jax.random.split(kb, 3)
        blocks.append(
            {
                "masked_mhsa": mhsa_module_init(km, cfg.d_model, cfg.num_heads, cfg.head_dim),
                "cross_attention": cross_attention_module_init(
                    kc, cfg.d_model, cfg.num_heads, cfg.head_dim
                ),
                "ffn": ffn_module_init(kf, cfg.d_model, cfg.fc_factor, cfg.activation),
            }
        )
    return {"blocks": blocks}


def decoder_apply(
    params: dict,
    cfg: DecoderConfig,
    embedded_text: jnp.ndarray,
    encoder_out: jnp.ndarray,
    *,
    text_mask: Optional[jnp.ndarray] = None,
    encoder_mask: Optional[jnp.ndarray] = None,
    use_causal_mask: bool = True,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Full-sequence decoder (training/teacher forcing).

    ``embedded_text [B, U, d]``, ``encoder_out [B, T, d]``;
    ``text_mask [B, U]`` (True = valid), ``encoder_mask [B, T]``.
    """
    x = embedded_text
    u = x.shape[1]
    self_mask = None
    if text_mask is not None:
        tm = text_mask.astype(bool)
        self_mask = combine_masks(tm[:, None, :, None], tm[:, None, None, :])
    if use_causal_mask:
        self_mask = combine_masks(self_mask, causal_mask(u, u)[None, None])

    for i, block in enumerate(params["blocks"]):
        km = kf = None
        if rng is not None and not deterministic:
            km, kf = jax.random.split(jax.random.fold_in(rng, i))
        # masked self-attention (post-norm residual)
        attn, _ = mha_apply(
            block["masked_mhsa"]["mha"], x, x, cfg.num_heads, mask=self_mask
        )
        attn = dropout(km, cfg.dropout, attn, deterministic)
        x = layer_norm(block["masked_mhsa"]["ln"], x + attn)
        # cross-attention over encoder output
        x = cross_attention_module_apply(
            block["cross_attention"],
            x,
            encoder_out,
            cfg.num_heads,
            key_value_mask=encoder_mask,
        )
        # FFN (SwiGLU)
        x = ffn_module_apply(
            block["ffn"],
            x,
            cfg.activation,
            dropout_rate=cfg.dropout,
            dropout_key=kf,
            deterministic=deterministic,
        )
    return x


# ---------------------------------------------------------------------------
# KV-cached incremental decoding
# ---------------------------------------------------------------------------


def decoder_init_cache(
    params: dict,
    cfg: DecoderConfig,
    encoder_out: jnp.ndarray,
    max_len: int,
    dtype=jnp.float32,
) -> dict:
    """Build per-block caches: empty self-attn K/V buffers + precomputed
    cross-attn K/V from the encoder output."""
    batch = encoder_out.shape[0]
    blocks = []
    for block in params["blocks"]:
        cross = make_cross_attention_cache(
            block["cross_attention"]["mha"], encoder_out, cfg.num_heads
        )
        cross = jax.tree_util.tree_map(lambda x: x.astype(dtype), cross)
        blocks.append(
            {
                "self": init_self_attention_cache(
                    batch, max_len, cfg.num_heads, cfg.head_dim, dtype
                ),
                "cross": cross,
            }
        )
    return {"blocks": blocks}


def decoder_step(
    params: dict,
    cfg: DecoderConfig,
    embedded_token: jnp.ndarray,
    cache: dict,
    step: jnp.ndarray,
    *,
    key_valid_mask: Optional[jnp.ndarray] = None,
    encoder_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    """One decode step with KV caches.

    Args:
      embedded_token: ``[B, 1, d]`` embedding of the token at position ``step``.
      cache: from :func:`decoder_init_cache`; self buffers are ``[B, Umax, ...]``.
      step: scalar int32 — absolute position of this token.
      key_valid_mask: ``[B, Umax]`` bool marking cached positions that are
        non-PAD (reproduces the reference's ``decoder_input != pad`` text mask
        law, moonshine/model.py:189).
      encoder_mask: ``[B, T]`` bool for cross-attention.

    Returns ``(decoder_out [B, 1, d], updated cache)``.
    """
    x = embedded_token
    max_len = cache["blocks"][0]["self"]["k"].shape[-1]  # [B, H, Dh, L]
    # attend to cached positions <= step that hold valid tokens
    attend = jnp.arange(max_len)[None, :] <= step
    if key_valid_mask is not None:
        attend = attend & key_valid_mask
    self_mask = attend[:, None, None, :]  # [B, 1, 1, Umax]

    positions = jnp.full((x.shape[0], 1), step, dtype=jnp.int32)
    new_blocks = []
    for block, bcache in zip(params["blocks"], cache["blocks"]):
        attn, new_self = mha_apply(
            block["masked_mhsa"]["mha"],
            x,
            x,
            cfg.num_heads,
            mask=self_mask,
            q_positions=positions,
            kv_positions=positions,
            cache=bcache["self"],
            cache_index=step,
        )
        x = layer_norm(block["masked_mhsa"]["ln"], x + attn)
        x = cross_attention_module_apply(
            block["cross_attention"],
            x,
            None,
            cfg.num_heads,
            key_value_mask=encoder_mask,
            q_positions=positions,
            cross_cache=bcache["cross"],
        )
        x = ffn_module_apply(block["ffn"], x, cfg.activation)
        new_blocks.append({"self": new_self, "cross": bcache["cross"]})
    return x, {"blocks": new_blocks}
