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
    "decoder_prefill",
    "decoder_init_cache_tiled",
    "decoder_step_tiled",
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


def decoder_prefill(
    params: dict,
    cfg: DecoderConfig,
    embedded_prefix: jnp.ndarray,
    cache: dict,
    *,
    key_valid_mask: Optional[jnp.ndarray] = None,
    encoder_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Teacher-forced cache PREFILL: write the self-attention K/V columns for
    positions ``0..P-1`` in ONE batched pass instead of P sequential
    :func:`decoder_step` calls.

    The streaming recognizer's partial ticks seed the decode with the
    previous tick's transcript (serving/streaming.py): the prefix tokens are
    already known, so their cache build is a teacher-forced forward — a
    batched MXU matmul per block — after which the sequential loop only runs
    for NEW tokens.  Math per position is identical to decoder_step (same
    mha_apply cache write, causal+validity mask), so a decode continued from
    a prefill equals one continued from stepped prefix feeding (tested).

    Args:
      embedded_prefix: ``[B, P, d]`` embeddings of positions ``0..P-1``
        (BOS + forced tokens; PAD beyond each row's true prefix).
      cache: from :func:`decoder_init_cache` (XLA layout).
      key_valid_mask: ``[B, Umax]`` bool over CACHE columns (True = non-PAD),
        same law as decoder_step.

    Returns ``(decoder_out [B, P, d], updated cache)`` — outputs are normally
    discarded (the continuation loop re-feeds the last prefix token).
    """
    x = embedded_prefix
    b, p, _ = x.shape
    max_len = cache["blocks"][0]["self"]["k"].shape[-1]
    rows = jnp.arange(p)[:, None]
    cols = jnp.arange(max_len)[None, :]
    attend = (cols <= rows)[None, None]  # causal over cache cols [1,1,P,Umax]
    if key_valid_mask is not None:
        attend = attend & key_valid_mask[:, None, None, :]
    positions = jnp.arange(p)
    new_blocks = []
    for block, bcache in zip(params["blocks"], cache["blocks"]):
        attn, new_self = mha_apply(
            block["masked_mhsa"]["mha"],
            x,
            x,
            cfg.num_heads,
            mask=attend,
            q_positions=positions,
            kv_positions=positions,
            cache=bcache["self"],
            cache_index=jnp.int32(0),
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


# ---------------------------------------------------------------------------
# Tiled-cache incremental decoding (Pallas prefix-read attention)
# ---------------------------------------------------------------------------
#
# Same function as decoder_step, but KV caches are stored in the tiled layout
# ``[B, T, H, Dh, 128]`` consumed by ops/pallas/decode_attention, which reads
# only the time-tiles covering the live prefix — the decode loop is HBM-bound
# on cache reads (~2.07 us per cached column per step measured on v5e), so
# prefix-only reads cut the dominant cost ~2x on average, and bf16 caches
# halve it again.  On non-TPU backends the same tiled code path runs through
# the jnp reference implementation (identical math, full reads).


def _project_heads(x: jnp.ndarray, kernel: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """``[B, 1, d] @ kernel -> [B, H, Dh]`` (single decode position)."""
    b = x.shape[0]
    inner = kernel.shape[-1]
    y = (x[:, 0, :] @ kernel).reshape(b, num_heads, inner // num_heads)
    return y


def _rope_step(x: jnp.ndarray, step: jnp.ndarray, inv_freq: jnp.ndarray, rot_dim: int) -> jnp.ndarray:
    """RoPE for one position: ``x [B, H, Dh]`` rotated at absolute ``step``."""
    from telugu_asr_tpu.ops.rope import apply_rope

    positions = jnp.full((x.shape[0], 1), step, dtype=jnp.int32)
    return apply_rope(x[:, None, :, :], positions, inv_freq, rot_dim)[:, 0]


def decoder_init_cache_tiled(
    params: dict,
    cfg: DecoderConfig,
    encoder_out: jnp.ndarray,
    max_len: int,
    dtype=jnp.float32,
) -> dict:
    """Tiled caches: zeroed self K/V ``[B, T, H, Dh, 128]`` + precomputed
    cross K/V tiled from the encoder output (time axis padded to 128)."""
    from telugu_asr_tpu.ops.pallas.decode_attention import TILE, tile_cache

    batch = encoder_out.shape[0]
    lpad = -(-max_len // TILE) * TILE
    blocks = []
    for block in params["blocks"]:
        cross = make_cross_attention_cache(
            block["cross_attention"]["mha"], encoder_out, cfg.num_heads
        )
        t_enc = cross["k"].shape[-1]
        t_pad = -(-t_enc // TILE) * TILE
        cross = {
            k: tile_cache(
                jnp.pad(v, [(0, 0)] * 3 + [(0, t_pad - t_enc)]).astype(dtype)
            )
            for k, v in cross.items()
        }
        self_shape = (batch, lpad // TILE, cfg.num_heads, cfg.head_dim, TILE)
        blocks.append(
            {
                "self": {
                    "k": jnp.zeros(self_shape, dtype),
                    "v": jnp.zeros(self_shape, dtype),
                },
                "cross": cross,
            }
        )
    return {"blocks": blocks}


def _write_tiled_column(cache: jnp.ndarray, col: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """Write ``col [B, H, Dh]`` at time index ``step`` of a tiled cache."""
    from telugu_asr_tpu.ops.pallas.decode_attention import TILE

    tile = step // TILE
    lane = step % TILE
    update = col[:, None, :, :, None].astype(cache.dtype)
    return jax.lax.dynamic_update_slice(cache, update, (0, tile, 0, 0, lane))


def decoder_step_tiled(
    params: dict,
    cfg: DecoderConfig,
    embedded_token: jnp.ndarray,
    cache: dict,
    step: jnp.ndarray,
    *,
    key_valid: jnp.ndarray,
    cross_n_valid: jnp.ndarray,
    cross_key_valid: jnp.ndarray,
    cross_q_uniform: Optional[jnp.ndarray] = None,
    use_pallas: bool,
) -> Tuple[jnp.ndarray, dict]:
    """One decode step over tiled caches (same math as :func:`decoder_step`).

    Args:
      embedded_token: ``[B, 1, d]`` at position ``step``.
      key_valid: ``[B, Lpad]`` int/bool — self-attention key mask (the PAD
        law incl. the lifted-PAD-query quirk, computed by the caller).
      cross_n_valid: ``[B]`` int32 — encoder valid length per row (or the
        full padded length in parity-unmasked mode).
      cross_key_valid: ``[B, Tpad]`` int/bool.
      cross_q_uniform: ``[B]`` bool — rows whose cross query is zeroed so
        attention is exactly UNIFORM over the ``cross_key_valid`` columns.
        Reproduces the Keras additive-mask law for a fully-masked row
        (zero-length encoding): ``score - 1e9`` absorbs to ``-1e9`` exactly
        in float32 (ulp(1e9)=64), so the reference softmax is uniform —
        NOT a recovered softmax(scores).  The caller lifts such rows'
        ``cross_key_valid`` to the true encoder width and sets this flag.
      use_pallas: run the Mosaic kernel (TPU) or the jnp reference (CPU).
    """
    from telugu_asr_tpu.ops.pallas.decode_attention import decode_attention
    from telugu_asr_tpu.ops.rope import rope_rot_dim

    x = embedded_token
    batch = x.shape[0]
    n_valid_self = jnp.full((batch,), step + 1, jnp.int32)

    new_blocks = []
    for block, bcache in zip(params["blocks"], cache["blocks"]):
        mha = block["masked_mhsa"]["mha"]
        head_dim = cfg.head_dim
        rot_dim = rope_rot_dim(head_dim)
        inv_freq = mha["rope_inv_freq"]

        q = _rope_step(_project_heads(x, mha["query_kernel"], cfg.num_heads), step, inv_freq, rot_dim)
        k = _rope_step(_project_heads(x, mha["key_kernel"], cfg.num_heads), step, inv_freq, rot_dim)
        v = _project_heads(x, mha["value_kernel"], cfg.num_heads)
        k_cache = _write_tiled_column(bcache["self"]["k"], k, step)
        v_cache = _write_tiled_column(bcache["self"]["v"], v, step)

        attn = decode_attention(
            q, k_cache, v_cache, n_valid_self, key_valid,
            scale=1.0 / (head_dim ** 0.5), use_pallas=use_pallas,
        )
        attn = attn.reshape(batch, 1, cfg.num_heads * head_dim) @ mha["projection_kernel"]
        x = layer_norm(block["masked_mhsa"]["ln"], x + attn)

        cmha = block["cross_attention"]["mha"]
        qc = _rope_step(_project_heads(x, cmha["query_kernel"], cfg.num_heads), step, inv_freq, rot_dim)
        if cross_q_uniform is not None:
            qc = jnp.where(cross_q_uniform[:, None, None], 0.0, qc)
        cross = decode_attention(
            qc, bcache["cross"]["k"], bcache["cross"]["v"], cross_n_valid,
            cross_key_valid, scale=1.0 / (head_dim ** 0.5), use_pallas=use_pallas,
        )
        cross = cross.reshape(batch, 1, cfg.num_heads * head_dim) @ cmha["projection_kernel"]
        x = layer_norm(block["cross_attention"]["ln"], x + cross)

        x = ffn_module_apply(block["ffn"], x, cfg.activation)
        new_blocks.append(
            {"self": {"k": k_cache, "v": v_cache}, "cross": bcache["cross"]}
        )
    return x, {"blocks": new_blocks}
