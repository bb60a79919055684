"""Conformer encoder: Conv2D subsampling → linear → sinusoidal PE →
N× (FF½ → rel-pos MHSA → ConvModule → FF½ → LN).

Functional rework of src/models/conformer/encoder.py:9-344.  BatchNorm
running statistics are explicit state threaded through ``apply`` (the only
stateful piece in either model family).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.ops.attention import dropout, mhsa_module_apply, mhsa_module_init
from telugu_asr_tpu.ops.conv import (
    conv2d_subsampling_apply,
    conv2d_subsampling_init,
    conv_module_apply,
    conv_module_init,
)
from telugu_asr_tpu.ops.mlp import conformer_ff_apply, conformer_ff_init, dense_apply, dense_init
from telugu_asr_tpu.ops.norm import layer_norm, layer_norm_init

__all__ = ["ConformerEncoderConfig", "conformer_encoder_init", "conformer_encoder_apply"]


def sinusoid_position_encoding(max_len: int, dmodel: int) -> np.ndarray:
    """Reference PE table (positional_encoding.py:117-150): positions run in
    REVERSE order (max_len-1 … 0) and sin/cos are interleaved pairwise."""
    pos = np.arange(max_len - 1, -1.0, -1.0, dtype=np.float32)[:, None]
    index = np.arange(0, dmodel, dtype=np.float32)[None, :]
    pe = pos * (1.0 / np.power(10000.0, (2 * (index // 2)) / dmodel))
    sin = np.sin(pe[:, 0::2])[:, :, None]
    cos = np.cos(pe[:, 1::2])[:, :, None]
    out = np.concatenate([sin, cos], axis=-1).reshape(max_len, dmodel)
    return out[None].astype(np.float32)


@dataclasses.dataclass(frozen=True)
class ConformerEncoderConfig:
    d_model: int = 144
    num_blocks: int = 16
    num_heads: int = 4
    head_dim: int = 36
    attention_type: str = "relmha"
    kernel_size: int = 31  # depthwise conv module kernel
    fc_factor: float = 0.5
    dropout: float = 0.1
    num_feature_bins: int = 80
    sub_filters: int = 144
    sub_kernel_size: int = 3
    sub_stride: int = 2


def conformer_encoder_init(key: jax.Array, cfg: ConformerEncoderConfig) -> Tuple[dict, dict]:
    """Returns (params, batchnorm state)."""
    ksub, klin, *kblocks = jax.random.split(key, cfg.num_blocks + 2)
    merged_dim = (cfg.num_feature_bins // (cfg.sub_stride ** 2)) * cfg.sub_filters
    blocks, bn_states = [], []
    for kb in kblocks:
        k1, k2, k3, k4 = jax.random.split(kb, 4)
        conv_params, bn_state = conv_module_init(k3, cfg.d_model, cfg.kernel_size)
        blocks.append(
            {
                "ffm1": conformer_ff_init(k1, cfg.d_model),
                "mhsa": mhsa_module_init(
                    k2, cfg.d_model, cfg.num_heads, cfg.head_dim, cfg.attention_type
                ),
                "conv": conv_params,
                "ffm2": conformer_ff_init(k4, cfg.d_model),
                "ln": layer_norm_init(cfg.d_model),
            }
        )
        bn_states.append(bn_state)
    params = {
        "subsampling": conv2d_subsampling_init(ksub, cfg.sub_filters, cfg.sub_kernel_size),
        "linear": dense_init(klin, merged_dim, cfg.d_model),
        "blocks": blocks,
    }
    return params, {"blocks": bn_states}


def conformer_encoder_apply(
    params: dict,
    bn_state: dict,
    cfg: ConformerEncoderConfig,
    features: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """``([B, T, F], [B])`` → ``(out [B, T', d], lengths' [B], new bn state)``."""
    x = features[..., None]  # [B, T, F, 1]
    x, out_lengths = conv2d_subsampling_apply(
        params["subsampling"], x, lengths, stride=cfg.sub_stride
    )
    x = dense_apply(params["linear"], x)
    pe = jnp.asarray(sinusoid_position_encoding(x.shape[1], cfg.d_model))
    deterministic = not training
    if rng is not None and training:
        rng, kdo = jax.random.split(rng)
        x = dropout(kdo, cfg.dropout, x, deterministic)

    out_lengths = jnp.maximum(out_lengths, 0)
    pad_mask = jnp.arange(x.shape[1])[None, :] < out_lengths[:, None]

    new_bn = []
    for i, block in enumerate(params["blocks"]):
        keys = [None] * 4
        if rng is not None and training:
            keys = list(jax.random.split(jax.random.fold_in(rng, i), 4))
        x = conformer_ff_apply(
            block["ffm1"], x, cfg.fc_factor,
            dropout_rate=cfg.dropout, dropout_key=keys[0], deterministic=deterministic,
        )
        x = mhsa_module_apply(
            block["mhsa"], x, cfg.num_heads,
            attention_type=cfg.attention_type, pos=pe,
            padding_mask=pad_mask,
            dropout_rate=cfg.dropout, dropout_key=keys[1], deterministic=deterministic,
        )
        x, bns = conv_module_apply(
            block["conv"], bn_state["blocks"][i], x,
            training=training, pad_mask=pad_mask,
            dropout_rate=cfg.dropout, dropout_key=keys[2],
        )
        new_bn.append(bns)
        x = conformer_ff_apply(
            block["ffm2"], x, cfg.fc_factor,
            dropout_rate=cfg.dropout, dropout_key=keys[3], deterministic=deterministic,
        )
        x = layer_norm(block["ln"], x)
    return x, out_lengths, {"blocks": new_bn}
