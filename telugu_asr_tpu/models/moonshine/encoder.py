"""Moonshine encoder: Conv1D subsampling front-end + post-norm MHSA/FFN blocks.

Functional rework of src/models/moonshine/encoder.py:10-268.  The reference
stashes the subsampled padding mask on ``self.encoder_input_padding_mask``
(:235-239) as side state for the decoder's cross-attention; here it is an
explicit return value (SURVEY §7.4.5).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.ops.attention import mhsa_module_apply, mhsa_module_init
from telugu_asr_tpu.ops.conv import (
    conv1d_subsampling_apply,
    conv1d_subsampling_init,
    conv1d_subsampled_length,
)
from telugu_asr_tpu.ops.mlp import ffn_module_apply, ffn_module_init

__all__ = ["EncoderConfig", "encoder_init", "encoder_apply"]


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    d_model: int = 192
    num_blocks: int = 4
    num_heads: int = 6
    head_dim: int = 32
    activation: str = "gelu"
    fc_factor: int = 1
    dropout: float = 0.1
    in_channels: int = 80
    sub_kernel_size: tuple = (9, 9, 9)
    sub_strides: tuple = (2, 2, 2)
    sub_padding: tuple = ("valid", "valid", "valid")
    sub_activations: tuple = ("gelu", "gelu", "gelu")


def encoder_init(key: jax.Array, cfg: EncoderConfig) -> dict:
    ksub, *kblocks = jax.random.split(key, cfg.num_blocks + 1)
    blocks = []
    for kb in kblocks:
        km, kf = jax.random.split(kb)
        blocks.append(
            {
                "mhsa": mhsa_module_init(km, cfg.d_model, cfg.num_heads, cfg.head_dim),
                "ffn": ffn_module_init(kf, cfg.d_model, cfg.fc_factor, cfg.activation),
            }
        )
    return {
        "subsampling": conv1d_subsampling_init(
            ksub, cfg.d_model, cfg.in_channels, cfg.sub_kernel_size
        ),
        "blocks": blocks,
    }


def encoder_apply(
    params: dict,
    cfg: EncoderConfig,
    features: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``([B, T, 80], [B])`` → ``(encoder_out [B, T', d], padding_mask [B, T'])``."""
    x, out_lengths = conv1d_subsampling_apply(
        params["subsampling"],
        features,
        lengths,
        kernel_size=cfg.sub_kernel_size,
        strides=cfg.sub_strides,
        padding=cfg.sub_padding,
        activations=cfg.sub_activations,
    )
    out_lengths = jnp.maximum(out_lengths, 0)  # audio shorter than receptive field
    padding_mask = jnp.arange(x.shape[1])[None, :] < out_lengths[:, None]
    for i, block in enumerate(params["blocks"]):
        km = kf = None
        if rng is not None and not deterministic:
            km, kf = jax.random.split(jax.random.fold_in(rng, i))
        x = mhsa_module_apply(
            block["mhsa"],
            x,
            cfg.num_heads,
            padding_mask=padding_mask,
            dropout_rate=cfg.dropout,
            dropout_key=km,
            deterministic=deterministic,
        )
        x = ffn_module_apply(
            block["ffn"],
            x,
            cfg.activation,
            dropout_rate=cfg.dropout,
            dropout_key=kf,
            deterministic=deterministic,
        )
    return x, padding_mask


def encoder_output_length(cfg: EncoderConfig, length):
    return conv1d_subsampled_length(
        length, cfg.sub_kernel_size, cfg.sub_strides, cfg.sub_padding
    )
