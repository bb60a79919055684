"""Transducer prediction and joint networks.

Functional rework of src/models/conformer/decoder.py:10-208:

* ``TransducerPrediction``: embedding → dropout → N× (LSTM/GRU → optional LN
  → optional projection), with a one-step stateful path for greedy decode.
  (The reference's layer loop returns INSIDE the loop so only the first RNN
  ever runs for num_rnns>1 — SURVEY §8.7; we run all layers.)
* ``TransducerJoint``: pre-joint linears on both streams → broadcast
  add/concat/mul to ``[B, T, U, joint]`` → activation → vocab linear.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.ops.attention import dropout
from telugu_asr_tpu.ops.initializers import embedding_uniform
from telugu_asr_tpu.ops.mlp import dense_apply, dense_init, get_activation
from telugu_asr_tpu.ops.norm import layer_norm, layer_norm_init
from telugu_asr_tpu.ops.rnn import gru_apply, gru_init, gru_step, lstm_apply, lstm_init, lstm_step

__all__ = [
    "PredictionConfig",
    "prediction_init",
    "prediction_apply",
    "prediction_init_state",
    "prediction_step",
    "JointConfig",
    "joint_init",
    "joint_apply",
]


@dataclasses.dataclass(frozen=True)
class PredictionConfig:
    vocab_size: int = 241
    embed_dim: int = 320
    embed_dropout: float = 0.0
    num_rnns: int = 1
    rnn_units: int = 320
    rnn_type: str = "lstm"
    layer_norm: bool = True
    projection_units: int = 0


def prediction_init(key: jax.Array, cfg: PredictionConfig) -> dict:
    kemb, *krnns = jax.random.split(key, cfg.num_rnns + 1)
    layers = []
    in_dim = cfg.embed_dim
    for kr in krnns:
        k1, k2 = jax.random.split(kr)
        init_fn = lstm_init if cfg.rnn_type == "lstm" else gru_init
        layer = {"rnn": init_fn(k1, in_dim, cfg.rnn_units)}
        out_dim = cfg.rnn_units
        if cfg.layer_norm:
            layer["ln"] = layer_norm_init(out_dim)
        if cfg.projection_units > 0:
            layer["projection"] = dense_init(k2, out_dim, cfg.projection_units)
            out_dim = cfg.projection_units
        layers.append(layer)
        in_dim = out_dim
    return {
        "embedding": {"table": embedding_uniform(kemb, (cfg.vocab_size, cfg.embed_dim))},
        "layers": layers,
    }


def _apply_rnn_layer(cfg, layer, x, mask, initial_state):
    apply_fn = lstm_apply if cfg.rnn_type == "lstm" else gru_apply
    out, final_state = apply_fn(layer["rnn"], x, mask=mask, initial_state=initial_state)
    if "ln" in layer:
        out = layer_norm(layer["ln"], out)
    if "projection" in layer:
        out = dense_apply(layer["projection"], out)
    return out, final_state


def prediction_apply(
    params: dict,
    cfg: PredictionConfig,
    tokens: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """``[B, U]`` blank-prepended tokens → ``[B, U, out]``."""
    x = params["embedding"]["table"][tokens]
    if rng is not None and training:
        x = dropout(rng, cfg.embed_dropout, x, deterministic=False)
    mask = None
    if lengths is not None:
        mask = jnp.arange(tokens.shape[1])[None, :] < lengths[:, None]
    for layer in params["layers"]:
        x, _ = _apply_rnn_layer(cfg, layer, x, mask, None)
    return x


def prediction_init_state(cfg: PredictionConfig, batch: int) -> List:
    """Zero states, one entry per RNN layer (decoder.py:68-72)."""
    states = []
    for _ in range(cfg.num_rnns):
        if cfg.rnn_type == "lstm":
            states.append(
                (jnp.zeros((batch, cfg.rnn_units)), jnp.zeros((batch, cfg.rnn_units)))
            )
        else:
            states.append(jnp.zeros((batch, cfg.rnn_units)))
    return states


def prediction_step(
    params: dict, cfg: PredictionConfig, token: jnp.ndarray, states: List
) -> Tuple[jnp.ndarray, List]:
    """One-token step (decoder.py:88-100): ``token [B]`` → (``[B, out]``, new states)."""
    x = params["embedding"]["table"][token]
    new_states = []
    for layer, state in zip(params["layers"], states):
        if cfg.rnn_type == "lstm":
            state_new, out = lstm_step(layer["rnn"], state, x)
        else:
            state_new, out = gru_step(layer["rnn"], state, x)
        if "ln" in layer:
            out = layer_norm(layer["ln"], out)
        if "projection" in layer:
            out = dense_apply(layer["projection"], out)
        new_states.append(state_new)
        x = out
    return x, new_states


@dataclasses.dataclass(frozen=True)
class JointConfig:
    vocab_size: int = 241
    joint_dim: int = 320
    activation: str = "tanh"
    prejoint_linear: bool = True
    postjoint_linear: bool = False
    joint_mode: str = "add"


def joint_init(key: jax.Array, cfg: JointConfig, enc_dim: int, pred_dim: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {}
    merged = cfg.joint_dim
    if cfg.prejoint_linear:
        params["ffn_enc"] = dense_init(k1, enc_dim, cfg.joint_dim)
        params["ffn_pred"] = dense_init(k2, pred_dim, cfg.joint_dim)
    else:
        merged = enc_dim
    if cfg.joint_mode == "concat":
        merged = merged * 2
    if cfg.postjoint_linear:
        params["ffn"] = dense_init(k4, merged, cfg.joint_dim)
        merged = cfg.joint_dim
    params["ffn_out"] = dense_init(k3, merged, cfg.vocab_size)
    return params


def joint_apply(
    params: dict, cfg: JointConfig, enc_out: jnp.ndarray, pred_out: jnp.ndarray
) -> jnp.ndarray:
    """``[B, T, De] × [B, U, Dp]`` → ``[B, T, U, vocab]`` (decoder.py:189-203).

    Also accepts rank-2 per-step inputs ``[B, De] × [B, Dp]`` → ``[B, vocab]``.
    """
    if cfg.prejoint_linear:
        enc_out = dense_apply(params["ffn_enc"], enc_out)
        pred_out = dense_apply(params["ffn_pred"], pred_out)
    if enc_out.ndim == 3:
        enc_out = enc_out[:, :, None, :]
        pred_out = pred_out[:, None, :, :]
    if cfg.joint_mode == "add":
        x = enc_out + pred_out
    elif cfg.joint_mode == "mul":
        x = enc_out * pred_out
    elif cfg.joint_mode == "concat":
        x = jnp.concatenate(jnp.broadcast_arrays(enc_out, pred_out), axis=-1)
    else:
        raise ValueError(f"joint_mode must be add/concat/mul, got {cfg.joint_mode}")
    if cfg.postjoint_linear:
        x = dense_apply(params["ffn"], x)
    x = get_activation(cfg.activation)(x)
    return dense_apply(params["ffn_out"], x)
