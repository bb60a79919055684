"""Batched beam search for the RNN-T transducer family.

Capability extension over the reference (greedy-only transducer decode,
conformer/model.py:127-248).  Frame-synchronous beam search with the same
one-symbol-per-frame semantics as the greedy decoder: at each encoder frame
every beam either STAYS (emits blank) or ADVANCES with one of its top
non-blank tokens; the per-utterance beam pool is pruned to K by total
log-probability.  No prefix merging (hypotheses that reach the same label
sequence by different alignments stay distinct) — the standard "simple beam"
trade-off.

All beams fold into the batch dimension for the prediction-net step and the
joint, so the whole search is one ``lax.scan`` over time frames; beam
reordering gathers LSTM states per step.  ``beam_size=1`` reduces exactly to
the greedy decoder (tested).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from telugu_asr_tpu.models.conformer.decoder import (
    joint_apply,
    prediction_init_state,
    prediction_step,
)

__all__ = ["transducer_beam_search"]

NEG_INF = -1e9


@partial(jax.jit, static_argnames=("model", "beam_size", "max_symbols"))
def transducer_beam_search(
    model,
    params: dict,
    encoder_out: jnp.ndarray,
    encoder_lengths: jnp.ndarray,
    *,
    beam_size: int = 4,
    max_symbols: int = 200,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(labels [B, max_symbols], counts [B])`` for the best beam."""
    cfg = model.cfg
    blank = cfg.blank_id
    batch, t_max, _ = encoder_out.shape
    k = beam_size
    flat = batch * k

    # initial prediction-net output for the blank start token, tiled to beams
    init_states = prediction_init_state(cfg.prediction, flat)
    init_token = jnp.full((flat,), blank, jnp.int32)
    pred_out0, states0 = prediction_step(
        params["prediction"], cfg.prediction, init_token, init_states
    )

    tokens0 = jnp.full((flat, max_symbols), blank, jnp.int32)
    counts0 = jnp.zeros((flat,), jnp.int32)
    last0 = jnp.full((flat,), blank, jnp.int32)
    # only beam 0 live initially
    scores0 = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1)), (batch,))

    def step(carry, xs):
        tokens, counts, last, scores, pred_out, states = carry
        enc_t, t_idx = xs  # enc_t: [B, d]
        in_range = (t_idx < encoder_lengths)[:, None]  # [B, 1]

        enc_flat = jnp.repeat(enc_t, k, axis=0)  # [flat, d]
        ytu = jax.nn.log_softmax(
            joint_apply(params["joint"], cfg.joint, enc_flat, pred_out).astype(jnp.float32),
            axis=-1,
        )  # [flat, V]
        vocab = ytu.shape[-1]
        ytu = ytu.reshape(batch, k, vocab)

        stay_scores = scores.reshape(batch, k) + jnp.where(
            in_range, ytu[..., blank], 0.0
        )  # [B, K]
        # top non-blank per beam
        label_logp = ytu.at[..., blank].set(NEG_INF)
        top_logp, top_tok = jax.lax.top_k(label_logp, k)  # [B, K, K]
        # beams at full symbol budget cannot advance
        can_advance = in_range & (counts.reshape(batch, k) < max_symbols)
        adv_scores = scores.reshape(batch, k)[..., None] + jnp.where(
            can_advance[..., None], top_logp, NEG_INF
        )  # [B, K, K]

        # candidate pool: K stays + K*K advances
        cand_scores = jnp.concatenate(
            [stay_scores, adv_scores.reshape(batch, k * k)], axis=-1
        )  # [B, K + K*K]
        new_scores, cand_idx = jax.lax.top_k(cand_scores, k)  # [B, K]
        is_stay = cand_idx < k
        src_beam = jnp.where(is_stay, cand_idx, (cand_idx - k) // k)  # [B, K]
        which_tok = jnp.where(is_stay, 0, (cand_idx - k) % k)
        src_toks = jnp.take_along_axis(
            top_tok, src_beam[..., None], axis=1
        )  # [B, K, K]: row k holds source beam k's top-K tokens
        new_tok = jnp.take_along_axis(src_toks, which_tok[..., None], axis=2)[..., 0]

        parent = (jnp.arange(batch)[:, None] * k + src_beam).reshape(flat)
        advanced = (~is_stay).reshape(flat)
        new_tok_flat = new_tok.reshape(flat)

        tokens = tokens[parent]
        counts_p = counts[parent]
        pos_mask = jnp.arange(max_symbols)[None, :] == counts_p[:, None]
        tokens = jnp.where(
            advanced[:, None] & pos_mask, new_tok_flat[:, None], tokens
        )
        counts_new = counts_p + advanced.astype(jnp.int32)
        last_new = jnp.where(advanced, new_tok_flat, last[parent])

        # prediction-net step only matters for advanced beams (blank-hold)
        pred_parent = jax.tree_util.tree_map(lambda x: x[parent], (pred_out, states))
        pred_out_p, states_p = pred_parent
        stepped_out, stepped_states = prediction_step(
            params["prediction"], cfg.prediction, last_new, states_p
        )
        keep = advanced[:, None]
        pred_out_new = jnp.where(keep, stepped_out, pred_out_p)
        states_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(keep, a, b), stepped_states, states_p
        )
        return (
            tokens, counts_new, last_new, new_scores.reshape(flat),
            pred_out_new, states_new,
        ), None

    (tokens, counts, _, scores, _, _), _ = jax.lax.scan(
        step,
        (tokens0, counts0, last0, scores0, pred_out0, states0),
        (jnp.swapaxes(encoder_out, 0, 1), jnp.arange(t_max)),
    )

    tokens = tokens.reshape(batch, k, max_symbols)
    counts = counts.reshape(batch, k)
    scores = scores.reshape(batch, k)
    best = jnp.argmax(scores, axis=-1)
    idx = jnp.arange(batch)
    return tokens[idx, best], counts[idx, best]
