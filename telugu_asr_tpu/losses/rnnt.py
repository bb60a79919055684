"""RNN-T (transducer) loss — log-space forward/backward with analytic
gradients via ``jax.custom_vjp``.

Capability parity with the reference's from-scratch implementation
(src/losses/rnnt_loss.py:10-441: diagonal-wavefront ``tf.scan`` +
hand-assembled gradient scatter + ``tf.custom_gradient``), but the algorithm
is redesigned for TPU rather than transcribed:

* The reference marches anti-diagonals (T+U-1 sequential steps) after an
  elaborate ``matrix_diag_part_v2`` re-indexing.  Here the forward recursion
  runs as a ``lax.scan`` over TIME only (T sequential steps): within a time
  row, the label-direction recurrence
  ``alpha[t,u] = logaddexp(base[u], alpha[t,u-1] + truth[t,u-1])`` is an
  associative log-prefix sum, computed with ``lax.associative_scan`` in
  O(log U) depth.  Fewer sequential steps, no gather/scatter re-indexing,
  everything stays in dense [B, U+1] registers.
* Gradients are the standard occupancy posteriors (Graves 2012, eqs. 16-20 —
  the same math the reference assembles by scatter):
  ``dL/d lp_blank[t,u] = -exp(alpha[t,u] + beta_next + blank[t,u] - logZ)``
  etc., chained through log-softmax analytically — no autodiff through the
  scans, matching the reference's custom-gradient design via
  ``jax.custom_vjp``.

Shapes: ``logits [B, T, U+1, V]``, ``labels [B, U]``, lengths per batch.
Blank id = 0 (reference tokenizer convention, src/tokenizer.py:26).
Validated against brute-force path enumeration and finite differences
(tests/test_rnnt_loss.py).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["rnnt_loss", "RnntLossConfig"]

LOG_EPS = -1e30  # practical -inf that stays NaN-free under arithmetic


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mx = jnp.maximum(mx, LOG_EPS)  # both -inf → stay at LOG_EPS
    return mx + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx))


def _log_prefix_combine(x, y):
    """Associative combine for y ∘ x over (add, mul) in log space.

    Elements are pairs (a, g): running value a, accumulated gain g, with
    semantics value_new = logaddexp(y.a, x.a + y.g), gain_new = x.g + y.g.
    """
    ax, gx = x
    ay, gy = y
    return _logaddexp(ay, ax + gy), gx + gy


def _log_prefix_scan(base: jnp.ndarray, gain: jnp.ndarray) -> jnp.ndarray:
    """Solve ``out[u] = logaddexp(base[u], out[u-1] + gain[u])`` along axis -1."""
    return jax.lax.associative_scan(_log_prefix_combine, (base, gain), axis=-1)[0]


def _forward_alpha(blank: jnp.ndarray, truth: jnp.ndarray) -> jnp.ndarray:
    """alpha over the full lattice.

    blank ``[B, T, U+1]``: log P(emit blank at (t, u));
    truth ``[B, T, U]``:   log P(emit label u+1 at (t, u)).
    Returns alpha ``[B, T, U+1]`` with alpha[0,0] = 0.
    """
    b, t, u1 = blank.shape
    # gain[u] = truth[u-1] (cost of arriving from the left), gain[0] unused
    gain = jnp.concatenate([jnp.full((b, t, 1), LOG_EPS), truth], axis=-1)

    def row(alpha_prev, xs):
        blank_prev, gain_t = xs
        # arrival from below (t-1, u) via blank
        base = alpha_prev + blank_prev
        alpha_t = _log_prefix_scan(base, gain_t)
        return alpha_t, alpha_t

    # first row: only left-moves from (0,0)
    init = jnp.full((b, u1), LOG_EPS).at[:, 0].set(0.0)
    alpha0 = _log_prefix_scan(init, gain[:, 0])
    if t == 1:
        return alpha0[:, None, :]
    _, rows = jax.lax.scan(
        row,
        alpha0,
        (jnp.swapaxes(blank[:, :-1], 0, 1), jnp.swapaxes(gain[:, 1:], 0, 1)),
    )
    return jnp.concatenate([alpha0[:, None], jnp.swapaxes(rows, 0, 1)], axis=1)


def _backward_beta(
    blank: jnp.ndarray, truth: jnp.ndarray, logit_lengths: jnp.ndarray, label_lengths: jnp.ndarray
) -> jnp.ndarray:
    """beta[t,u] = log P(complete from (t,u)), including the final blank.

    Masking: positions beyond (logit_length, label_length) carry LOG_EPS; the
    terminal state (T_b-1, U_b) seeds ``blank`` there.
    """
    b, t, u1 = blank.shape
    u = u1 - 1
    cols = jnp.arange(u1)[None, :]

    # Per-row reversed prefix scan: beta[t,u] = logaddexp(down[u], beta[t,u+1]+truth[t,u])
    def row_rev(beta_next_row, xs):
        blank_t, truth_t, t_idx = xs
        # down-move value: blank into the next time row (or terminal seed)
        down = blank_t + beta_next_row
        # terminal: at (logit_len-1, label_len) the blank completes the path
        is_terminal = (t_idx == logit_lengths - 1)[:, None] & (cols == label_lengths[:, None])
        down = jnp.where(is_terminal, blank_t, down)
        gain = jnp.concatenate([truth_t, jnp.full((b, 1), LOG_EPS)], axis=-1)
        rev = lambda x: jnp.flip(x, axis=-1)
        beta_t = rev(_log_prefix_scan(rev(down), rev(gain)))
        # beyond valid region → impossible
        valid = (cols <= label_lengths[:, None]) & (t_idx < logit_lengths)[:, None]
        beta_t = jnp.where(valid, beta_t, LOG_EPS)
        return beta_t, beta_t

    init = jnp.full((b, u1), LOG_EPS)
    _, rows = jax.lax.scan(
        row_rev,
        init,
        (
            jnp.swapaxes(blank, 0, 1),
            jnp.swapaxes(truth, 0, 1),
            jnp.arange(t),
        ),
        reverse=True,
    )
    return jnp.swapaxes(rows, 0, 1)


def _transition_log_probs(
    logits: jnp.ndarray, labels: jnp.ndarray, blank_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank = lp[..., blank_id]  # [B, T, U+1]
    # truth[b, t, u] = lp[b, t, u, labels[b, u]]
    truth = jnp.take_along_axis(
        lp[:, :, :-1, :], labels[:, None, :, None], axis=-1
    )[..., 0]
    return lp, blank, truth


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def rnnt_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Negative log-likelihood per example, ``[B]``."""
    loss, _ = _rnnt_fwd_impl(logits, labels, logit_lengths, label_lengths, blank_id)
    return loss


def _rnnt_fwd_impl(logits, labels, logit_lengths, label_lengths, blank_id):
    lp, blank, truth = _transition_log_probs(logits, labels, blank_id)
    b, t, u1 = blank.shape
    cols = jnp.arange(u1)[None, :]
    # mask invalid truth transitions (u >= label_length)
    truth = jnp.where(
        cols[:, : u1 - 1][:, None, :] < label_lengths[:, None, None], truth, LOG_EPS
    )
    alpha = _forward_alpha(blank, truth)
    # logZ = alpha[T-1, U] + blank[T-1, U] at each example's true lengths.
    # Rows with logit_length == 0 (DP batch padding) get zero loss — a
    # negative index would otherwise wrap to the last row.
    idx_b = jnp.arange(b)
    t_idx = jnp.maximum(logit_lengths - 1, 0)
    alpha_term = alpha[idx_b, t_idx, label_lengths]
    blank_term = blank[idx_b, t_idx, label_lengths]
    log_z = alpha_term + blank_term
    loss = jnp.where(logit_lengths > 0, -log_z, 0.0)
    return loss, (lp, blank, truth, alpha, log_z)


def _rnnt_fwd(logits, labels, logit_lengths, label_lengths, blank_id):
    loss, (lp, blank, truth, alpha, log_z) = _rnnt_fwd_impl(
        logits, labels, logit_lengths, label_lengths, blank_id
    )
    residuals = (lp, blank, truth, alpha, log_z, labels, logit_lengths, label_lengths)
    return loss, residuals


def _rnnt_bwd(blank_id, residuals, g):
    lp, blank, truth, alpha, log_z, labels, logit_lengths, label_lengths = residuals
    b, t, u1 = blank.shape
    u = u1 - 1
    beta = _backward_beta(blank, truth, logit_lengths, label_lengths)

    rows_t = jnp.arange(t)[None, :, None]
    cols_u = jnp.arange(u1)[None, None, :]
    valid = (rows_t < logit_lengths[:, None, None]) & (cols_u <= label_lengths[:, None, None])

    # occupancy of the blank transition out of (t, u):
    #   t < T-1: alpha + blank + beta[t+1, u] - logZ
    #   terminal (T-1, U): alpha + blank - logZ
    beta_down = jnp.concatenate([beta[:, 1:], jnp.full((b, 1, u1), LOG_EPS)], axis=1)
    is_terminal = (rows_t == (logit_lengths - 1)[:, None, None]) & (
        cols_u == label_lengths[:, None, None]
    )
    beta_down = jnp.where(is_terminal, 0.0, beta_down)
    occ_blank = jnp.exp(
        jnp.clip(alpha + blank + beta_down - log_z[:, None, None], LOG_EPS, 0.0)
    )
    occ_blank = jnp.where(valid, occ_blank, 0.0)

    # occupancy of the truth transition out of (t, u), u < U
    beta_right = beta[:, :, 1:]
    occ_truth = jnp.exp(
        jnp.clip(alpha[:, :, :-1] + truth + beta_right - log_z[:, None, None], LOG_EPS, 0.0)
    )
    occ_truth = jnp.where(valid[:, :, :-1] & (cols_u[..., : u] < label_lengths[:, None, None]), occ_truth, 0.0)

    # dL/d lp = -(occupancies scattered over vocab); chain through log-softmax:
    # dL/d logits = dL/dlp - softmax * sum_k dL/dlp_k
    grad_lp = jnp.zeros(lp.shape, jnp.float32)
    grad_lp = grad_lp.at[..., blank_id].add(-occ_blank)
    pad_truth = jnp.concatenate([occ_truth, jnp.zeros((b, t, 1))], axis=2)
    label_idx = jnp.concatenate([labels, jnp.zeros((b, 1), labels.dtype)], axis=1)
    grad_lp = grad_lp.at[
        jnp.arange(b)[:, None, None],
        jnp.arange(t)[None, :, None],
        jnp.arange(u1)[None, None, :],
        label_idx[:, None, :],
    ].add(-pad_truth)

    probs = jnp.exp(lp)
    grad_logits = grad_lp - probs * jnp.sum(grad_lp, axis=-1, keepdims=True)
    grad_logits = grad_logits * g[:, None, None, None]
    return (grad_logits.astype(jnp.float32), None, None, None)


rnnt_loss.defvjp(_rnnt_fwd, _rnnt_bwd)


class RnntLossConfig:
    """Loss wrapper with global-batch DP scaling (rnnt_loss.py:20-39)."""

    def __init__(self, blank_id: int = 0, global_batch_size: int | None = None):
        self.blank_id = blank_id
        self.global_batch_size = global_batch_size

    def __call__(self, logits, labels, logit_lengths, label_lengths):
        per_example = rnnt_loss(
            logits, labels, logit_lengths, label_lengths, self.blank_id
        )
        if self.global_batch_size is None:
            return per_example
        return jnp.sum(per_example) / jnp.asarray(self.global_batch_size, jnp.float32)
