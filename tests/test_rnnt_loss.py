"""RNN-T loss: brute-force path-enumeration check + finite-difference grads
(the validation SURVEY §7.4.2 prescribes)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telugu_asr_tpu.losses.rnnt import RnntLossConfig, rnnt_loss


def brute_force_nll(log_probs, labels, T, U):
    """Enumerate every monotone alignment explicitly (prob domain, float64).

    An alignment is an order of T-1 blank moves and U label moves, followed by
    the mandatory final blank at (T-1, U).
    """
    total = 0.0
    for path in set(itertools.permutations(["b"] * (T - 1) + ["l"] * U)):
        t = u = 0
        logp = 0.0
        for move in path:
            if move == "b":
                logp += log_probs[t, u, 0]
                t += 1
            else:
                logp += log_probs[t, u, labels[u]]
                u += 1
        logp += log_probs[T - 1, U, 0]  # final blank
        total += np.exp(logp)
    return -np.log(total)


def make_case(T, U, V, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((1, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(1, U)).astype(np.int32)
    return logits, labels


@pytest.mark.parametrize("T,U,V", [(2, 1, 3), (3, 2, 4), (4, 3, 5), (5, 2, 6)])
def test_loss_matches_brute_force(T, U, V):
    logits, labels = make_case(T, U, V, seed=T * 10 + U)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))[0]
    expected = brute_force_nll(lp.astype(np.float64), labels[0], T, U)
    loss = rnnt_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray([T], jnp.int32), jnp.asarray([U], jnp.int32),
    )
    np.testing.assert_allclose(float(loss[0]), expected, rtol=1e-4)


def test_length_masking():
    """Padding in T or U must not change the loss."""
    T, U, V = 4, 2, 5
    logits, labels = make_case(T, U, V, seed=3)
    base = rnnt_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray([T], jnp.int32), jnp.asarray([U], jnp.int32),
    )
    # pad T and U with garbage
    rng = np.random.default_rng(9)
    logits_pad = np.concatenate([logits, rng.standard_normal((1, 2, U + 1, V)).astype(np.float32)], axis=1)
    logits_pad = np.concatenate(
        [logits_pad, rng.standard_normal((1, T + 2, 2, V)).astype(np.float32)], axis=2
    )
    labels_pad = np.concatenate([labels, np.full((1, 2), 3, np.int32)], axis=1)
    padded = rnnt_loss(
        jnp.asarray(logits_pad), jnp.asarray(labels_pad),
        jnp.asarray([T], jnp.int32), jnp.asarray([U], jnp.int32),
    )
    np.testing.assert_allclose(float(padded[0]), float(base[0]), rtol=1e-5)


def test_gradients_finite_difference():
    T, U, V = 3, 2, 4
    logits, labels = make_case(T, U, V, seed=5)
    lengths_t = jnp.asarray([T], jnp.int32)
    lengths_u = jnp.asarray([U], jnp.int32)

    def f(x):
        return jnp.sum(rnnt_loss(x, jnp.asarray(labels), lengths_t, lengths_u))

    grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    eps = 1e-3
    rng = np.random.default_rng(0)
    for _ in range(12):
        t = rng.integers(0, T)
        u = rng.integers(0, U + 1)
        v = rng.integers(0, V)
        dp = logits.copy()
        dm = logits.copy()
        dp[0, t, u, v] += eps
        dm[0, t, u, v] -= eps
        fd = (float(f(jnp.asarray(dp))) - float(f(jnp.asarray(dm)))) / (2 * eps)
        np.testing.assert_allclose(grad[0, t, u, v], fd, atol=2e-3)


def test_gradients_zero_outside_valid_region():
    # logits padded to (T+1, U+2) label slots; labels padded to U_max = U+1
    T, U, V = 3, 1, 4
    logits, labels = make_case(T + 1, U + 1, V, seed=7)

    def f(x):
        return jnp.sum(
            rnnt_loss(x, jnp.asarray(labels), jnp.asarray([T], jnp.int32), jnp.asarray([U], jnp.int32))
        )

    grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    assert np.all(grad[0, T:, :, :] == 0)
    assert np.all(grad[0, :, U + 1 :, :] == 0)


def test_batched_and_scaled():
    T, U, V = 4, 2, 5
    l1, lab1 = make_case(T, U, V, seed=1)
    l2, lab2 = make_case(T, U, V, seed=2)
    logits = np.concatenate([l1, l2], axis=0)
    labels = np.concatenate([lab1, lab2], axis=0)
    per = rnnt_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray([T, T], jnp.int32), jnp.asarray([U, U], jnp.int32),
    )
    single1 = rnnt_loss(jnp.asarray(l1), jnp.asarray(lab1), jnp.asarray([T], jnp.int32), jnp.asarray([U], jnp.int32))
    np.testing.assert_allclose(float(per[0]), float(single1[0]), rtol=1e-5)
    loss_fn = RnntLossConfig(blank_id=0, global_batch_size=4)
    scaled = loss_fn(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray([T, T], jnp.int32), jnp.asarray([U, U], jnp.int32))
    np.testing.assert_allclose(float(scaled), float(jnp.sum(per)) / 4, rtol=1e-6)


def test_jit_compatible():
    T, U, V = 4, 2, 5
    logits, labels = make_case(T, U, V)

    @jax.jit
    def f(x, y, lt, lu):
        return rnnt_loss(x, y, lt, lu)

    out = f(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray([T], jnp.int32), jnp.asarray([U], jnp.int32))
    assert np.isfinite(float(out[0]))


def test_zero_length_rows_contribute_nothing():
    """DP batch-padding rows (logit_length 0) must give zero loss and grads."""
    T, U, V = 4, 2, 5
    l1, lab1 = make_case(T, U, V, seed=11)
    logits = np.concatenate([l1, l1], axis=0)
    labels = np.concatenate([lab1, lab1], axis=0)
    lt = jnp.asarray([T, 0], jnp.int32)
    lu = jnp.asarray([U, 0], jnp.int32)

    def f(x):
        return rnnt_loss(x, jnp.asarray(labels), lt, lu)

    loss = f(jnp.asarray(logits))
    single = rnnt_loss(jnp.asarray(l1), jnp.asarray(lab1), jnp.asarray([T], jnp.int32), jnp.asarray([U], jnp.int32))
    np.testing.assert_allclose(float(loss[0]), float(single[0]), rtol=1e-5)
    assert float(loss[1]) == 0.0
    grad = np.asarray(jax.grad(lambda x: jnp.sum(f(x)))(jnp.asarray(logits)))
    assert np.all(grad[1] == 0.0)
    assert np.any(grad[0] != 0.0)
