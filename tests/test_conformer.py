"""Conformer RNN-T family: RNN cells vs torch, shapes, decode semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telugu_asr_tpu.losses.rnnt import RnntLossConfig
from telugu_asr_tpu.models.conformer.decoder import (
    JointConfig,
    PredictionConfig,
    joint_apply,
    joint_init,
    prediction_apply,
    prediction_init,
    prediction_init_state,
    prediction_step,
)
from telugu_asr_tpu.models.conformer.encoder import sinusoid_position_encoding
from telugu_asr_tpu.models.conformer.model import Conformer, ConformerConfig
from telugu_asr_tpu.ops.rnn import lstm_apply, lstm_init


def tiny_conformer(vocab=16):
    from telugu_asr_tpu.models.conformer.encoder import ConformerEncoderConfig

    return ConformerConfig(
        vocab_size=vocab,
        d_model=16,
        encoder=ConformerEncoderConfig(
            d_model=16, num_blocks=2, num_heads=2, head_dim=8,
            kernel_size=7, num_feature_bins=8, sub_filters=4,
        ),
        prediction=PredictionConfig(vocab_size=vocab, embed_dim=8, rnn_units=12),
        joint=JointConfig(vocab_size=vocab, joint_dim=12),
    )


def test_lstm_matches_torch():
    import torch

    p = lstm_init(jax.random.PRNGKey(0), in_dim=6, units=5)
    x = np.random.default_rng(0).standard_normal((2, 7, 6)).astype(np.float32)
    ours, (h, c) = lstm_apply(p, jnp.asarray(x))

    t = torch.nn.LSTM(6, 5, batch_first=True)
    # torch gate order (i, f, g, o) matches Keras (i, f, c, o)
    t.weight_ih_l0.data = torch.from_numpy(np.asarray(p["kernel"]).T.copy())
    t.weight_hh_l0.data = torch.from_numpy(np.asarray(p["recurrent_kernel"]).T.copy())
    t.bias_ih_l0.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    t.bias_hh_l0.data = torch.zeros(20)
    with torch.no_grad():
        ref, (hr, cr) = t(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), hr[0].numpy(), atol=1e-5)


def test_lstm_mask_holds_state():
    p = lstm_init(jax.random.PRNGKey(1), in_dim=4, units=3)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 4))
    mask = jnp.asarray([[True, True, True, False, False, False]])
    out, (h, _) = lstm_apply(p, x, mask=mask)
    # masked steps repeat the last valid output, final state == state at t=2
    np.testing.assert_allclose(np.asarray(out[0, 3]), np.asarray(out[0, 2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h[0]), np.asarray(out[0, 2]), atol=1e-6)


def test_prediction_step_matches_sequence():
    cfg = PredictionConfig(vocab_size=10, embed_dim=6, rnn_units=5, layer_norm=True)
    p = prediction_init(jax.random.PRNGKey(3), cfg)
    tokens = jnp.asarray([[0, 3, 7, 2]])
    seq = prediction_apply(p, cfg, tokens)
    states = prediction_init_state(cfg, 1)
    outs = []
    for u in range(4):
        out, states = prediction_step(p, cfg, tokens[:, u], states)
        outs.append(out)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(stepped), atol=1e-5)


@pytest.mark.parametrize("mode", ["add", "mul", "concat"])
def test_joint_modes(mode):
    cfg = JointConfig(vocab_size=11, joint_dim=6, joint_mode=mode)
    p = joint_init(jax.random.PRNGKey(4), cfg, enc_dim=8, pred_dim=5)
    enc = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 8))
    pred = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 5))
    out = joint_apply(p, cfg, enc, pred)
    assert out.shape == (2, 3, 4, 11)
    # per-step form agrees with full lattice
    step = joint_apply(p, cfg, enc[:, 1, :], pred[:, 2, :])
    np.testing.assert_allclose(np.asarray(step), np.asarray(out[:, 1, 2]), atol=1e-5)


def test_sinusoid_pe_reference_law():
    pe = sinusoid_position_encoding(4, 6)[0]
    # positions are REVERSED: row 0 encodes position 3
    pos, d = 3.0, 6
    assert abs(pe[0, 0] - np.sin(pos)) < 1e-6
    # column 1: cos with exponent 2*(1//2)/d = 0 -> cos(pos)
    assert abs(pe[0, 1] - np.cos(pos)) < 1e-6
    # column 2: sin with exponent 2*(2//2)/d = 2/d
    assert abs(pe[0, 2] - np.sin(pos / 10000 ** (2 / d))) < 1e-6
    assert abs(pe[-1, 0] - 0.0) < 1e-6  # last row = position 0


@pytest.fixture(scope="module")
def conformer():
    cfg = tiny_conformer()
    model = Conformer(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def test_conformer_forward_shapes(conformer):
    model, params, state = conformer
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 8))
    lengths = jnp.asarray([40, 24])
    pred = jnp.asarray([[0, 3, 4, 5], [0, 6, 7, 2]])
    pred_len = jnp.asarray([4, 3])
    out, new_state = model.apply(params, state, feats, lengths, pred, pred_len)
    assert out["logits"].shape == (2, 10, 4, 16)
    np.testing.assert_array_equal(np.asarray(out["logits_length"]), [10, 6])


def test_conformer_bn_state_updates_only_in_training(conformer):
    model, params, state = conformer
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 40, 8))
    lengths = jnp.asarray([40])
    pred = jnp.asarray([[0, 3]])
    pred_len = jnp.asarray([2])
    _, s_eval = model.apply(params, state, feats, lengths, pred, pred_len, training=False)
    before = np.asarray(state["encoder"]["blocks"][0]["mean"])
    np.testing.assert_array_equal(np.asarray(s_eval["encoder"]["blocks"][0]["mean"]), before)
    _, s_train = model.apply(
        params, state, feats, lengths, pred, pred_len,
        training=True, rng=jax.random.PRNGKey(0),
    )
    assert not np.allclose(np.asarray(s_train["encoder"]["blocks"][0]["mean"]), before)


def test_conformer_rnnt_training_step(conformer):
    model, params, state = conformer
    feats = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 8))
    lengths = jnp.asarray([40, 40])
    labels = jnp.asarray([[3, 4, 5], [6, 7, 2]])
    label_len = jnp.asarray([3, 3])
    pred = jnp.concatenate([jnp.zeros((2, 1), jnp.int32), labels], axis=1)
    loss_fn = RnntLossConfig(blank_id=0, global_batch_size=2)

    def loss(params):
        out, _ = model.apply(params, state, feats, lengths, pred, label_len + 1)
        return loss_fn(out["logits"], labels, out["logits_length"], label_len)

    value, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(value))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(grads)))
    )
    assert gnorm > 0 and np.isfinite(gnorm)


def test_greedy_transducer_matches_eager_reference(conformer):
    """Batched blank-hold scan vs a per-utterance eager loop."""
    model, params, state = conformer
    cfg = model.cfg
    feats = jax.random.normal(jax.random.PRNGKey(7), (3, 40, 8))
    lengths = jnp.asarray([40, 32, 24])
    enc_out, enc_lengths, _ = model.encode(params, state, feats, lengths)

    tokens = np.asarray(model._greedy_batch(params, enc_out, enc_lengths))

    for b in range(3):
        states = prediction_init_state(cfg.prediction, 1)
        last = jnp.asarray([cfg.blank_id], jnp.int32)
        pred_out, states = prediction_step(params["prediction"], cfg.prediction, last, states)
        expected = []
        for t in range(int(enc_lengths[b])):
            ytu = joint_apply(params["joint"], cfg.joint, enc_out[b : b + 1, t], pred_out)
            nxt = int(jnp.argmax(ytu[0]))
            expected.append(nxt)
            if nxt != cfg.blank_id:
                last = jnp.asarray([nxt], jnp.int32)
                pred_out, states = prediction_step(
                    params["prediction"], cfg.prediction, last, states
                )
        np.testing.assert_array_equal(tokens[b, : len(expected)], expected)
        assert np.all(tokens[b, len(expected):] == cfg.blank_id)


def test_transducer_beam_size_one_equals_greedy(conformer):
    from telugu_asr_tpu.decode.transducer_beam import transducer_beam_search

    model, params, state = conformer
    feats = jax.random.normal(jax.random.PRNGKey(9), (3, 40, 8))
    lengths = jnp.asarray([40, 32, 24])
    enc_out, enc_lengths, _ = model.encode(params, state, feats, lengths)

    frame_tokens = np.asarray(model._greedy_batch(params, enc_out, enc_lengths))
    greedy_labels = model.strip_blanks(frame_tokens, model.cfg.blank_id)

    beam_tokens, counts = transducer_beam_search(
        model, params, enc_out, enc_lengths, beam_size=1, max_symbols=16
    )
    for b in range(3):
        n = int(counts[b])
        assert list(np.asarray(beam_tokens)[b, :n]) == greedy_labels[b][:n]
        # greedy can't emit more labels than the beam recorded budget here
        assert len(greedy_labels[b]) == n


def test_transducer_beam_score_improves(conformer):
    """Wider beams find label sequences with >= the greedy path score."""
    from telugu_asr_tpu.decode.transducer_beam import transducer_beam_search

    model, params, state = conformer
    feats = jax.random.normal(jax.random.PRNGKey(10), (2, 40, 8))
    enc_out, enc_lengths, _ = model.encode(params, state, feats, jnp.asarray([40, 40]))
    t1, c1 = transducer_beam_search(model, params, enc_out, enc_lengths, beam_size=1, max_symbols=16)
    t4, c4 = transducer_beam_search(model, params, enc_out, enc_lengths, beam_size=4, max_symbols=16)
    assert t4.shape == t1.shape
