import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.losses import l2_regularization, masked_cross_entropy
from telugu_asr_tpu.optim import make_optimizer, transformer_schedule


def test_masked_ce_manual():
    logits = jnp.asarray([[[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]]])  # [1,2,3]
    targets = jnp.asarray([[0, 2]])  # second position is PAD
    per_ex = masked_cross_entropy(logits, targets, pad_id=2)
    logp = np.log(np.exp(2.0) / (np.exp(2.0) + 2))
    np.testing.assert_allclose(np.asarray(per_ex), [-logp], rtol=1e-5)


def test_masked_ce_global_batch_scaling():
    logits = jnp.zeros((2, 3, 5))
    targets = jnp.asarray([[0, 1, 2], [1, 2, 2]])
    # uniform logits: each non-pad position contributes log(5)
    loss = masked_cross_entropy(logits, targets, pad_id=2, global_batch_size=4)
    np.testing.assert_allclose(np.asarray(loss), 3 * np.log(5) / 4, rtol=1e-6)


def test_l2_excludes_embedding():
    params = {
        "classifier": {"kernel": jnp.ones((2, 2))},
        "text_embedding": {"table": jnp.full((3, 3), 100.0)},
        "mha": {"rope_inv_freq": jnp.full((4,), 50.0)},
    }
    reg = l2_regularization(params, 0.5)
    np.testing.assert_allclose(np.asarray(reg), 0.5 * 4.0, rtol=1e-6)


def test_transformer_schedule_formula():
    # schedules.py:13-22 law with clamping
    sched = transformer_schedule(d_model=192, warmup_steps=100)
    step = 50
    expected = (192 ** -0.5) * min(step ** -0.5, step * (100 ** -1.5))
    np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)
    clamped = transformer_schedule(d_model=192, warmup_steps=100, min_lr=4e-4, max_lr=4e-4)
    assert abs(float(clamped(1)) - 4e-4) < 1e-9
    assert abs(float(clamped(10_000)) - 4e-4) < 1e-9


def test_make_optimizer_from_reference_config():
    opt, sched = make_optimizer(
        {
            "class_name": "Adam",
            "config": {
                "learning_rate": {
                    "class_name": "telugu_asr_tpu.optim.schedules>TransformerLearningRateSchedule",
                    "config": {"d_model": 192, "warmup_steps": 11174, "max_lr": 4.6e-4, "min_lr": 4.6e-4},
                },
                "beta_1": 0.9,
                "beta_2": 0.98,
                "epsilon": 1e-9,
            },
        }
    )
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((3,))}
    updates, _ = opt.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))
    assert abs(float(sched(1)) - 4.6e-4) < 1e-9
