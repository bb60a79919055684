"""Beam search, export, and observability utilities."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telugu_asr_tpu.decode.beam import beam_search_decode
from telugu_asr_tpu.decode.greedy import greedy_decode
from telugu_asr_tpu.models.moonshine.model import ASRModel
from tests.test_moonshine import tiny_config

BOS, EOS, PAD = 0, 1, 2


@pytest.fixture(scope="module")
def model_and_encodings():
    model = ASRModel(tiny_config())
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 8))
    enc_out, enc_mask = model.encode(params, feats, jnp.asarray([80, 64]))
    return model, params, enc_out, enc_mask


def test_beam_size_one_equals_greedy(model_and_encodings):
    model, params, enc_out, enc_mask = model_and_encodings
    g_tokens, _ = greedy_decode(
        model, params, enc_out, enc_mask, max_length=10,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    b_tokens, _ = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=10, beam_size=1,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    np.testing.assert_array_equal(np.asarray(g_tokens), np.asarray(b_tokens))


def test_beam_lazy_equals_eager(model_and_encodings):
    """Ancestor-weighted (no cache gather) beam == textbook gathered beam:
    same math, so identical surviving beams and near-identical scores."""
    model, params, enc_out, enc_mask = model_and_encodings
    t_lazy, s_lazy = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=10, beam_size=3,
        bos_id=BOS, eos_id=EOS, pad_id=PAD, lazy_reorder=True,
    )
    t_eager, s_eager = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=10, beam_size=3,
        bos_id=BOS, eos_id=EOS, pad_id=PAD, lazy_reorder=False,
    )
    np.testing.assert_array_equal(np.asarray(t_lazy), np.asarray(t_eager))
    np.testing.assert_allclose(np.asarray(s_lazy), np.asarray(s_eager),
                               rtol=1e-5, atol=1e-5)


def test_lazy_self_mha_matches_gathered():
    """_lazy_self_mha on a scrambled cache + ancestor map == mha_apply on the
    explicitly parent-gathered cache."""
    from telugu_asr_tpu.decode.beam import _lazy_self_mha
    from telugu_asr_tpu.ops.attention import mha_init, mha_apply

    g, k, h, dh, d, L = 2, 3, 2, 16, 32, 7
    f = g * k
    step = 4
    rng = jax.random.PRNGKey(0)
    mp = mha_init(rng, d, h, dh)
    x = jax.random.normal(jax.random.PRNGKey(1), (f, 1, d))
    cache = {
        "k": jax.random.normal(jax.random.PRNGKey(2), (f, h, dh, L)),
        "v": jax.random.normal(jax.random.PRNGKey(3), (f, h, dh, L)),
    }
    # random group-local ancestor slots for the filled columns
    anc = np.asarray(
        jax.random.randint(jax.random.PRNGKey(4), (g, k, L), 0, k)
    )
    w = np.zeros((g, k, k, L), np.float32)
    for gi in range(g):
        for qi in range(k):
            for t in range(step + 1):
                w[gi, qi, anc[gi, qi, t], t] = 1.0
    attend = jnp.arange(L)[None, :] <= step
    attend = jnp.broadcast_to(attend, (f, L))

    out_lazy, new_cache = _lazy_self_mha(
        mp, x, cache, jnp.int32(step), jnp.asarray(w), attend, h, k
    )

    # eager reference: gather each row's ancestor cache columns, run the
    # stock attention on the gathered cache (the new column write included)
    kg = np.zeros((f, h, dh, L), np.float32)
    vg = np.zeros((f, h, dh, L), np.float32)
    knew = np.asarray(new_cache["k"])  # holds this step's column in own slot
    vnew = np.asarray(new_cache["v"])
    for gi in range(g):
        for qi in range(k):
            r = gi * k + qi
            for t in range(step + 1):
                src = gi * k + anc[gi, qi, t]
                kg[r, :, :, t] = knew[src, :, :, t]
                vg[r, :, :, t] = vnew[src, :, :, t]
    # own column at `step` must be the row's own write
    positions = jnp.full((f, 1), step, jnp.int32)
    out_eager, _ = mha_apply(
        mp, x, x, h,
        mask=attend[:, None, None, :],
        q_positions=positions, kv_positions=positions,
        cache={"k": jnp.asarray(kg), "v": jnp.asarray(vg)},
        cache_index=None,
    )
    np.testing.assert_allclose(
        np.asarray(out_lazy), np.asarray(out_eager), rtol=1e-5, atol=1e-5
    )


def test_beam_bf16_cache_mode(model_and_encodings):
    """bf16 self/cross caches: same shape law, near-identical tokens on this
    tiny problem (bf16 rounding may flip argmax near-ties, so compare scores
    loosely rather than insisting on token identity)."""
    model, params, enc_out, enc_mask = model_and_encodings
    t32, s32 = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=8, beam_size=4,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    t16, s16 = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=8, beam_size=4,
        bos_id=BOS, eos_id=EOS, pad_id=PAD, cache_dtype="bfloat16",
    )
    assert t16.shape == t32.shape
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=0.15)


def test_beam_search_score_not_worse_than_greedy(model_and_encodings):
    """The best beam's sequence log-prob must be >= the greedy sequence's."""
    model, params, enc_out, enc_mask = model_and_encodings
    _, s1 = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=8, beam_size=1,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    _, s4 = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=8, beam_size=4,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    assert np.all(np.asarray(s4) >= np.asarray(s1) - 1e-4)


def test_stablehlo_export_roundtrip(tmp_path):
    from jax import export as jax_export

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.export import export_stablehlo

    model = ASRModel(tiny_config())
    params = model.init(jax.random.PRNGKey(0))
    feat = SpeechFeaturizer(FeaturizerConfig(num_feature_bins=8, normalize_signal=True))
    path = str(tmp_path / "model.stablehlo")
    export_stablehlo(model, params, feat, path, batch=1, seconds=1.0, text_len=4)
    assert os.path.getsize(path) > 1000

    restored = jax_export.deserialize(open(path, "rb").read())
    audio = jnp.zeros((1, 16000), jnp.float32)
    out = restored.call(audio, jnp.asarray([16000], jnp.int32), jnp.zeros((1, 4), jnp.int32))
    assert out.shape == (1, 4, 32)


def test_step_timer():
    from telugu_asr_tpu.utils.profiling import StepTimer

    t = StepTimer(window=3)
    assert t.tick() is None
    for _ in range(3):
        dt = t.tick()
        assert dt is not None and dt >= 0
    assert t.mean_step_seconds is not None
    assert t.steps_per_second() > 0


def test_metrics_logger_csv(tmp_path):
    from telugu_asr_tpu.utils.metrics_writer import MetricsLogger

    path = str(tmp_path / "steps.csv")
    logger = MetricsLogger(csv_path=path)
    logger.log(1, {"loss": 2.0, "lr": 0.1})
    logger.log(2, {"loss": 1.5, "lr": 0.1})
    lines = open(path).read().splitlines()
    assert lines[0] == "step,loss,lr"
    assert len(lines) == 3
    logger.close()


def test_metrics_logger_single_header_across_groups(tmp_path):
    """Alternating train/val field sets must yield ONE parseable CSV: a single
    stable superset header, never interleaved re-headers (round-3 advisor)."""
    import csv

    from telugu_asr_tpu.utils.metrics_writer import MetricsLogger

    path = str(tmp_path / "steps.csv")
    logger = MetricsLogger(csv_path=path)
    logger.log(50, {"loss": 2.0, "lr": 0.1})
    logger.log(100, {"val_loss": 3.0, "epoch_loss": 2.1})  # new field group
    logger.log(150, {"loss": 1.8, "lr": 0.09})
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["step", "loss", "lr", "epoch_loss", "val_loss"]
    assert len(rows) == 4  # exactly one header
    assert all(len(r) == len(rows[0]) for r in rows)
    assert rows[2][0] == "100" and rows[2][1] == ""  # missing fields blank
    logger.close()


def test_metrics_logger_resume_truncation(tmp_path):
    """A resumed run truncates rows logged past the restored step, then appends
    without duplicating steps — and a reopened logger adopts the existing header."""
    import csv

    from telugu_asr_tpu.utils.metrics_writer import MetricsLogger

    path = str(tmp_path / "steps.csv")
    logger = MetricsLogger(csv_path=path)
    for step in (50, 100, 150, 200):
        logger.log(step, {"loss": float(step)})
    logger.close()

    resumed = MetricsLogger(csv_path=path)  # fresh process, same file
    resumed.truncate_after(100)  # checkpoint restored at step 100
    resumed.log(150, {"loss": -150.0})
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    steps = [r[0] for r in rows[1:]]
    assert steps == ["50", "100", "150"]
    assert rows[3][1] == "-150.0"  # the re-run row, not the stale one
    resumed.close()


def test_epoch_csv_logger_resume_truncation(tmp_path):
    from telugu_asr_tpu.train.loop import CSVLogger

    path = str(tmp_path / "training.log")
    logger = CSVLogger(path)
    for epoch in (0, 1, 2, 3):
        logger.log(epoch, 10.0 - epoch, 20.0 - epoch)
    logger.truncate_from(2)  # resume restarts at epoch 2
    logger.log(2, 7.5, 17.5)
    lines = open(path).read().splitlines()
    assert lines[0] == "epoch,loss,val_loss"
    assert [l.split(",")[0] for l in lines[1:]] == ["0", "1", "2"]
    assert lines[3] == "2,7.500000,17.500000"


def _emitted(row, max_length):
    """Tokens a hypothesis actually emitted: positions after BOS up to (and
    excluding) EOS/PAD tail."""
    out = []
    for t in row:
        if t in (EOS, PAD):
            break
        out.append(int(t))
    return out


def test_beam_penalties_off_is_identity(model_and_encodings):
    """Default penalty values must be bit-identical to the pre-penalty path
    (reference-parity decode is the default)."""
    model, params, enc_out, enc_mask = model_and_encodings
    base, s_base = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=10, beam_size=3,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    same, s_same = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=10, beam_size=3,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
        repetition_penalty=1.0, no_repeat_ngram=0, length_penalty=0.0,
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    np.testing.assert_array_equal(np.asarray(s_base), np.asarray(s_same))


def test_beam_no_repeat_ngram_property(model_and_encodings):
    """With no_repeat_ngram=2 the winning hypothesis contains no repeated
    bigram — a direct property of the hard ban, model-independent."""
    model, params, enc_out, enc_mask = model_and_encodings
    tokens, _ = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=16, beam_size=3,
        bos_id=BOS, eos_id=EOS, pad_id=PAD, no_repeat_ngram=2,
    )
    for row in np.asarray(tokens):
        emitted = [BOS] + _emitted(row, 16)
        bigrams = list(zip(emitted[:-1], emitted[1:]))
        assert len(bigrams) == len(set(bigrams)), f"repeated bigram in {emitted}"


def test_beam_repetition_penalty_extreme_bans_repeats(model_and_encodings):
    """A huge repetition penalty acts as a hard no-token-twice constraint:
    every emitted token in the winner is distinct."""
    model, params, enc_out, enc_mask = model_and_encodings
    tokens, _ = beam_search_decode(
        model, params, enc_out, enc_mask, max_length=12, beam_size=3,
        bos_id=BOS, eos_id=EOS, pad_id=PAD, repetition_penalty=1e4,
    )
    for row in np.asarray(tokens):
        emitted = _emitted(row, 12)
        assert len(emitted) == len(set(emitted)), f"repeated token in {emitted}"


def test_beam_penalty_validation(model_and_encodings):
    model, params, enc_out, enc_mask = model_and_encodings
    with pytest.raises(ValueError, match="no_repeat_ngram=1"):
        beam_search_decode(
            model, params, enc_out, enc_mask, max_length=8, beam_size=2,
            bos_id=BOS, eos_id=EOS, pad_id=PAD, no_repeat_ngram=1,
        )
    with pytest.raises(ValueError, match="fused"):
        beam_search_decode(
            model, params, enc_out, enc_mask, max_length=8, beam_size=2,
            bos_id=BOS, eos_id=EOS, pad_id=PAD, no_repeat_ngram=3,
            attention_impl="fused",
        )
