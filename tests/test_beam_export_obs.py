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
