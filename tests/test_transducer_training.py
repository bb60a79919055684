"""Conformer RNN-T end-to-end: transducer dataset → train step → eval harness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
from telugu_asr_tpu.audio.io import write_wav_file
from telugu_asr_tpu.data.dataset import DatasetSpec, TransducerASRDataset
from telugu_asr_tpu.eval.harness import run_testing
from telugu_asr_tpu.models.conformer.model import Conformer
from telugu_asr_tpu.optim import make_optimizer
from telugu_asr_tpu.text import make_transducer_tokenizer
from telugu_asr_tpu.train import TrainState
from telugu_asr_tpu.train.step import make_transducer_eval_step, make_transducer_train_step
from tests.test_conformer import tiny_conformer

TEXTS = ["కరెంటు బిల్లు", "ఒక వారం", "తిండి", "నియమాలు"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("rnnt")
    rng = np.random.default_rng(2)
    rows = ["PATH\tDURATION\tTRANSCRIPT"]
    for i, t in enumerate(TEXTS):
        n = 12000 + (i % 2) * 4000
        path = str(root / f"u{i}.wav")
        write_wav_file(path, (rng.standard_normal(n) * 0.1).astype(np.float32), 16000)
        rows.append(f"{path}\t{n/16000:.2f}\t{t}")
    tsv = root / "data.tsv"
    tsv.write_text("\n".join(rows), encoding="utf-8")
    return str(tsv)


def test_transducer_dataset_schema(corpus):
    tok = make_transducer_tokenizer()
    ds = TransducerASRDataset(
        DatasetSpec(data_paths=[corpus], stage="train", drop_remainder=False),
        tok, audio_quantum=8000, text_quantum=4,
    )
    inputs, labels, indices = next(ds.batches(2))
    assert inputs["prediction"].shape[1] == labels["labels"].shape[1] + 1
    for row in range(2):
        n = int(labels["labels_length"][row])
        ids = tok.encode(ds.entries[indices[row]][2], add_special_tokens=False)
        np.testing.assert_array_equal(labels["labels"][row, :n], ids)
        assert inputs["prediction"][row, 0] == tok.blank_token_id
        np.testing.assert_array_equal(inputs["prediction"][row, 1 : n + 1], ids)
        assert inputs["prediction_length"][row] == n + 1


def test_transducer_train_and_eval(corpus, tmp_path):
    tok = make_transducer_tokenizer()
    cfg = tiny_conformer(vocab=tok.vocab_size)
    model = Conformer(cfg)
    params, model_state = model.init(jax.random.PRNGKey(0))
    feat = SpeechFeaturizer(FeaturizerConfig(num_feature_bins=8, normalize_signal=True))
    opt, _ = make_optimizer({"class_name": "Adam", "config": {"learning_rate": 1e-3}})
    ds = TransducerASRDataset(
        DatasetSpec(data_paths=[corpus], stage="train", drop_remainder=False),
        tok, audio_quantum=8000, text_quantum=4,
    )
    step = make_transducer_train_step(
        model, opt, feat, global_batch_size=4, l2=1e-5, donate=False
    )
    eval_step = make_transducer_eval_step(model, feat, global_batch_size=4)
    state = TrainState.create(params, opt, model_state)
    inputs, labels, _ = next(ds.batches(4))
    batch = {**inputs, **labels}
    first = None
    for _ in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        if first is None:
            first = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first  # optimizing
    em = eval_step(state, batch)
    assert np.isfinite(float(em["loss"]))

    # eval harness writes the TSV artifact for the transducer family
    out = str(tmp_path / "rnnt_out.tsv")
    metrics = run_testing(
        model, state.params, feat, ds, 2, out,
        family="conformer", model_state=state.model_state,
    )
    lines = open(out, encoding="utf-8").read().splitlines()
    assert lines[0] == "PATH\tDURATION\tGROUNDTRUTH\tGREEDY"
    assert len(lines) == 1 + len(TEXTS)
    assert "greedy_wer" in metrics
