"""End-to-end slice: corpus → fit (checkpoint/resume/CSV) → eval harness TSV."""
import os

import jax
import numpy as np
import pytest

from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
from telugu_asr_tpu.audio.io import write_wav_file
from telugu_asr_tpu.data.dataset import ASRDataset, DatasetSpec
from telugu_asr_tpu.eval.harness import evaluate_results, run_testing
from telugu_asr_tpu.models.moonshine.model import ASRModel
from telugu_asr_tpu.optim import make_optimizer
from telugu_asr_tpu.text import make_default_tokenizer
from telugu_asr_tpu.train import TrainState, make_eval_step, make_train_step
from telugu_asr_tpu.train.checkpoint import CheckpointManager
from telugu_asr_tpu.train.loop import fit
from tests.test_moonshine import tiny_config

TEXTS = ["కరెంటు బిల్లు", "ఒక వారం", "తిండి చక్కగా", "నియమాలు", "కూడా", "ఫోన్ ఉంటే"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(1)
    rows = ["PATH\tDURATION\tTRANSCRIPT"]
    for i, text in enumerate(TEXTS):
        n = 12000 + (i % 3) * 2000
        wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
        path = str(root / f"u{i}.wav")
        write_wav_file(path, wave, 16000)
        rows.append(f"{path}\t{n/16000:.2f}\t{text}")
    tsv = root / "train.tsv"
    tsv.write_text("\n".join(rows), encoding="utf-8")
    return str(tsv)


@pytest.fixture(scope="module")
def setup():
    tok = make_default_tokenizer()
    cfg = tiny_config(vocab=tok.vocab_size)
    model = ASRModel(cfg)
    feat = SpeechFeaturizer(
        FeaturizerConfig(num_feature_bins=8, normalize_signal=True, nfft=512)
    )
    opt, _ = make_optimizer({"class_name": "Adam", "config": {"learning_rate": 1e-3}})
    return tok, model, feat, opt


def test_fit_checkpoint_resume_and_eval(corpus, setup, tmp_path):
    tok, model, feat, opt = setup
    run_dir = str(tmp_path / "run")
    ds = ASRDataset(
        DatasetSpec(data_paths=[corpus], stage="train", shuffle=True, drop_remainder=True),
        tok,
        audio_quantum=8000,
        text_quantum=4,
    )
    train_step = make_train_step(model, opt, feat, global_batch_size=2, l2=1e-5, donate=False)
    eval_step = make_eval_step(model, feat, global_batch_size=2)

    params = model.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, opt)
    state = fit(
        train_step=train_step,
        eval_step=eval_step,
        state=state,
        train_dataset=ds,
        valid_dataset=ds,
        batch_size=2,
        num_epochs=1,
        run_dir=run_dir,
        steps_per_epoch=2,
    )
    assert int(state.step) == 2
    log = open(os.path.join(run_dir, "training.log")).read().splitlines()
    assert log[0] == "epoch,loss,val_loss"
    assert len(log) == 2

    # resume: asking for 2 epochs continues from epoch 1
    state2 = TrainState.create(model.init(jax.random.PRNGKey(9)), opt)
    state2 = fit(
        train_step=train_step,
        eval_step=None,
        state=state2,
        train_dataset=ds,
        valid_dataset=None,
        batch_size=2,
        num_epochs=2,
        run_dir=run_dir,
        steps_per_epoch=2,
    )
    assert int(state2.step) == 4  # 2 restored + 2 new
    ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    assert ckpt.latest_step() == 2

    # weights-only restore round-trips
    restored = ckpt.restore_params()
    a = jax.tree_util.tree_leaves(restored)
    b = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)

    # eval harness: TSV artifact + metrics
    test_ds = ASRDataset(
        DatasetSpec(data_paths=[corpus], stage="test", drop_remainder=False),
        tok,
        audio_quantum=8000,
    )
    out = str(tmp_path / "output.tsv")
    metrics = run_testing(model, state2.params, feat, test_ds, 2, out)
    lines = open(out, encoding="utf-8").read().splitlines()
    assert lines[0] == "PATH\tDURATION\tGROUNDTRUTH\tGREEDY"
    assert len(lines) == 1 + len(TEXTS)
    # rows are in entry order with reference groundtruth round-trip
    for i, line in enumerate(lines[1:]):
        path, duration, gt, greedy = line.split("\t")
        assert path == test_ds.entries[i][0]
        expected_gt = tok.decode(tok.encode(TEXTS[i]), skip_special_tokens=True)
        assert gt == expected_gt
    assert 0.0 <= metrics["greedy_cer"]
    assert metrics["rtfx"] > 0
    rerun = evaluate_results(out)
    assert abs(rerun["greedy_wer"] - metrics["greedy_wer"]) < 1e-9


def test_quick_val_wer(corpus, setup):
    from telugu_asr_tpu.eval.harness import quick_val_wer

    tok, model, feat, opt = setup
    ds = ASRDataset(
        DatasetSpec(data_paths=[corpus], stage="eval", drop_remainder=False),
        tok, audio_quantum=8000,
    )
    params = model.init(jax.random.PRNGKey(4))
    metrics = quick_val_wer(model, params, feat, ds, batch_size=3, max_batches=1)
    assert set(metrics) == {"val_wer", "val_cer"}
    assert metrics["val_cer"] >= 0.0


def test_best_val_checkpoint_retention(corpus, setup, tmp_path):
    """checkpoints_best/ always holds the lowest-val epoch, surviving a
    late-training collapse that rotates the best model out of the recency
    window (observed on the synth20k HPO-winner run: val 1.5 → 19 at the
    end, max_to_keep=3 kept only post-collapse epochs)."""
    tok, model, feat, opt = setup
    run_dir = str(tmp_path / "run")
    ds = ASRDataset(
        DatasetSpec(data_paths=[corpus], stage="train", shuffle=True, drop_remainder=True),
        tok,
        audio_quantum=8000,
        text_quantum=4,
    )
    train_step = make_train_step(model, opt, feat, global_batch_size=2, l2=0.0, donate=False)

    # scripted per-epoch val losses: best at epoch 2, then a collapse
    scripted = [5.0, 2.0, 7.0, 9.0]
    n_val_batches = sum(1 for _ in ds.batches(2))
    calls = {"n": 0}

    def eval_step(state, batch):
        epoch = min(calls["n"] // n_val_batches, len(scripted) - 1)
        calls["n"] += 1
        return {"loss": scripted[epoch]}

    state = TrainState.create(model.init(jax.random.PRNGKey(0)), opt)
    fit(
        train_step=train_step,
        eval_step=eval_step,
        state=state,
        train_dataset=ds,
        valid_dataset=ds,
        batch_size=2,
        num_epochs=4,
        run_dir=run_dir,
        steps_per_epoch=1,
        checkpoint_max_to_keep=2,
    )
    best = CheckpointManager(os.path.join(run_dir, "checkpoints_best"))
    assert best.latest_step() == 2          # the val-2.0 epoch survived
    recents = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    assert recents.latest_step() == 4       # recency window unaffected

    # resume for 2 more epochs with WORSE val: best stays at epoch 2
    calls["n"] = 0
    scripted[:] = [8.0, 8.5, 8.0, 8.0, 8.0, 8.0]
    state2 = TrainState.create(model.init(jax.random.PRNGKey(1)), opt)
    fit(
        train_step=train_step,
        eval_step=eval_step,
        state=state2,
        train_dataset=ds,
        valid_dataset=ds,
        batch_size=2,
        num_epochs=6,
        run_dir=run_dir,
        steps_per_epoch=1,
        checkpoint_max_to_keep=2,
    )
    assert CheckpointManager(os.path.join(run_dir, "checkpoints_best")).latest_step() == 2


def test_make_optimizer_global_clipnorm():
    # SGD makes clipping directly observable: update == -lr * clipped_grad.
    grads = {"w": np.full((4,), 100.0, np.float32)}   # global norm 200
    params = {"w": np.zeros((4,), np.float32)}
    for spec, clip_arg in (
        ({"class_name": "sgd", "config": {"learning_rate": 1.0, "global_clipnorm": 1.0}}, None),
        ({"class_name": "sgd", "config": {"learning_rate": 1.0}}, 1.0),  # CLI override path
    ):
        opt, _ = make_optimizer(spec, clip_norm=clip_arg)
        updates, _ = opt.update(grads, opt.init(params), params)
        u = np.asarray(updates["w"], np.float64)
        np.testing.assert_allclose(np.sqrt((u ** 2).sum()), 1.0, rtol=1e-5)
    # unclipped control
    opt, _ = make_optimizer({"class_name": "sgd", "config": {"learning_rate": 1.0}})
    updates, _ = opt.update(grads, opt.init(params), params)
    u = np.asarray(updates["w"], np.float64)
    np.testing.assert_allclose(np.sqrt((u ** 2).sum()), 200.0, rtol=1e-5)


def test_quick_val_wer_releases_prefetch_thread(corpus, setup):
    """Early-break eval (max_batches) must shut the prefetch producer down:
    a blocked producer pins device batches for the life of the process —
    observed as a per-epoch host-memory leak under --val-wer-every."""
    import threading
    import time

    from telugu_asr_tpu.eval.harness import quick_val_wer

    tok, model, feat, _opt = setup
    ds = ASRDataset(
        DatasetSpec(data_paths=[corpus], stage="eval"), tok,
        audio_quantum=8000, text_quantum=4,
    )
    params = model.init(jax.random.PRNGKey(0))
    out = quick_val_wer(model, params, feat, ds, batch_size=2, max_batches=1)
    assert "val_wer" in out
    deadline = time.time() + 10.0
    live = []
    while time.time() < deadline:
        live = [t for t in threading.enumerate()
                if t.name == "eval-prefetch" and t.is_alive()]
        if not live:
            break
        time.sleep(0.2)
    assert not live, f"leaked prefetch threads: {live}"


def test_prefetch_slow_consumer_sees_sentinel():
    """A consumer slower than the producer leaves the queue full when the
    source exhausts; the sentinel must still arrive (a dropped sentinel
    deadlocked the first TPU eval after the abandonment fix)."""
    import time

    from telugu_asr_tpu.eval.harness import _prefetch

    items = list(range(7))
    got = []
    for item in _prefetch(iter(items), transform=lambda x: x, depth=2):
        time.sleep(0.05)  # slower than the producer
        got.append(item)
    assert got == items
