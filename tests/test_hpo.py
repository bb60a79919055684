"""HPO engine: samplers, pruner laws, storage resume, search-space gates."""
import os

import numpy as np
import pytest

from telugu_asr_tpu.hpo import (
    RandomSampler,
    SuccessiveHalvingPruner,
    TPESampler,
    TrialPruned,
    create_study,
)
from telugu_asr_tpu.hpo.runner import PARAM_BUDGET, build_model_config, suggest_hyperparameters


def quadratic(trial):
    x = trial.suggest_float("x", -5.0, 5.0)
    y = trial.suggest_float("y", 1e-3, 10.0, log=True)
    c = trial.suggest_categorical("c", ["a", "b"])
    return (x - 1.0) ** 2 + (np.log(y) - 0.0) ** 2 + (0.0 if c == "a" else 1.0)


def test_random_search_runs():
    study = create_study("t", sampler=RandomSampler(seed=0))
    study.optimize(quadratic, n_trials=20)
    assert study.best_value is not None
    assert len([t for t in study.trials if t.state == "complete"]) == 20


def test_tpe_improves_over_startup():
    study = create_study("t", sampler=TPESampler(seed=0, n_startup_trials=10))
    study.optimize(quadratic, n_trials=40)
    startup_best = min(t.value for t in study.trials[:10])
    assert study.best_value <= startup_best


def test_int_and_step_suggest():
    study = create_study("t", sampler=RandomSampler(seed=1))

    def obj(trial):
        w = trial.suggest_int("warmup", 4000, 16000, step=1000)
        assert 4000 <= w <= 16000 and w % 1000 == 0
        d = trial.suggest_categorical("d_model", [192, 256, 320])
        assert d in (192, 256, 320)
        return 0.0

    study.optimize(obj, n_trials=5)


def test_pruner_prunes_bad_trials():
    pruner = SuccessiveHalvingPruner(min_resource=2, reduction_factor=2)
    study = create_study("t", sampler=RandomSampler(seed=2), pruner=pruner)
    pruned = []

    def obj(trial):
        base = trial.suggest_float("b", 0.0, 1.0)
        for epoch in range(1, 9):
            # bad trials plateau high; good trials descend
            value = base * 10 + (8 - epoch) * 0.1
            trial.report(value, epoch)
            if trial.should_prune():
                pruned.append(trial.number)
                raise TrialPruned()
        return value

    study.optimize(obj, n_trials=12)
    assert len(pruned) > 0  # some bad trials were cut early
    states = {t.state for t in study.trials}
    assert "pruned" in states and "complete" in states


def test_storage_resume(tmp_path):
    path = str(tmp_path / "study.json")
    s1 = create_study("t", storage=path, sampler=RandomSampler(seed=3))
    s1.optimize(quadratic, n_trials=5)
    s2 = create_study("t", storage=path, sampler=RandomSampler(seed=3))
    assert len(s2.trials) == 5
    s2.optimize(quadratic, n_trials=8)  # total count includes restored
    assert len([t for t in s2.trials if t.state == "complete"]) == 8


def test_reference_search_space_and_budget_gate():
    study = create_study("t", sampler=RandomSampler(seed=4))
    seen = []

    def obj(trial):
        try:
            hp = suggest_hyperparameters(trial)
        except TrialPruned:
            raise
        seen.append(hp)
        cfg = build_model_config(hp)
        assert cfg["encoder_config"]["num_heads"] * hp["head_dim"] == hp["d_model"]
        assert 4 <= cfg["encoder_config"]["num_blocks"] <= 8
        assert 2 <= cfg["decoder_config"]["num_blocks"] <= 6
        return 0.0

    study.optimize(obj, n_trials=30)
    assert len(seen) > 0
    # incompatible (d_model, head_dim) combos were pruned, not crashed
    assert all(hp["d_model"] % hp["head_dim"] == 0 for hp in seen)


def test_concurrent_workers_merge_storage(tmp_path):
    """Two worker processes share one storage file: nothing is lost, the
    global n_trials budget is honored, and samplers see each other's trials."""
    import subprocess
    import sys

    path = str(tmp_path / "study.json")
    worker = (
        "import sys\n"
        "from telugu_asr_tpu.hpo import RandomSampler, create_study\n"
        "def obj(trial):\n"
        "    x = trial.suggest_float('x', -5.0, 5.0)\n"
        "    return (x - 1.0) ** 2\n"
        f"study = create_study('t', storage={path!r},"
        " sampler=RandomSampler(seed=int(sys.argv[1])))\n"
        "study.optimize(obj, n_trials=12)\n"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(seed)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for seed in (0, 1)
    ]
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()

    study = create_study("t", storage=path)
    done = [t for t in study.trials if t.state == "complete"]
    # Both workers ran until the GLOBAL count reached 12.  Each may overshoot
    # by at most the one trial it had in flight when the other finished the
    # budget, and no trial may be lost to a storage race.
    assert 12 <= len(done) <= 13
    assert len({t.uid for t in study.trials}) == len(study.trials)
    assert study.best_value is not None


def test_worker_env_pinning():
    from telugu_asr_tpu.hpo import worker_env

    cpu = worker_env(0, "cpu", devices_per_worker=2, base_env={"XLA_FLAGS": "--foo"})
    assert cpu["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=2" in cpu["XLA_FLAGS"]
    assert "--foo" in cpu["XLA_FLAGS"]

    tpu = worker_env(1, "tpu", device_ids=[2, 3], base_env={})
    assert tpu["TPU_VISIBLE_DEVICES"] == "2,3"
    assert tpu["TPU_PROCESS_BOUNDS"] == "1,1,1"
    assert tpu["TELUGU_ASR_HPO_WORKER"] == "1"


def test_parallel_launcher_end_to_end(tmp_path):
    """launch_workers drives two CPU-pinned workers to a shared study."""
    import sys

    from telugu_asr_tpu.hpo import create_study, launch_workers, worker_env

    path = str(tmp_path / "study.json")
    worker = (
        "import sys\n"
        "from telugu_asr_tpu.hpo import RandomSampler, create_study\n"
        "def obj(trial):\n"
        "    return trial.suggest_float('x', 0.0, 1.0)\n"
        f"study = create_study('t', storage={path!r},"
        " sampler=RandomSampler(seed=int(sys.argv[1])))\n"
        "study.optimize(obj, n_trials=6)\n"
    )
    argvs = [[sys.executable, "-c", worker, str(i)] for i in range(2)]
    envs = [worker_env(i, "cpu", devices_per_worker=1) for i in range(2)]
    codes = launch_workers(argvs, envs, log_dir=str(tmp_path / "workers"))
    assert codes == [0, 0]
    study = create_study("t", storage=path)
    assert len([t for t in study.trials if t.state == "complete"]) >= 6


def test_param_budget_enforced():
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig

    hp = {
        "d_model": 320, "head_dim": 32, "num_heads": 10,
        "encoder_blocks": 8, "decoder_blocks": 6,
        "encoder_dropout": 0.1, "decoder_dropout": 0.1,
        "min_lr": 1e-5, "max_lr": 1e-3, "warmup_steps": 8000, "l2": 1e-5,
    }
    cfg = MoonshineConfig.from_model_config(build_model_config(hp), vocab_size=242)
    import jax

    model = ASRModel(cfg)
    n = model.num_params(model.init(jax.random.PRNGKey(0)))
    assert n < PARAM_BUDGET  # largest space point still fits the budget


def test_objective_writes_per_trial_metrics(tmp_path, monkeypatch):
    """make_objective logs per-epoch loss/val_loss to the trial's run dir
    (CSV + TensorBoard) — reference train_optuna.py:24-25,125-137 parity."""
    import jax

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.audio.io import write_wav_file
    from telugu_asr_tpu.data.dataset import ASRDataset, DatasetSpec
    from telugu_asr_tpu.hpo import RandomSampler, create_study
    from telugu_asr_tpu.hpo import runner as hpo_runner
    from telugu_asr_tpu.text import make_default_tokenizer

    rng = np.random.default_rng(0)
    rows = ["PATH\tDURATION\tTRANSCRIPT"]
    for i, text in enumerate(["కరెంటు", "వారం", "తిండి", "నియమాలు"]):
        path = str(tmp_path / f"u{i}.wav")
        write_wav_file(path, (rng.standard_normal(12000) * 0.1).astype(np.float32), 16000)
        rows.append(f"{path}\t0.75\t{text}")
    tsv = tmp_path / "train.tsv"
    tsv.write_text("\n".join(rows), encoding="utf-8")

    tok = make_default_tokenizer()
    feat = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))
    ds = ASRDataset(DatasetSpec(data_paths=[str(tsv)], stage="train"), tok)

    tiny_hp = {
        "min_lr": 1e-5, "max_lr": 1e-3, "warmup_steps": 8000, "l2": 1e-5,
        "d_model": 32, "head_dim": 16, "num_heads": 2,
        "encoder_blocks": 1, "decoder_blocks": 1,
        "encoder_dropout": 0.1, "decoder_dropout": 0.1,
    }
    monkeypatch.setattr(hpo_runner, "suggest_hyperparameters", lambda trial: dict(tiny_hp))

    run_root = str(tmp_path / "hpo")
    objective = hpo_runner.make_objective(
        ds, ds, feat, tok,
        batch_size=2, epochs=2, steps_per_epoch=1, run_root=run_root, seed=0,
    )
    study = create_study("t", sampler=RandomSampler(seed=0))
    study.optimize(objective, n_trials=1)

    csv_path = os.path.join(run_root, "trial0", "training.log")
    assert os.path.exists(csv_path)
    lines = open(csv_path, encoding="utf-8").read().strip().splitlines()
    assert lines[0] == "step,loss,val_loss"
    assert len(lines) == 3  # header + 2 epochs
