#!/usr/bin/env python3
"""Hyperparameter search entry point (reference: train_optuna.py:158-203).

TPE sampling (seed 42, 10 startup trials) + successive-halving pruning
(min_resource 8, reduction factor 3), JSON storage with resume, the exact
reference search space, and the 15M-parameter budget gate — self-contained
(no Optuna dependency in this image).

Trial parallelism: ``--parallel N`` fans the GLOBAL ``--n-trials`` budget
across N worker processes, each pinned to its own device subset
(TPU_VISIBLE_DEVICES on TPU hosts; virtual CPU meshes in dev), all sharing
the merge-safe storage file — SURVEY §2.2's "fan trials across TPU
cores/slices" redesign of the reference's sequential study.

Usage:
    python train_optuna.py --config config/model.yaml --n-trials 75
                           [--epochs 24] [--steps-per-epoch N] [--storage path]
                           [--parallel N] [--devices-per-worker K]
"""
from __future__ import annotations

import argparse
import logging
import os
import sys


def _launch_parallel(args: argparse.Namespace) -> None:
    """Re-exec this CLI as N device-pinned workers sharing the storage."""
    from telugu_asr_tpu.hpo.launcher import launch_workers, probe_devices, worker_env

    logger = logging.getLogger("telugu_asr_tpu")
    platform, n_devices = probe_devices()
    per = args.devices_per_worker or max(1, n_devices // args.parallel)
    base = [a for a in sys.argv[1:]]
    # strip the parallel flags; stagger worker seeds so samplers differ
    drop = {"--parallel", "--devices-per-worker", "--seed"}
    child_argv, skip = [], False
    for a in base:
        if skip:
            skip = False
            continue
        if a in drop:
            skip = True
            continue
        if any(a.startswith(d + "=") for d in drop):
            continue
        child_argv.append(a)
    argvs, envs = [], []
    for i in range(args.parallel):
        ids = list(range(i * per, min((i + 1) * per, n_devices))) or None
        argvs.append(
            [sys.executable, os.path.abspath(__file__), *child_argv,
             "--seed", str(args.seed + i)]
        )
        envs.append(worker_env(i, platform, device_ids=ids, devices_per_worker=per))
    logger.info(
        "launching %d HPO workers (%s, %d devices each) on global budget %d",
        args.parallel, platform, per, args.n_trials,
    )
    codes = launch_workers(argvs, envs, log_dir=os.path.join(
        os.path.dirname(os.path.abspath(args.storage)) or ".", "workers"))
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")
    from telugu_asr_tpu.hpo import create_study

    study = create_study(study_name=args.study_name, storage=args.storage)
    logger.info("best value: %s", study.best_value)
    logger.info("best params: %s", study.best_params)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="config/model.yaml")
    parser.add_argument("--n-trials", type=int, default=75)
    parser.add_argument("--epochs", type=int, default=24)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--storage", default="data/hpo/study.json")
    parser.add_argument("--study-name", default="asr-hyperparam-snacks-telugu-15m")
    parser.add_argument("--base-dir", default=".")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--parallel", type=int, default=1,
                        help="number of worker processes (global n-trials budget)")
    parser.add_argument("--devices-per-worker", type=int, default=None)
    parser.add_argument("--wandb-project", default=None,
                        help="log per-trial metrics to this W&B project "
                             "(reference train_optuna.py:24-25 parity)")
    parser.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force a JAX backend (default: auto — the TPU when present)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    logger = logging.getLogger("telugu_asr_tpu")

    if args.parallel > 1:
        _launch_parallel(args)
        return

    import jax

    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.helpers import prepare_featurizers, prepare_training_datasets
    from telugu_asr_tpu.hpo import SuccessiveHalvingPruner, TPESampler, create_study
    from telugu_asr_tpu.hpo.runner import make_objective
    from telugu_asr_tpu.utils import setup_environment

    setup_environment(platform=args.platform)
    config = load_config(args.config)
    featurizer, tokenizer = prepare_featurizers(config)
    train_ds, valid_ds = prepare_training_datasets(config, tokenizer, args.base_dir, args.seed)
    logger.info("train entries: %d, valid entries: %d", len(train_ds), len(valid_ds))

    study = create_study(
        study_name=args.study_name,
        storage=args.storage,
        sampler=TPESampler(seed=args.seed, n_startup_trials=10),
        pruner=SuccessiveHalvingPruner(min_resource=8, reduction_factor=3),
        load_if_exists=True,
    )
    objective = make_objective(
        train_ds,
        valid_ds,
        featurizer,
        tokenizer,
        batch_size=args.batch_size,
        epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        seed=args.seed,
        use_fused_featurizer=jax.devices()[0].platform not in ("cpu",),
        wandb_project=args.wandb_project,
    )
    study.optimize(objective, n_trials=args.n_trials)
    logger.info("best value: %s", study.best_value)
    logger.info("best params: %s", study.best_params)


if __name__ == "__main__":
    main()
