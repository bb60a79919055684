"""HPO objective for the Moonshine family — the reference search space
(train_optuna.py:27-156) wired to this framework's trainer.

Search space (train_optuna.py:29-69): min/max LR, warmup steps, weight decay
(→ L2 coefficient), d_model ∈ {192, 256, 320}, head_dim ∈ {32, 48, 64},
encoder blocks 4-8, decoder blocks 2-6, per-side dropouts; trials over the
15M-parameter budget are pruned (:109-110), as are trials whose d_model is
not divisible by head_dim (the reference would fail its head-count assert).
Per-epoch validation loss is reported for successive-halving pruning
(:125-137); the objective value is the best val loss (:139-148).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

from telugu_asr_tpu.hpo.study import Trial, TrialPruned

logger = logging.getLogger("telugu_asr_tpu")

PARAM_BUDGET = 15_000_000

__all__ = ["suggest_hyperparameters", "make_objective", "PARAM_BUDGET"]


def suggest_hyperparameters(trial: Trial) -> dict:
    min_lr = trial.suggest_float("min_lr", 1e-6, 1e-4, log=True)
    max_lr = trial.suggest_float("max_lr", 1e-4, 5e-3, log=True)
    warmup_steps = trial.suggest_int("warmup_steps", 4000, 16000, step=1000)
    weight_decay = trial.suggest_float("weight_decay", 1e-6, 1e-3, log=True)
    d_model = trial.suggest_categorical("d_model", [192, 256, 320])
    head_dim = trial.suggest_categorical("head_dim", [32, 48, 64])
    encoder_blocks = trial.suggest_int("encoder_blocks", 4, 8)
    decoder_blocks = trial.suggest_int("decoder_blocks", 2, 6)
    encoder_dropout = trial.suggest_float("encoder_dropout", 0.05, 0.35)
    decoder_dropout = trial.suggest_float("decoder_dropout", 0.05, 0.35)
    if d_model % head_dim != 0:
        raise TrialPruned(f"d_model {d_model} not divisible by head_dim {head_dim}")
    return {
        "min_lr": min_lr,
        "max_lr": max_lr,
        "warmup_steps": warmup_steps,
        "l2": weight_decay,
        "d_model": d_model,
        "head_dim": head_dim,
        "num_heads": d_model // head_dim,
        "encoder_blocks": encoder_blocks,
        "decoder_blocks": decoder_blocks,
        "encoder_dropout": encoder_dropout,
        "decoder_dropout": decoder_dropout,
    }


def build_model_config(hp: dict) -> dict:
    """Reference-schema model_config from suggested hyperparameters."""
    return {
        "name": "asr_telugu_model",
        "d_model": hp["d_model"],
        "subsampling_config": {
            "kernel_size": [9, 9, 9],
            "strides": [2, 2, 2],
            "padding": ["valid", "valid", "valid"],
            "activations": ["tanh", "gelu", "gelu"],
        },
        "encoder_config": {
            "num_blocks": hp["encoder_blocks"],
            "num_heads": hp["num_heads"],
            "head_dim": hp["head_dim"],
            "activation": "gelu",
            "fc_factor": 1,
            "dropout": hp["encoder_dropout"],
        },
        "decoder_config": {
            "num_blocks": hp["decoder_blocks"],
            "num_heads": hp["num_heads"],
            "head_dim": hp["head_dim"],
            "activation": "swiglu",
            "fc_factor": 1,
            "dropout": hp["decoder_dropout"],
        },
    }


def make_objective(
    train_dataset,
    valid_dataset,
    featurizer,
    tokenizer,
    *,
    batch_size: int = 8,
    epochs: int = 24,
    steps_per_epoch: Optional[int] = None,
    run_root: str = "data/hpo",
    seed: int = 42,
    use_fused_featurizer: bool = False,
    log_metrics: bool = True,
    wandb_project: Optional[str] = None,
):
    """Objective closure over prepared datasets (the expensive setup is shared
    across trials, unlike the reference which rebuilds everything per trial)."""
    from telugu_asr_tpu.audio.augment import Augmentation
    from telugu_asr_tpu.data.loader import PrefetchLoader
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.optim import make_optimizer
    from telugu_asr_tpu.train import TrainState, make_eval_step, make_train_step

    def objective(trial: Trial) -> float:
        hp = suggest_hyperparameters(trial)
        model_config = build_model_config(hp)
        cfg = MoonshineConfig.from_model_config(model_config, tokenizer.vocab_size)
        model = ASRModel(cfg)
        params = model.init(jax.random.PRNGKey(seed + trial.number))
        n_params = model.num_params(params)
        trial.set_user_attr("num_params", n_params)
        if n_params > PARAM_BUDGET:
            raise TrialPruned(f"param budget exceeded: {n_params}")

        optimizer, _ = make_optimizer(
            {
                "class_name": "Adam",
                "config": {
                    "learning_rate": {
                        "class_name": "TransformerLearningRateSchedule",
                        "config": {
                            "d_model": hp["d_model"],
                            "warmup_steps": hp["warmup_steps"],
                            "min_lr": hp["min_lr"],
                            "max_lr": hp["max_lr"],
                        },
                    },
                    "beta_1": 0.9,
                    "beta_2": 0.98,
                    "epsilon": 1e-9,
                },
            }
        )
        augmentation = Augmentation(
            {
                "prob": 0.5,
                "feature_augment": {
                    "freq_masking": {"num_masks": 1, "mask_factor": 27},
                    "time_masking": {"num_masks": 1, "mask_factor": 100, "p_upperbound": 1.0},
                },
            }
        )
        train_step = make_train_step(
            model, optimizer, featurizer,
            augmentation=augmentation,
            global_batch_size=batch_size,
            l2=hp["l2"],
            use_fused_featurizer=use_fused_featurizer,
        )
        eval_step = make_eval_step(model, featurizer, global_batch_size=batch_size, l2=hp["l2"])

        # per-trial observability: CSV + TB (+ optional W&B), the analog of
        # the reference's per-trial TB/CSV/W&B callbacks
        # (train_optuna.py:24-25, 125-137)
        metrics_logger = None
        if log_metrics:
            from telugu_asr_tpu.utils.metrics_writer import MetricsLogger

            trial_dir = os.path.join(run_root, f"trial{trial.number}")
            metrics_logger = MetricsLogger(
                csv_path=os.path.join(trial_dir, "training.log"),
                tensorboard_dir=os.path.join(trial_dir, "tensorboard"),
                wandb_project=wandb_project,
                wandb_config={"trial": trial.number, **hp},
            )

        state = TrainState.create(params, optimizer)
        rng = jax.random.PRNGKey(seed)
        spe = steps_per_epoch or train_dataset.num_batches(batch_size)
        train_iter = PrefetchLoader(train_dataset.infinite_batches(batch_size), 2)
        best_val = float("inf")
        try:
            for epoch in range(epochs):
                for _ in range(spe):
                    inputs, labels, _ = next(train_iter)
                    state, tm = train_step(state, {**inputs, **labels}, rng)
                # one host sync per epoch; spe == 0 (train set smaller than
                # the batch) logs nan instead of raising NameError
                tloss = float(tm["loss"]) if spe else float("nan")
                vlosses = []
                for inputs, labels, _ in valid_dataset.batches(batch_size):
                    m = eval_step(state, {**inputs, **labels})
                    vlosses.append(float(m["loss"]))
                val = float(np.mean(vlosses)) if vlosses else float("nan")
                best_val = min(best_val, val)
                trial.report(val, epoch + 1)
                if metrics_logger is not None:
                    metrics_logger.log(epoch + 1, {"loss": tloss, "val_loss": val})
                logger.info("trial %d epoch %d: val_loss=%.4f", trial.number, epoch + 1, val)
                if trial.should_prune():
                    raise TrialPruned()
        finally:
            train_iter.close()
            if metrics_logger is not None:
                metrics_logger.close()
        return best_val

    return objective
