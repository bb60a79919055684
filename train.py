#!/usr/bin/env python3
"""Train the Moonshine seq2seq ASR model (reference entry:
src/models/moonshine/train.py, re-orchestrated for JAX/TPU).

Usage:
    python train.py --config config/model.yaml [--run-dir data/logs/model/...]
                    [--epochs N] [--batch-size B] [--steps-per-epoch N]
"""
from __future__ import annotations

import argparse
import datetime
import logging
import os

import jax


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="config/model.yaml")
    parser.add_argument("--run-dir", default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--base-dir", default=".", help="root for relative data paths")
    parser.add_argument(
        "--bf16", action="store_true",
        help="mixed-precision training (bfloat16 compute, float32 masters)",
    )
    parser.add_argument(
        "--val-wer-every", type=int, default=0,
        help="compute greedy WER on validation batches every N epochs (0=off)",
    )
    parser.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force a JAX backend (default: auto — the TPU when present)",
    )
    parser.add_argument(
        "--clip-norm", type=float, default=None,
        help="global-norm gradient clipping (overrides the optimizer "
             "config's global_clipnorm; unset = no clipping)",
    )
    parser.add_argument(
        "--f32-transfer", action="store_true",
        help="ship audio batches to the device as float32 (default: int16 "
             "PCM at half the bytes — bit-exact for WAV sources; the "
             "featurizer dequantizes in-graph)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    logger = logging.getLogger("telugu_asr_tpu")

    from telugu_asr_tpu.utils import setup_environment

    setup_environment(platform=args.platform)

    from telugu_asr_tpu.audio.augment import Augmentation
    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.helpers import prepare_featurizers, prepare_training_datasets
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.optim import make_optimizer
    from telugu_asr_tpu.parallel.mesh import make_mesh
    from telugu_asr_tpu.train import TrainState, make_eval_step, make_train_step
    from telugu_asr_tpu.train.step import (
        make_transducer_eval_step,
        make_transducer_train_step,
    )
    from telugu_asr_tpu.train.loop import fit

    config = load_config(args.config)
    family = str(config.model_config.get("family", config.model_config.get("name", "moonshine")))
    family = "conformer" if "conformer" in family else "moonshine"
    featurizer, tokenizer = prepare_featurizers(config)

    model_state = {}
    if family == "conformer":
        from telugu_asr_tpu.data.dataset import DatasetSpec, TransducerASRDataset
        from telugu_asr_tpu.models.conformer.model import Conformer, ConformerConfig
        from telugu_asr_tpu.text import make_transducer_tokenizer

        tokenizer = make_transducer_tokenizer()
        transfer = None if args.f32_transfer else "int16"
        train_ds = TransducerASRDataset(
            DatasetSpec.from_config(config.data_config["train_dataset_config"], args.base_dir),
            tokenizer, seed=args.seed, transfer_dtype=transfer,
        )
        valid_ds = TransducerASRDataset(
            DatasetSpec.from_config(config.data_config["eval_dataset_config"], args.base_dir),
            tokenizer, seed=args.seed, transfer_dtype=transfer,
        )
        model = Conformer(
            ConformerConfig.from_model_config(config.model_config, tokenizer.vocab_size)
        )
        params, model_state = model.init(jax.random.PRNGKey(args.seed))
    else:
        train_ds, valid_ds = prepare_training_datasets(
            config, tokenizer, args.base_dir, args.seed,
            transfer_dtype=None if args.f32_transfer else "int16",
        )
        model = ASRModel(
            MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size)
        )
        params = model.init(jax.random.PRNGKey(args.seed))
    logger.info("family: %s", family)
    logger.info("train entries: %d, valid entries: %d", len(train_ds), len(valid_ds))
    logger.info("model params: %.3fM", model.num_params(params) / 1e6)

    running = config.learning_config["running_config"]
    optimizer, schedule = make_optimizer(
        config.learning_config["optimizer_config"], clip_norm=args.clip_norm
    )
    mesh = make_mesh(("data",))
    batch_size = args.batch_size or int(running.get("batch_size", 8))
    # global batch = per-replica batch x replica count (dataset_helpers.py:112)
    global_batch_size = batch_size * mesh.devices.size
    num_epochs = args.epochs or int(running.get("num_epochs", 10))

    l2 = 0.0
    reg = dict(config.model_config.get("kernel_regularizer", {}) or {})
    if reg.get("class_name") == "l2":
        l2 = float(reg.get("config", {}).get("l2", 0.0))

    augmentation = Augmentation(
        {
            "prob": 0.5,
            "feature_augment": {
                "freq_masking": {"num_masks": 1, "mask_factor": 27},
                "time_masking": {"num_masks": 1, "mask_factor": 100, "p_upperbound": 1.0},
            },
        }
    )

    # Fused Pallas featurizer+SpecAugment on TPU (~2x XLA path throughput).
    use_fused = jax.devices()[0].platform not in ("cpu",)
    if family == "conformer":
        train_step = make_transducer_train_step(
            model, optimizer, featurizer,
            augmentation=augmentation,
            global_batch_size=global_batch_size,
            l2=l2,
            use_fused_featurizer=use_fused,
        )
        eval_step = make_transducer_eval_step(
            model, featurizer, global_batch_size=global_batch_size, l2=l2
        )
    else:
        train_step = make_train_step(
            model,
            optimizer,
            featurizer,
            augmentation=augmentation,
            global_batch_size=global_batch_size,
            l2=l2,
            use_fused_featurizer=use_fused,
            compute_dtype="bfloat16" if args.bf16 else None,
        )
        eval_step = make_eval_step(
            model, featurizer, global_batch_size=global_batch_size, l2=l2
        )

    run_dir = args.run_dir or os.path.join(
        "data", "logs", family if family != "moonshine" else "model",
        datetime.date.today().isoformat(),
    )
    from telugu_asr_tpu.utils.metrics_writer import MetricsLogger

    tb = dict(running.get("tensorboard", {}) or {})
    metrics_logger = MetricsLogger(
        csv_path=os.path.join(run_dir, "steps.csv"),
        tensorboard_dir=os.path.join(run_dir, tb.get("log_dir", "tensorboard")),
    )

    on_epoch = None
    if args.val_wer_every > 0 and family == "moonshine":
        from telugu_asr_tpu.eval.harness import quick_val_wer

        def on_epoch(state, epoch):
            if epoch % args.val_wer_every != 0:
                return None
            return quick_val_wer(model, state.params, featurizer, valid_ds, batch_size)

    state = TrainState.create(params, optimizer, model_state)
    fit(
        train_step=train_step,
        eval_step=eval_step,
        state=state,
        train_dataset=train_ds,
        valid_dataset=valid_ds,
        batch_size=global_batch_size,
        num_epochs=num_epochs,
        run_dir=run_dir,
        seed=args.seed,
        mesh=mesh,
        steps_per_epoch=args.steps_per_epoch,
        metrics_logger=metrics_logger,
        on_epoch=on_epoch,
    )
    metrics_logger.close()
    logger.info("training complete; run dir: %s", run_dir)


if __name__ == "__main__":
    main()
