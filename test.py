#!/usr/bin/env python3
"""Evaluate a trained model on the test set (reference entry: test.py).

Loads the latest (or given) checkpoint, runs batched KV-cached greedy
recognition over the test TSV, writes the reference-format result file and
prints WER/CER + throughput.

Usage:
    python test.py --config config/model.yaml --checkpoint-dir <run>/checkpoints
                   [--output output.tsv] [--batch-size 16] [--parity-unmasked-cross]
"""
from __future__ import annotations

import argparse
import logging

import jax


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="config/model.yaml")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--checkpoint-step", type=int, default=None)
    parser.add_argument("--output", default="output.tsv")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--base-dir", default=".")
    parser.add_argument(
        "--parity-unmasked-cross",
        action="store_true",
        help="reproduce the reference's unmasked cross-attention during decode",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    logger = logging.getLogger("telugu_asr_tpu")

    from telugu_asr_tpu.utils import setup_environment

    setup_environment()

    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.eval.harness import run_testing
    from telugu_asr_tpu.helpers import prepare_featurizers, prepare_testing_datasets
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.train.checkpoint import CheckpointManager

    config = load_config(args.config)
    featurizer, tokenizer = prepare_featurizers(config)
    test_ds = prepare_testing_datasets(config, tokenizer, args.base_dir)
    logger.info("test entries: %d", len(test_ds))

    model = ASRModel(MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size))
    if args.checkpoint_dir:
        ckpt = CheckpointManager(args.checkpoint_dir)
        params = ckpt.restore_params(args.checkpoint_step)
        logger.info("restored checkpoint step %s", args.checkpoint_step or ckpt.latest_step())
    else:
        logger.warning("no checkpoint given; evaluating randomly initialized weights")
        params = model.init(jax.random.PRNGKey(42))

    metrics = run_testing(
        model,
        params,
        featurizer,
        test_ds,
        args.batch_size,
        args.output,
        parity_unmasked_cross=args.parity_unmasked_cross,
    )
    for key, value in metrics.items():
        print(f"{key}: {value:.4f}" if isinstance(value, float) else f"{key}: {value}")


if __name__ == "__main__":
    main()
