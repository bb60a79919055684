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
    parser.add_argument("--beam", type=int, default=1,
                        help="beam size (1 = greedy; >1 uses beam search — "
                        "fused kernel on TPU when it fits)")
    parser.add_argument("--length-penalty", type=float, default=0.0,
                        help="beam: rank final hypotheses by score/len^a "
                        "(0 = raw scores, reference parity)")
    parser.add_argument("--repetition-penalty", type=float, default=1.0,
                        help="beam: CTRL-style demotion of already-emitted "
                        "tokens (>1 activates; off by default)")
    parser.add_argument("--no-repeat-ngram", type=int, default=0,
                        help="beam: hard-ban n-gram repeats inside a "
                        "hypothesis (n>=2 activates; off by default)")
    parser.add_argument("--cache-dtype", default=None,
                        choices=("float32", "bfloat16", "int8"),
                        help="KV-cache dtype (int8: fused TPU kernel only)")
    parser.add_argument("--cross-cache-dtype", default=None,
                        choices=("float32", "bfloat16", "int8"),
                        help="greedy fused: separate cross-cache dtype")
    parser.add_argument("--fast-segments", action="store_true",
                        help="greedy fused: bf16 per-segment vector chain "
                        "(fastest serving mode)")
    parser.add_argument("--int8", action="store_true",
                        help="serve int8-quantized weights (transcribe.py "
                        "recipe: encoder floats, decode serves int8)")
    parser.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force a JAX backend (default: auto — the TPU when present)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    logger = logging.getLogger("telugu_asr_tpu")

    from telugu_asr_tpu.utils import setup_environment

    setup_environment(platform=args.platform)

    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.eval.harness import run_testing
    from telugu_asr_tpu.helpers import prepare_featurizers, prepare_testing_datasets
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.train.checkpoint import CheckpointManager

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
        test_ds = TransducerASRDataset(
            DatasetSpec.from_config(config.data_config["test_dataset_config"], args.base_dir),
            tokenizer,
        )
        model = Conformer(
            ConformerConfig.from_model_config(config.model_config, tokenizer.vocab_size)
        )
    else:
        test_ds = prepare_testing_datasets(config, tokenizer, args.base_dir)
        model = ASRModel(
            MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size)
        )
    logger.info("family: %s, test entries: %d", family, len(test_ds))

    if args.checkpoint_dir:
        ckpt = CheckpointManager(args.checkpoint_dir)
        restored = ckpt.restore_raw(args.checkpoint_step)
        params = jax.tree_util.tree_map(jax.numpy.asarray, restored["params"])
        if restored.get("model_state"):
            model_state = jax.tree_util.tree_map(jax.numpy.asarray, restored["model_state"])
        logger.info("restored checkpoint step %s", args.checkpoint_step or ckpt.latest_step())
    else:
        logger.warning("no checkpoint given; evaluating randomly initialized weights")
        if family == "conformer":
            params, model_state = model.init(jax.random.PRNGKey(42))
        else:
            params = model.init(jax.random.PRNGKey(42))

    if args.int8:
        if family == "conformer":
            parser.error("--int8 serving is a moonshine decode mode")
        from telugu_asr_tpu.ops.quant import dequantize_pytree, quantize_pytree

        qparams = quantize_pytree(params)
        params = dequantize_pytree(qparams)
        # transcribe.py recipe: encoder computes in float, the decode loop
        # serves the int8 tree (fused kernel keeps it int8 in VMEM)
        for key in ("decoder", "text_embedding", "classifier"):
            params = dict(params)
            params[key] = qparams[key]

    metrics = run_testing(
        model,
        params,
        featurizer,
        test_ds,
        args.batch_size,
        args.output,
        parity_unmasked_cross=args.parity_unmasked_cross,
        family=family,
        model_state=model_state,
        beam_size=args.beam,
        decode_opts={
            "length_penalty": args.length_penalty,
            "repetition_penalty": args.repetition_penalty,
            "no_repeat_ngram": args.no_repeat_ngram,
        },
        cache_dtype=args.cache_dtype,
        cross_cache_dtype=args.cross_cache_dtype,
        fast_segments=args.fast_segments,
    )
    for key, value in metrics.items():
        print(f"{key}: {value:.4f}" if isinstance(value, float) else f"{key}: {value}")


if __name__ == "__main__":
    main()
