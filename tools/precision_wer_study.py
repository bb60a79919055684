#!/usr/bin/env python3
"""Serving-precision WER study on a TRAINED checkpoint (VERDICT r4 #2).

Evaluates the full test set under every serving fast path and reports the
WER/CER delta of each vs the f32 parity baseline — grounding the
"exact/near-exact" serving claims in the metric the reference publishes
(its README.md:27-29 WER is an f32 serving config).

Modes (greedy unless noted):
    f32              f32 weights + f32 KV caches (parity baseline)
    bf16             f32 weights + bf16 caches   (throughput default)
    bf16_fastseg     + bf16 per-segment vector chain (fastest greedy)
    int8cross        bf16 self caches + int8 cross caches (fused kernel)
    int8w            int8 weights (transcribe.py --int8 recipe) + bf16 caches
    beam4_f32        beam-4, f32 caches
    beam4_bf16       beam-4, bf16 caches

Usage:
    python tools/precision_wer_study.py \
        [--checkpoint-dir data/synth95k/run/checkpoints_best] \
        [--config data/synth95k/config.yaml] [--batch-size 64] \
        [--modes f32,bf16,...] [--out data/synth95k/precision_study]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = {
    # name -> (beam_size, kwargs for run_testing, int8_weights)
    "f32": (1, {"cache_dtype": "float32"}, False),
    "bf16": (1, {"cache_dtype": "bfloat16"}, False),
    "bf16_fastseg": (1, {"cache_dtype": "bfloat16", "fast_segments": True}, False),
    "int8cross": (1, {"cache_dtype": "bfloat16", "cross_cache_dtype": "int8"}, False),
    "int8w": (1, {"cache_dtype": "bfloat16"}, True),
    "beam4_f32": (4, {"cache_dtype": "float32"}, False),
    "beam4_bf16": (4, {"cache_dtype": "bfloat16"}, False),
    # the production operating point (REPORT.md round 5): repetition-penalty
    # decode — precision deltas measured where serving actually runs
    "beam4_f32_rp13": (4, {"cache_dtype": "float32",
                           "decode_opts": {"repetition_penalty": 1.3}}, False),
    "beam4_bf16_rp13": (4, {"cache_dtype": "bfloat16",
                            "decode_opts": {"repetition_penalty": 1.3}}, False),
    "beam4_bf16_rp13_int8w": (4, {"cache_dtype": "bfloat16",
                                  "decode_opts": {"repetition_penalty": 1.3}},
                              True),
}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint-dir",
                        default="data/synth95k/run/checkpoints_best")
    parser.add_argument("--config", default="data/synth95k/config.yaml")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--modes", default=",".join(MODES))
    parser.add_argument("--out", default="data/synth95k/precision_study")
    parser.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = parser.parse_args()

    from telugu_asr_tpu.utils import setup_environment

    setup_environment(platform=args.platform)

    import jax

    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.eval.harness import run_testing
    from telugu_asr_tpu.helpers import (
        prepare_featurizers,
        prepare_testing_datasets,
    )
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.train.checkpoint import CheckpointManager

    config = load_config(args.config)
    featurizer, tokenizer = prepare_featurizers(config)
    test_ds = prepare_testing_datasets(config, tokenizer, ".")
    model = ASRModel(
        MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size)
    )
    fparams = CheckpointManager(args.checkpoint_dir).restore_params()
    fparams = jax.tree_util.tree_map(jax.numpy.asarray, fparams)

    from telugu_asr_tpu.ops.quant import dequantize_pytree, quantize_pytree

    q = quantize_pytree(fparams)
    qparams = dequantize_pytree(q)
    for key in ("decoder", "text_embedding", "classifier"):
        qparams = dict(qparams)
        qparams[key] = q[key]

    os.makedirs(args.out, exist_ok=True)
    results = {}
    for name in args.modes.split(","):
        beam, kwargs, int8w = MODES[name]
        params = qparams if int8w else fparams
        output = os.path.join(args.out, f"output_{name}.tsv")
        metrics = run_testing(
            model, params, featurizer, test_ds, args.batch_size, output,
            beam_size=beam, **kwargs,
        )
        wer_key = "beam_wer" if beam > 1 else "greedy_wer"
        cer_key = "beam_cer" if beam > 1 else "greedy_cer"
        results[name] = {
            "wer": metrics.get(wer_key, metrics.get("greedy_wer")),
            "cer": metrics.get(cer_key, metrics.get("greedy_cer")),
            "rtfx": metrics.get("rtfx"),
        }
        print(f"{name}: {json.dumps(results[name])}", flush=True)

    base = results.get("f32") or next(iter(results.values()))
    lines = ["| mode | WER | ΔWER vs f32 | CER | ΔCER | eval RTFx |",
             "|---|---|---|---|---|---|"]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['wer']:.4f} | {r['wer'] - base['wer']:+.4f} "
            f"| {r['cer']:.4f} | {r['cer'] - base['cer']:+.4f} "
            f"| {r['rtfx']:.0f}x |")
    table = "\n".join(lines)
    print("\n" + table)
    with open(os.path.join(args.out, "RESULTS.md"), "w") as f:
        f.write(f"# Serving-precision WER study\n\ncheckpoint: "
                f"`{args.checkpoint_dir}`\n\n{table}\n")
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {args.out}/RESULTS.md")


if __name__ == "__main__":
    main()
