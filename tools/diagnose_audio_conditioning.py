#!/usr/bin/env python3
"""Diagnose whether a trained seq2seq model actually CONDITIONS on audio.

Seq2seq ASR can silently degenerate into a text language model (cross-
attention atrophies; teacher-forced loss still looks great because the text
is memorized/predictable).  The tell: teacher-forced accuracy is unchanged
when each utterance's AUDIO is swapped with another's.  This tool reports:

* teacher-forced argmax accuracy with matched audio,
* the same with audio shuffled across the batch (should COLLAPSE if the
  model uses audio),
* first-token accuracy (BOS → t1 is purely audio-conditioned).

Usage:
    python tools/diagnose_audio_conditioning.py --config cfg.yaml \
        --checkpoint-dir run/checkpoints [--tsv data/train.tsv] [--batch 16]
"""
from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--tsv", default=None, help="defaults to the config's train TSV")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--base-dir", default=".")
    args = parser.parse_args()

    from telugu_asr_tpu.utils import setup_environment

    setup_environment()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.data.dataset import ASRDataset, DatasetSpec
    from telugu_asr_tpu.helpers import prepare_featurizers
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.train.checkpoint import CheckpointManager

    config = load_config(args.config)
    featurizer, tokenizer = prepare_featurizers(config)
    model = ASRModel(MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size))
    params = jax.tree_util.tree_map(
        jnp.asarray, CheckpointManager(args.checkpoint_dir).restore_params()
    )
    spec = DatasetSpec.from_config(config.data_config["train_dataset_config"], args.base_dir)
    if args.tsv:
        spec.data_paths = [args.tsv]
    ds = ASRDataset(spec, tokenizer)

    inputs, labels, _ = next(ds.batches(args.batch))
    feats, fl = featurizer(jnp.asarray(inputs["audio"]), jnp.asarray(inputs["audio_lengths"]))
    shift = jnp.asarray(inputs["shifted_right_text_inputs"])
    tgt = labels["text_targets"]
    mask = tgt != tokenizer.pad_token_id

    def accuracy(features, lengths):
        logits = model.apply(params, features, lengths, shift)
        pred = np.asarray(jnp.argmax(logits, -1))
        return float((pred[mask] == tgt[mask]).mean()), pred

    acc, pred = accuracy(feats, fl)
    perm = np.random.default_rng(0).permutation(args.batch)
    acc_shuffled, _ = accuracy(feats[perm], fl[perm])
    first = float((pred[:, 0] == tgt[:, 0]).mean())

    print(f"teacher-forced accuracy (matched audio):   {acc:.4f}")
    print(f"teacher-forced accuracy (SHUFFLED audio):  {acc_shuffled:.4f}")
    print(f"first-token accuracy (audio-only signal):  {first:.4f}")
    if acc_shuffled > acc - 0.05:
        print("WARNING: audio shuffling barely hurts — the model is behaving "
              "as a text LM and likely ignores audio (cross-attention atrophy).")
    else:
        print("OK: the model conditions on audio.")


if __name__ == "__main__":
    main()
