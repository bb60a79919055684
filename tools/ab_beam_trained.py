#!/usr/bin/env python3
"""A/B the fused-beam cache-reorder ledger on a TRAINED model's real decodes.

The ancestor-ledger + identity-step optimizations
(ops/pallas/decode_fused_beam.py) collapse the per-step parent cache reorder
to the beam divergence window.  Their win is workload-dependent: on
``bench.py --mode beam``'s worst case (untrained weights, no EOS, full cap)
beams never converge and the ledger is dormant, while on a trained model
beams agree on the prefix and finish early.  This tool measures that real
win: it decodes a fixed batch of real test utterances through the fused beam
kernel with trained weights, timed with the shared sync recipe, and is meant
to be run twice —

    python tools/ab_beam_trained.py --config ... --checkpoint-dir ...   # ledger
    TELUGU_BEAM_EAGER=1 python tools/ab_beam_trained.py ...             # eager

(the env var pins the pre-ledger full-sweep reorder at trace time; separate
processes so each gets a clean jit cache).  Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--tsv", default=None, help="default: the config's test TSV")
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--base-dir", default=".")
    args = p.parse_args()

    from telugu_asr_tpu.utils import setup_environment

    setup_environment()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.data.dataset import ASRDataset, DatasetSpec
    from telugu_asr_tpu.decode.beam import beam_search_decode
    from telugu_asr_tpu.decode.greedy import default_max_length
    from telugu_asr_tpu.helpers import prepare_featurizers
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.train.checkpoint import CheckpointManager
    from telugu_asr_tpu.utils.timing import round_trip_baseline, sync_timer

    config = load_config(args.config)
    featurizer, tokenizer = prepare_featurizers(config)
    model = ASRModel(
        MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size)
    )
    params = CheckpointManager(args.checkpoint_dir).restore_params()

    spec = DatasetSpec.from_config(config.data_config["test_dataset_config"], args.base_dir)
    if args.tsv:
        spec.data_paths = [args.tsv]
    ds = ASRDataset(spec, tokenizer)
    inputs, _, _ = next(iter(ds.batches(args.batch)))
    audio = jnp.asarray(inputs["audio"])
    lengths = jnp.asarray(inputs["audio_lengths"])

    n_frames = featurizer.get_nframes(audio.shape[-1])
    max_len = default_max_length(int(n_frames))
    max_len = ((max_len + 7) // 8) * 8
    # True audio seconds per utterance (padded-capacity seconds would inflate
    # the absolute rtfx on variable-length batches; the ledger-vs-eager ratio
    # is unaffected either way).
    padded_s = audio.shape[-1] / 16000.0
    true_total_s = float(jnp.sum(lengths)) / 16000.0

    @jax.jit
    def decode(params, audio, lengths):
        features, feat_lengths = featurizer(audio, lengths)
        enc, enc_mask = model.encode(params, features, feat_lengths)
        tokens, scores = beam_search_decode(
            model, params, enc, enc_mask,
            max_length=max_len, beam_size=args.beam,
            bos_id=tokenizer.bos_token_id, eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id, attention_impl="fused",
        )
        return jnp.sum(tokens)  # device scalar checksum (sync_timer contract)

    rt = round_trip_baseline(jnp.zeros((8, 8)))
    sec = sync_timer(decode, params, audio, lengths,
                     trials=args.trials, round_trip=rt)
    out = {
        "mode": "eager" if os.environ.get("TELUGU_BEAM_EAGER") == "1" else "ledger",
        "beam": args.beam,
        "batch": int(audio.shape[0]),
        "padded_s_per_utt": round(padded_s, 3),
        "true_audio_s_total": round(true_total_s, 3),
        "median_ms": round(sec * 1e3, 3),
        "rtfx": round(true_total_s / sec, 1),
        "rtfx_padded_capacity": round(padded_s * int(audio.shape[0]) / sec, 1),
        "max_length": max_len,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
