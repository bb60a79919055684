"""Per-stage timing of the flagship inference pipeline on the real chip.

Times three nested jits per duration bucket — featurizer only,
featurizer+encoder, and the full recognize (featurizer+encoder+decode) —
so stage costs come out by subtraction under identical input shapes.
Guides perf work: whichever stage dominates is the next optimization
target (decode was 9.3 of 17.4 ms at B=64 x 5.46 s when this was written).

Usage: python tools/bench_stages.py [--buckets 2.0,5.46,9.0,17.73]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--buckets", default="2.0,5.46,9.0,17.73")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--inner", type=int, default=4)
    args = parser.parse_args()

    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode
    from telugu_asr_tpu.text import make_default_tokenizer
    from telugu_asr_tpu.utils import setup_environment

    from __graft_entry__ import _flagship

    setup_environment()
    tokenizer = make_default_tokenizer()
    model = _flagship(tokenizer.vocab_size)
    params = model.init(jax.random.PRNGKey(0))
    featurizer = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))
    on_tpu = jax.devices()[0].platform not in ("cpu",)

    def feats(audio, lengths):
        if on_tpu:
            return featurizer.fused(audio, lengths)
        return featurizer(audio, lengths)

    @jax.jit
    def stage_feat(params, audio, lengths):
        features, feat_lengths = feats(audio, lengths)
        return jnp.sum(features) + jnp.sum(feat_lengths)

    @jax.jit
    def stage_enc(params, audio, lengths):
        features, feat_lengths = feats(audio, lengths)
        encoder_out, encoder_mask = model.encode(params, features, feat_lengths)
        return jnp.sum(encoder_out) + jnp.sum(encoder_mask)

    @jax.jit
    def stage_full(params, audio, lengths):
        features, feat_lengths = feats(audio, lengths)
        encoder_out, encoder_mask = model.encode(params, features, feat_lengths)
        max_len = default_max_length(features.shape[1])
        tokens, lens = greedy_decode(
            model, params, encoder_out, encoder_mask, max_length=max_len,
            bos_id=tokenizer.bos_token_id, eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id,
        )
        return jnp.sum(tokens) + jnp.sum(lens)

    from telugu_asr_tpu.utils.timing import round_trip_baseline, sync_timer

    def timed(fn, *fargs):
        return sync_timer(fn, *fargs, trials=args.trials, inner=args.inner,
                          round_trip=trip)

    rng = np.random.default_rng(0)
    buckets = [float(s) for s in args.buckets.split(",")]
    for seconds in buckets:
        samples = int(seconds * 16000)
        audio = jnp.asarray(
            rng.standard_normal((args.batch, samples)) * 0.1, jnp.float32
        )
        lengths = jnp.full((args.batch,), samples, jnp.int32)
        for fn in (stage_feat, stage_enc, stage_full):
            float(fn(params, audio, lengths))  # compile
        trip = round_trip_baseline(lengths)

        t_feat = timed(stage_feat, params, audio, lengths)
        t_enc = timed(stage_enc, params, audio, lengths)
        t_full = timed(stage_full, params, audio, lengths)
        print(json.dumps({
            "bucket_s": seconds,
            "batch": args.batch,
            "feat_ms": round(t_feat * 1000, 2),
            "encoder_ms": round((t_enc - t_feat) * 1000, 2),
            "decode_ms": round((t_full - t_enc) * 1000, 2),
            "total_ms": round(t_full * 1000, 2),
            "rtfx": round(args.batch * seconds / t_full, 1),
        }))


if __name__ == "__main__":
    main()
