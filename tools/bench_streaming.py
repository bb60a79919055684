#!/usr/bin/env python3
"""Streaming serving latency: per-tick partial latency + finalize latency.

Simulates a live microphone: a ``--seconds`` utterance fed in ``--chunk-ms``
chunks to :class:`telugu_asr_tpu.serving.streaming.StreamingRecognizer`
(1 s partial interval), flagship model, fused decode on TPU.  Reports the
compile-excluded per-tick latency distribution (median / p95 / max) and the
finalize latency — the numbers a voice-product integrator needs.

Each bucket shape compiles once (growing-window scheme, bounded ladder);
warmup pre-compiles every bucket by replaying the stream once, so the
reported ticks measure steady-state serving, not compiles.

With ``--checkpoint`` (and optionally ``--tsv``) it ALSO measures partial
QUALITY on real audio + trained weights: per-tick partial-vs-final WER
(``partial_wer_trajectory``) aggregated over ``--utts`` streams of
``--concat`` consecutive test utterances each, plus final-vs-groundtruth
WER — the two numbers a streaming consumer actually cares about
(VERDICT r4 weak #5).

Usage: python tools/bench_streaming.py [--seconds 17.0] [--chunk-ms 200]
           [--partial-interval 1.0] [--platform cpu]
           [--checkpoint data/synth95k/run/checkpoints_best]
           [--tsv data/synth95k/test.tsv] [--utts 8] [--concat 4]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seconds", type=float, default=17.0)
    parser.add_argument("--chunk-ms", type=int, default=200)
    parser.add_argument("--partial-interval", type=float, default=1.0)
    parser.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    parser.add_argument("--checkpoint", default=None,
                        help="trained checkpoint dir: adds the partial-"
                        "QUALITY lane on real audio")
    parser.add_argument("--tsv", default="data/synth95k/test.tsv")
    parser.add_argument("--utts", type=int, default=8,
                        help="number of streams for the quality lane")
    parser.add_argument("--concat", type=int, default=4,
                        help="consecutive test utterances concatenated per "
                        "stream (longer streams -> more ticks)")
    parser.add_argument("--repetition-penalty", type=float, default=1.0,
                        help="CTRL-style decode penalty for partials AND "
                        "finals (trained models; off = parity decode)")
    args = parser.parse_args()

    sys.path.insert(0, ".")
    from telugu_asr_tpu.utils import setup_environment

    setup_environment(platform=args.platform)

    import jax

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.serving.streaming import StreamingRecognizer
    from telugu_asr_tpu.text import make_default_tokenizer

    from __graft_entry__ import _flagship

    tokenizer = make_default_tokenizer()
    model = _flagship(tokenizer.vocab_size)
    if args.checkpoint:
        from telugu_asr_tpu.train.checkpoint import CheckpointManager

        params = CheckpointManager(args.checkpoint).restore_params()
    else:
        params = model.init(jax.random.PRNGKey(0))
    featurizer = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))

    rng = np.random.default_rng(0)
    sr = 16000
    audio = (rng.standard_normal(int(args.seconds * sr)) * 0.1).astype(np.float32)
    chunk = int(sr * args.chunk_ms / 1000)
    chunks = [audio[i:i + chunk] for i in range(0, len(audio), chunk)]

    rec = StreamingRecognizer(
        model, params, featurizer, tokenizer,
        partial_interval=args.partial_interval,
        repetition_penalty=args.repetition_penalty,
    )

    def stream(measure: bool):
        rec.reset()
        ticks = []
        for c in chunks:
            t0 = time.perf_counter()
            partial = rec.accept(c)
            dt = time.perf_counter() - t0
            if partial is not None and measure:
                ticks.append(dt)
        t0 = time.perf_counter()
        rec.finalize()
        fin = time.perf_counter() - t0
        return ticks, fin

    print(f"warmup (compiling each bucket of the ladder) ...", flush=True)
    t0 = time.perf_counter()
    stream(measure=False)
    print(f"warmup done in {time.perf_counter() - t0:.1f}s")

    ticks, fin = stream(measure=True)
    ticks_ms = np.asarray(ticks) * 1000
    print(
        f"streaming {args.seconds:.1f}s utterance, {args.chunk_ms}ms chunks, "
        f"{args.partial_interval:.1f}s partial interval: {len(ticks)} ticks"
    )
    print(
        f"partial tick latency ms: median={np.median(ticks_ms):.1f} "
        f"p95={np.percentile(ticks_ms, 95):.1f} max={ticks_ms.max():.1f}"
    )
    print(f"finalize latency ms: {fin * 1000:.1f}")

    if args.checkpoint:
        quality_lane(rec, tokenizer, args)


def quality_lane(rec, tokenizer, args) -> None:
    """Partial-vs-final WER trajectory + final-vs-groundtruth WER on real
    test audio with trained weights."""
    import csv

    from telugu_asr_tpu.audio.io import read_wav_file
    from telugu_asr_tpu.metrics.text import wer
    from telugu_asr_tpu.serving.streaming import partial_wer_trajectory

    with open(args.tsv, encoding="utf-8") as f:
        reader = csv.reader(f, delimiter="\t")
        next(reader)
        entries = [(row[0], row[2]) for row in reader]

    sr = 16000
    chunk = int(sr * args.chunk_ms / 1000)
    trajectories = []
    finals, refs = [], []
    tick_counts = []
    for u in range(args.utts):
        parts, texts = [], []
        for k in range(args.concat):
            path, text = entries[(u * args.concat + k) % len(entries)]
            audio, _ = read_wav_file(path)
            parts.append(np.asarray(audio, np.float32))
            texts.append(text)
        stream_audio = np.concatenate(parts)
        rec.reset()
        partials = []
        for off in range(0, stream_audio.size, chunk):
            partial = rec.accept(stream_audio[off : off + chunk])
            if partial is not None:
                partials.append(partial)
        final = rec.finalize()
        finals.append(final)
        refs.append(" ".join(texts))
        tick_counts.append(len(partials))
        if partials:
            trajectories.append(partial_wer_trajectory(partials, final))

    num, den = wer(finals, refs)
    print(f"\nquality lane: {args.utts} streams x {args.concat} utterances, "
          f"checkpoint={args.checkpoint}")
    print(f"final-vs-groundtruth WER: {num / max(den, 1.0):.4f} "
          f"({int(den)} ref words)")
    max_ticks = max((len(t) for t in trajectories), default=0)
    print("partial-vs-final WER by tick (mean over streams still active):")
    for t in range(max_ticks):
        vals = [traj[t] for traj in trajectories if len(traj) > t]
        frac = sum(1 for traj in trajectories if len(traj) > t)
        print(f"  tick {t + 1}: {np.mean(vals):.4f}  (n={frac})")
    lasts = [traj[-1] for traj in trajectories]
    if lasts:
        print(f"last-partial-vs-final WER: {np.mean(lasts):.4f} "
              f"(ticks/stream median {int(np.median(tick_counts))})")


if __name__ == "__main__":
    main()
