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

Usage: python tools/bench_streaming.py [--seconds 17.0] [--chunk-ms 200]
           [--partial-interval 1.0] [--platform cpu]
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


if __name__ == "__main__":
    main()
