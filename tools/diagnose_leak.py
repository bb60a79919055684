#!/usr/bin/env python3
"""Discriminate the long-training host-RSS leak (round-5 OOM incident).

Runs the flagship train step on synthetic batches (no disk IO) and logs
host RSS + JAX live-array census every --probe-every steps, under three
transfer regimes:

    fresh     new host->device transfer of a fresh numpy batch per step
              (the production loop's behavior)
    reuse     one device batch transferred once, reused every step
              (isolates per-dispatch cost from per-transfer cost)
    fresh-sync  like fresh, but a scalar readback every step (bounds the
              dispatch queue to 1 in-flight execution)

If `reuse` is flat while `fresh` grows, the leak is the transfer staging
path (host buffers pinned per device_put on the tunnel client).  If both
grow with live-array count flat, it is native (below JAX).  If live-array
count grows, something in Python retains arrays — dump referrers.

Usage: python tools/diagnose_leak.py [--mode fresh|reuse|fresh-sync]
           [--steps 300] [--probe-every 25] [--batch 64] [--seconds 1.3]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])
    return 0


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mode", default="fresh",
                        choices=("fresh", "reuse", "fresh-sync"))
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--probe-every", type=int, default=25)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=1.3)
    parser.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = parser.parse_args()

    from telugu_asr_tpu.utils import setup_environment

    setup_environment(platform=args.platform)

    import jax
    import numpy as np

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.optim import make_optimizer
    from telugu_asr_tpu.text import make_default_tokenizer
    from telugu_asr_tpu.train import TrainState, make_train_step

    from __graft_entry__ import _flagship

    tokenizer = make_default_tokenizer()
    model = _flagship(tokenizer.vocab_size)
    params = model.init(jax.random.PRNGKey(0))
    featurizer = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))
    optimizer, _ = make_optimizer(
        {"class_name": "Adam", "config": {"learning_rate": 5e-5}})
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    step = make_train_step(model, optimizer, featurizer,
                           global_batch_size=args.batch, l2=1e-6,
                           use_fused_featurizer=on_tpu)
    state = TrainState.create(params, optimizer)
    key = jax.random.PRNGKey(0)

    samples = int(args.seconds * 16000)
    u = 24
    rng = np.random.default_rng(0)

    def host_batch():
        return {
            "audio": (rng.standard_normal((args.batch, samples)) * 0.1).astype(np.float32),
            "audio_lengths": np.full((args.batch,), samples, np.int32),
            "shifted_right_text_inputs": rng.integers(
                4, tokenizer.vocab_size, (args.batch, u)).astype(np.int32),
            "text_targets": rng.integers(
                4, tokenizer.vocab_size, (args.batch, u)).astype(np.int32),
        }

    pinned = jax.device_put(host_batch()) if args.mode == "reuse" else None

    # warm compile
    state, metrics = step(state, pinned if pinned is not None else jax.device_put(host_batch()), key)
    float(metrics["loss"])
    base = rss_kb()
    print(f"mode={args.mode} batch_bytes~{args.batch * samples * 4 / 1e6:.1f}MB "
          f"base_rss={base / 1e6:.2f}GB", flush=True)

    for i in range(1, args.steps + 1):
        batch = pinned if pinned is not None else jax.device_put(host_batch())
        state, metrics = step(state, batch, key)
        if args.mode == "fresh-sync":
            float(metrics["loss"])
        if i % args.probe_every == 0:
            float(metrics["loss"])  # drain the dispatch queue before probing
            live = jax.live_arrays()
            nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in live)
            cur = rss_kb()
            print(f"step {i:4d} rss={cur / 1e6:.2f}GB "
                  f"d_rss={(cur - base) / 1e3:.0f}MB "
                  f"per_step={(cur - base) / i / 1e0:.0f}KB "
                  f"live_arrays={len(live)} live_bytes={nbytes / 1e6:.1f}MB",
                  flush=True)


if __name__ == "__main__":
    main()
