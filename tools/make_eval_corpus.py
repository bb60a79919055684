#!/usr/bin/env python3
"""Synthesize an eval corpus that mirrors a reference-schema TSV's durations.

Reads a ``PATH\tDURATION\tTRANSCRIPT`` TSV (the reference's committed
``data/test.tsv`` carries the REAL RESPIN test set's 2,226 durations and
transcripts — /root/reference/src/datasets.py TSV contract), writes one
noise WAV per row at the row's exact duration, and emits a new TSV pointing
at the local audio.  This reproduces the full-scale ``test.py`` wall-time
scenario (3.37 h of audio through C++ decode, bucketing, transfer, fused
decode) without the RESPIN audio, which does not exist in this image.

Usage:
    python tools/make_eval_corpus.py --tsv /root/reference/data/test.tsv \
        --out /tmp/fullscale [--limit N]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from telugu_asr_tpu.audio.io import write_wav_file  # noqa: E402

SR = 16000


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tsv", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    wav_dir = os.path.join(args.out, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    with open(args.tsv, "r", encoding="utf-8") as f:
        rows = [line.split("\t") for line in f.read().splitlines()[1:] if line]
    if args.limit:
        rows = rows[: args.limit]

    out_rows = ["PATH\tDURATION\tTRANSCRIPT"]
    total = 0.0
    for i, (_, duration, transcript) in enumerate(rows):
        n = int(round(float(duration) * SR))
        wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
        path = os.path.join(wav_dir, f"utt_{i:05d}.wav")
        write_wav_file(path, wave, SR)
        out_rows.append(f"{path}\t{duration}\t{transcript}")
        total += float(duration)

    tsv_path = os.path.join(args.out, "test.tsv")
    with open(tsv_path, "w", encoding="utf-8") as f:
        f.write("\n".join(out_rows) + "\n")
    print(f"{len(rows)} utterances, {total / 3600.0:.2f} h audio -> {tsv_path}")


if __name__ == "__main__":
    main()
