#!/usr/bin/env python3
"""Dataset preparation: build reference-format TSVs from audio+transcript
pairs, with Unicode NFC normalization.

Runtime-relevant replacement for the reference's offline EDA notebooks
(EDA/eda.ipynb: TSV prep + NFC normalization — SURVEY §2 last row).  The
OpenAI batch transliteration pipeline (EDA/batch.py) is out of scope for a
zero-egress training image and not part of the reference's runtime stack.

Usage:
    python tools/prepare_dataset.py --audio-dir wavs/ --transcripts trans.tsv \
        --output data/train.tsv [--splits 0.9,0.05,0.05]

``--transcripts`` maps utterance id (wav basename sans extension) to text,
one ``id\ttext`` per line.  Durations are read from the WAV headers.
"""
from __future__ import annotations

import argparse
import os
import unicodedata
from typing import Dict, List, Tuple

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from telugu_asr_tpu.audio.io import read_wav_file  # noqa: E402


def normalize_text(text: str) -> str:
    """NFC normalization + whitespace collapse (reference EDA convention)."""
    return " ".join(unicodedata.normalize("NFC", text).split())


def collect(audio_dir: str, transcripts: Dict[str, str]) -> List[Tuple[str, float, str]]:
    rows = []
    for root, _, files in os.walk(audio_dir):
        for name in sorted(files):
            if not name.lower().endswith(".wav"):
                continue
            utt_id = os.path.splitext(name)[0]
            if utt_id not in transcripts:
                continue
            path = os.path.join(root, name)
            wave, sr = read_wav_file(path)
            rows.append((path, len(wave) / sr, normalize_text(transcripts[utt_id])))
    return rows


def write_tsv(rows: List[Tuple[str, float, str]], output: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(output)) or ".", exist_ok=True)
    with open(output, "w", encoding="utf-8") as f:
        f.write("PATH\tDURATION\tTRANSCRIPT\n")
        for path, duration, text in rows:
            f.write(f"{path}\t{duration:.2f}\t{text}\n")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--audio-dir", required=True)
    parser.add_argument("--transcripts", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--splits", default=None, help="e.g. 0.9,0.05,0.05 → train/dev/test TSVs")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    transcripts: Dict[str, str] = {}
    with open(args.transcripts, "r", encoding="utf-8") as f:
        for line in f.read().splitlines():
            parts = line.split("\t", 1)
            if len(parts) == 2:
                transcripts[parts[0]] = parts[1]

    rows = collect(args.audio_dir, transcripts)
    print(f"collected {len(rows)} utterances")
    if not args.splits:
        write_tsv(rows, args.output)
        return
    import numpy as np

    fracs = [float(x) for x in args.splits.split(",")]
    order = np.random.default_rng(args.seed).permutation(len(rows))
    base, ext = os.path.splitext(args.output)
    names = ["train", "dev", "test"]
    start = 0
    for name, frac in zip(names, fracs):
        count = int(round(frac * len(rows)))
        subset = [rows[i] for i in order[start : start + count]]
        write_tsv(subset, f"{base}.{name}{ext or '.tsv'}")
        print(f"{name}: {len(subset)} rows")
        start += count


if __name__ == "__main__":
    main()
