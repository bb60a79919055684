#!/usr/bin/env python3
"""Synthetic Telugu ASR corpora for data-free validation runs.

The RESPIN corpus the reference trained on (95,280 utterances,
/root/reference/data/logs/model/2025-09-04/train.log:3) is not shipped, so
end-to-end exercises (HPO sweeps, learning-dynamics probes) need a stand-in
corpus in the reference's TSV schema (PATH\\tDURATION\\tTRANSCRIPT,
/root/reference/src/datasets.py TSV contract). Two generation modes:

- ``noise``: random-noise audio + real Telugu transcripts. Audio carries no
  information; suitable for mechanics-only runs (HPO sweep pipelines,
  throughput tests) where only the optimization machinery matters.
- ``words``: compositional audio<->text structure at the WORD level. Each
  word of a closed vocabulary maps deterministically to a short melody (a
  sequence of pure tones whose frequencies/durations are derived from the
  word's hash); an utterance is 2..max_words words and its audio is the
  concatenation of the word melodies plus noise. Unlike the round-2
  "tone-world" (one tone per SUBWORD — defeated by LM memorization, see
  TODO.md #1), word-level composition with a large sampled utterance space
  cannot be memorized from text alone once the number of distinct sentences
  far exceeds the corpus: the model must use audio to know WHICH words were
  said. This is the corpus-scale learning proxy (VERDICT r2 next-round #8).

Writes {out}/wavs/*.wav, {out}/train.tsv, {out}/dev.tsv, {out}/test.tsv and
(optionally) a ready-to-train config YAML derived from a base config.

Usage:
    python tools/make_synthetic_corpus.py --out data/synth --mode words \\
        --n-train 2000 --n-valid 128 --n-test 64 [--config-out data/synth/config.yaml]
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from telugu_asr_tpu.audio.io import write_wav_file  # noqa: E402

SAMPLE_RATE = 16000

# Closed word vocabulary: common Telugu words drawn from the reference's
# committed evaluation transcripts (data/output.tsv ground truth column).
WORDS = [
    "కరెంటు", "బిల్లు", "ఒక", "వారం", "తిండి", "చక్కగా", "నియమాలు", "కూడా",
    "ఫోన్", "ఉంటే", "మీరు", "నేను", "అతను", "ఆమె", "మనం", "వాళ్ళు",
    "పని", "చేసి", "వచ్చి", "వెళ్ళి", "చెప్పు", "విను", "చూడు", "తీసుకో",
    "ఇప్పుడు", "రేపు", "నిన్న", "ఈరోజు", "మంచి", "పెద్ద", "చిన్న", "కొత్త",
    "ఇల్లు", "ఊరు", "నీళ్ళు", "అన్నం", "పాలు", "డబ్బు", "బడి", "పుస్తకం",
    "అమ్మ", "నాన్న", "అక్క", "తమ్ముడు", "స్నేహితుడు", "పండుగ", "వాన", "ఎండ",
]


def word_melody(word: str, rng: np.random.Generator) -> np.ndarray:
    """Deterministic per-word melody: 2-4 pure tones, 60-120 ms each.

    Frequencies land on a 24-note log grid between 200 Hz and 3.2 kHz so
    melodies are acoustically well separated after the 80-bin mel frontend.
    """
    h = hashlib.sha256(word.encode("utf-8")).digest()
    n_tones = 2 + h[0] % 3
    segs = []
    grid = np.geomspace(200.0, 3200.0, 24)
    for i in range(n_tones):
        freq = grid[h[1 + i] % 24]
        dur = 0.06 + (h[8 + i] % 7) * 0.01
        n = int(dur * SAMPLE_RATE)
        t = np.arange(n) / SAMPLE_RATE
        env = np.hanning(n)  # avoid clicks at tone boundaries
        segs.append(np.sin(2 * np.pi * freq * t) * env * 0.4)
    return np.concatenate(segs).astype(np.float32)


def make_utterance(rng: np.random.Generator, mode: str, max_words: int,
                   melodies: dict) -> tuple[np.ndarray, str]:
    n_words = int(rng.integers(2, max_words + 1))
    words = [WORDS[int(rng.integers(len(WORDS)))] for _ in range(n_words)]
    text = " ".join(words)
    if mode == "noise":
        n = int(rng.integers(12000, 28000))
        wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
        return wave, text
    gap = np.zeros(int(0.03 * SAMPLE_RATE), dtype=np.float32)
    parts = []
    for w in words:
        parts.append(melodies[w])
        parts.append(gap)
    wave = np.concatenate(parts[:-1])
    wave = wave + rng.standard_normal(wave.shape).astype(np.float32) * 0.01
    return wave.astype(np.float32), text


def write_split(root: str, name: str, n: int, rng: np.random.Generator,
                mode: str, max_words: int, melodies: dict) -> str:
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rows = ["PATH\tDURATION\tTRANSCRIPT"]
    for i in range(n):
        wave, text = make_utterance(rng, mode, max_words, melodies)
        path = os.path.join(wav_dir, f"{name}_{i:06d}.wav")
        write_wav_file(path, wave, SAMPLE_RATE)
        rows.append(f"{os.path.abspath(path)}\t{len(wave)/SAMPLE_RATE:.2f}\t{text}")
    tsv = os.path.join(root, f"{name}.tsv")
    with open(tsv, "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")
    return tsv


def emit_config(base_config: str, out_path: str, root: str) -> None:
    """Copy a base YAML with data paths pointed at the generated splits."""
    import yaml

    with open(base_config, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    dc = cfg["data_config"]
    dc["train_dataset_config"]["data_paths"] = [os.path.abspath(os.path.join(root, "train.tsv"))]
    dc["eval_dataset_config"]["data_paths"] = [os.path.abspath(os.path.join(root, "dev.tsv"))]
    dc["test_dataset_config"]["data_paths"] = [os.path.abspath(os.path.join(root, "test.tsv"))]
    with open(out_path, "w", encoding="utf-8") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True, sort_keys=False)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--mode", choices=("noise", "words"), default="words")
    p.add_argument("--n-train", type=int, default=2000)
    p.add_argument("--n-valid", type=int, default=128)
    p.add_argument("--n-test", type=int, default=64)
    p.add_argument("--max-words", type=int, default=6)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--config-out", default=None,
                   help="also write a train-ready YAML derived from --base-config")
    p.add_argument("--base-config", default="config/model.yaml")
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    melodies = {w: word_melody(w, rng) for w in WORDS}
    os.makedirs(args.out, exist_ok=True)
    for name, n in (("train", args.n_train), ("dev", args.n_valid), ("test", args.n_test)):
        tsv = write_split(args.out, name, n, rng, args.mode, args.max_words, melodies)
        print(f"wrote {tsv} ({n} utterances)")
    if args.config_out:
        emit_config(args.base_config, args.config_out, args.out)
        print(f"wrote {args.config_out}")
    n_sentences = len(WORDS) ** args.max_words
    print(f"word vocab {len(WORDS)}, utterance space ~{n_sentences:.1e} "
          f"(>> corpus size {args.n_train}: text memorization cannot solve it)")


if __name__ == "__main__":
    main()
