"""WER / CER metrics — pure Python, no jiwer dependency.

The reference computes jiwer WER/CER per utterance and accumulates
``rate * reference_length`` over utterances (src/utils/metric_util.py:5-62),
i.e. numerator = Levenshtein edit distance, denominator = reference length.
We accumulate the same quantities directly; ``ErrorRate`` mirrors the
streaming numerator/denominator Keras metric (src/metrics/asr_metrics.py:4-28).
"""
from __future__ import annotations

from typing import Callable, Iterable, Sequence, Tuple

__all__ = ["edit_distance", "wer", "cer", "ErrorRate"]


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance between two token sequences (two-row DP)."""
    if ref == hyp:
        return 0
    if len(ref) == 0:
        return len(hyp)
    if len(hyp) == 0:
        return len(ref)
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, start=1):
        curr = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, start=1):
            curr[j] = min(
                prev[j] + 1,  # deletion
                curr[j - 1] + 1,  # insertion
                prev[j - 1] + (r != h),  # substitution / match
            )
        prev = curr
    return prev[-1]


def wer(decode: Iterable[str], target: Iterable[str]) -> Tuple[float, float]:
    """Accumulated (word edit distance, reference word count) over a batch.

    Matches metric_util.execute_wer: whitespace word split, weighted by
    reference word count.
    """
    num = 0.0
    den = 0.0
    for dec, tar in zip(decode, target):
        ref_words = tar.split()
        hyp_words = dec.split()
        num += edit_distance(ref_words, hyp_words)
        den += len(ref_words)
    return num, den


def cer(decode: Iterable[str], target: Iterable[str]) -> Tuple[float, float]:
    """Accumulated (char edit distance, reference char count) over a batch."""
    num = 0.0
    den = 0.0
    for dec, tar in zip(decode, target):
        num += edit_distance(list(tar), list(dec))
        den += len(tar)
    return num, den


class ErrorRate:
    """Streaming numerator/denominator metric (asr_metrics.py:4-28)."""

    def __init__(self, func: Callable[[Iterable[str], Iterable[str]], Tuple[float, float]], name: str = "error_rate"):
        self.func = func
        self.name = name
        self.numerator = 0.0
        self.denominator = 0.0

    def update_state(self, decode: Iterable[str], target: Iterable[str]) -> None:
        n, d = self.func(decode, target)
        self.numerator += n
        self.denominator += d

    def result(self) -> float:
        if self.denominator == 0:
            return 0.0
        return self.numerator / self.denominator

    def reset_state(self) -> None:
        self.numerator = 0.0
        self.denominator = 0.0
