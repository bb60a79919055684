"""Mel filterbank and DCT matrices, numerically matching TensorFlow semantics.

The reference delegates to ``tf.signal.linear_to_mel_weight_matrix`` and
``tf.signal.mfccs_from_log_mel_spectrograms`` (src/speech_featurizer.py:114-130).
Reproducing WER requires "numerically equivalent log-mel features"
(BASELINE.md), so these constructions follow the published TF formulae:

* HTK mel scale: ``mel(f) = 1127.0 * ln(1 + f / 700.0)``.
* ``num_mel_bins + 2`` band edges linearly spaced in mel between the lower and
  upper edge frequencies; triangular weights from consecutive edge triplets;
  spectrogram bin 0 (DC) zeroed.
* MFCC = unnormalized DCT-II of the log-mel frames scaled by
  ``1/sqrt(2 * num_mel_bins)``.

Everything here is computed host-side in float32 — the same working precision
TF uses — so the constants match the reference's bit-for-bit (to rounding).
"""
from __future__ import annotations

import numpy as np

__all__ = ["hertz_to_mel", "linear_to_mel_weight_matrix", "dct_matrix"]

_MEL_BREAK_FREQUENCY_HERTZ = 700.0
_MEL_HIGH_FREQUENCY_Q = 1127.0


def hertz_to_mel(frequencies_hertz: np.ndarray) -> np.ndarray:
    frequencies_hertz = np.asarray(frequencies_hertz, dtype=np.float32)
    return (
        _MEL_HIGH_FREQUENCY_Q
        * np.log1p(frequencies_hertz / _MEL_BREAK_FREQUENCY_HERTZ)
    ).astype(np.float32)


def linear_to_mel_weight_matrix(
    num_mel_bins: int = 80,
    num_spectrogram_bins: int = 257,
    sample_rate: float = 16000.0,
    lower_edge_hertz: float = 0.0,
    upper_edge_hertz: float = 8000.0,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank of shape [num_spectrogram_bins, num_mel_bins]."""
    if num_mel_bins <= 0:
        raise ValueError("num_mel_bins must be positive")
    if lower_edge_hertz < 0.0 or lower_edge_hertz >= upper_edge_hertz:
        raise ValueError("require 0 <= lower_edge_hertz < upper_edge_hertz")
    nyquist_hertz = sample_rate / 2.0
    if upper_edge_hertz > nyquist_hertz:
        raise ValueError("upper_edge_hertz must be <= nyquist")

    bands_to_zero = 1  # DC bin excluded, matching TF
    linear_frequencies = np.linspace(
        0.0, nyquist_hertz, num_spectrogram_bins, dtype=np.float32
    )[bands_to_zero:]
    spectrogram_bins_mel = hertz_to_mel(linear_frequencies)[:, np.newaxis]

    band_edges_mel = np.linspace(
        hertz_to_mel(lower_edge_hertz),
        hertz_to_mel(upper_edge_hertz),
        num_mel_bins + 2,
        dtype=np.float32,
    )
    lower_edge_mel = band_edges_mel[np.newaxis, 0:-2]
    center_mel = band_edges_mel[np.newaxis, 1:-1]
    upper_edge_mel = band_edges_mel[np.newaxis, 2:]

    lower_slopes = (spectrogram_bins_mel - lower_edge_mel) / (center_mel - lower_edge_mel)
    upper_slopes = (upper_edge_mel - spectrogram_bins_mel) / (upper_edge_mel - center_mel)
    mel_weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))

    return np.pad(mel_weights, [[bands_to_zero, 0], [0, 0]]).astype(dtype)


def dct_matrix(num_mel_bins: int, dtype=np.float32) -> np.ndarray:
    """Matrix ``C`` with ``mfcc = log_mel @ C`` matching TF's MFCC op.

    ``C[n, k] = 2 * cos(pi * k * (2n + 1) / (2N)) / sqrt(2N)`` — unnormalized
    DCT-II columns scaled by ``rsqrt(2 * num_mel_bins)``.
    """
    n = np.arange(num_mel_bins, dtype=np.float64)[:, np.newaxis]
    k = np.arange(num_mel_bins, dtype=np.float64)[np.newaxis, :]
    basis = 2.0 * np.cos(np.pi * k * (2.0 * n + 1.0) / (2.0 * num_mel_bins))
    return (basis / np.sqrt(2.0 * num_mel_bins)).astype(dtype)
