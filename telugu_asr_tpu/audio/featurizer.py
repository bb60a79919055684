"""Log-mel / spectrogram / MFCC featurizer — batched, length-aware, jittable.

TPU-native rework of the reference ``SpeechFeaturizer``
(src/speech_featurizer.py:18-190).  Differences by design:

* The reference featurizes one utterance at a time on the host CPU inside
  ``tf.data`` (moonshine/dataset.py:159-164).  Here the featurizer is a pure
  JAX function over a padded batch ``[B, num_samples]`` plus explicit lengths,
  so it runs on-device under ``jit`` and vectorizes the STFT as one big
  matmul-friendly op.
* Frames beyond each utterance's valid frame count are zeroed, reproducing the
  reference's zero ``padded_batch`` padding (moonshine/dataset.py:225-238), so
  downstream "mask = any(feature != 0)" laws (moonshine/model.py:80) hold.
* Numerics match ``tf.signal.stft`` semantics: periodic Hann window of
  ``frame_length``, frames zero-padded to ``nfft`` before the rFFT,
  ``pad_end=False`` frame count ``1 + (n - frame_length) // frame_step``.

Pipeline (log_mel_spectrogram mode, reference :136-161):
pad → peak-normalize → preemphasis → frame+window+rFFT → |·|² → mel matmul →
log10 with floor.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.audio.mel import dct_matrix, linear_to_mel_weight_matrix

__all__ = ["FeaturizerConfig", "SpeechFeaturizer"]


@dataclasses.dataclass(frozen=True)
class FeaturizerConfig:
    """Featurizer hyperparameters (keys mirror speech_config in model.yaml:1-17)."""

    sample_rate: int = 16000
    frame_ms: int = 25
    stride_ms: int = 10
    num_feature_bins: int = 80
    feature_type: str = "log_mel_spectrogram"
    preemphasis: float = 0.97
    pad_end: bool = False
    lower_edge_hertz: float = 0.0
    upper_edge_hertz: float = 8000.0
    output_floor: float = 1e-9
    log_base: str = "10"
    nfft: Optional[int] = 512
    normalize_signal: bool = False
    normalize_zscore: bool = False
    normalize_min_max: bool = False
    padding: float = 0.0

    @classmethod
    def from_dict(cls, config: dict) -> "FeaturizerConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in dict(config).items() if k in fields})

    @property
    def frame_length(self) -> int:
        return int(round(self.sample_rate * self.frame_ms / 1000.0))

    @property
    def frame_step(self) -> int:
        return int(round(self.sample_rate * self.stride_ms / 1000.0))

    @property
    def fft_length(self) -> int:
        return self.frame_length if self.nfft is None else int(self.nfft)


def _dequantize_pcm16(signals: jnp.ndarray) -> jnp.ndarray:
    """Accept int16 PCM batches: dequantize to float32 in [-1, 1).

    Audio crosses the host→device link at HALF the bytes when shipped as
    int16 (the training loop's dominant cost on the tunnelled TPU is batch
    upload, not the 10 ms step).  WAV sources are PCM16, so
    ``rint(x·32768)`` on the host followed by ``/32768`` here reproduces the
    float pipeline BIT-EXACTLY; other sources round at ~3e-5 full scale,
    far below the featurizer's 1e-9 log floor."""
    if signals.dtype == jnp.int16:
        return signals.astype(jnp.float32) * (1.0 / 32768.0)
    return signals


class SpeechFeaturizer:
    """Stateless featurizer; ``__call__`` is pure and jittable.

    The mel/DCT matrices and window are host-precomputed constants closed over
    by the jitted function.
    """

    SUPPORTED = ("log_mel_spectrogram", "spectrogram", "mfcc", "waveform")

    def __init__(self, config: Optional[FeaturizerConfig] = None, **kwargs):
        if config is None:
            config = FeaturizerConfig(**kwargs)
        elif kwargs:
            config = dataclasses.replace(config, **kwargs)
        if config.feature_type not in self.SUPPORTED:
            raise ValueError(
                f"Unsupported feature type: {config.feature_type}; supported: {self.SUPPORTED}"
            )
        if config.log_base not in ("10", "e"):
            raise ValueError("log_base must be '10' or 'e'")
        self.config = config

        c = config
        # Periodic Hann window (tf.signal.stft default window_fn).
        n = np.arange(c.frame_length, dtype=np.float64)
        self._window = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / c.frame_length)).astype(np.float32)
        num_spec_bins = c.fft_length // 2 + 1
        self._mel_matrix = linear_to_mel_weight_matrix(
            num_mel_bins=c.num_feature_bins,
            num_spectrogram_bins=num_spec_bins,
            sample_rate=c.sample_rate,
            lower_edge_hertz=c.lower_edge_hertz,
            upper_edge_hertz=c.upper_edge_hertz,
        )
        self._dct_matrix = dct_matrix(c.num_feature_bins)

    # -- shape laws ----------------------------------------------------------
    def get_nframes(self, nsamples: int):
        """Valid frame count (reference speech_featurizer.py:163-166)."""
        c = self.config
        if c.pad_end:
            return -(-nsamples // c.frame_step)
        return 1 + (nsamples - c.frame_length) // c.frame_step

    @property
    def feature_dim(self) -> int:
        if self.config.feature_type == "waveform":
            return 1
        return self.config.num_feature_bins

    # -- pure compute --------------------------------------------------------
    def _preprocess(self, signals: jnp.ndarray) -> jnp.ndarray:
        """Peak-normalize + preemphasis over the last axis (reference :68-79)."""
        c = self.config
        if c.normalize_signal:
            gain = 1.0 / (jnp.max(jnp.abs(signals), axis=-1, keepdims=True) + 1e-9)
            signals = signals * gain
        if c.preemphasis and c.preemphasis > 0.0:
            head = signals[..., :1]
            tail = signals[..., 1:] - c.preemphasis * signals[..., :-1]
            signals = jnp.concatenate([head, tail], axis=-1)
        return signals

    def _stft_power(self, signals: jnp.ndarray) -> jnp.ndarray:
        """[B, n] → power spectrum [B, T, nfft//2+1]; T from the padded length."""
        c = self.config
        n = signals.shape[-1]
        num_frames = max(int(self.get_nframes(n)), 0)
        if c.pad_end:
            # zero-pad so the last frame is fully in-bounds (tf.signal.stft
            # pad_end semantics); JAX gather would otherwise CLAMP indices.
            needed = (num_frames - 1) * c.frame_step + c.frame_length
            if needed > n:
                signals = jnp.pad(signals, [(0, 0)] * (signals.ndim - 1) + [(0, needed - n)])
        starts = np.arange(num_frames) * c.frame_step
        # Gather frames: [B, T, frame_length].  As static slicing this lowers
        # to an XLA gather that fuses with the windowing multiply.
        idx = starts[:, None] + np.arange(c.frame_length)[None, :]
        frames = signals[..., idx]
        frames = frames * self._window
        spec = jnp.fft.rfft(frames, n=c.fft_length, axis=-1)
        return jnp.abs(spec).astype(jnp.float32) ** 2

    def _logarithm(self, s: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        s = jnp.maximum(s, c.output_floor)
        if c.log_base == "10":
            return jnp.log(s) / np.log(10.0).astype(np.float32)
        return jnp.log(s)

    def _log_mel(self, power: jnp.ndarray) -> jnp.ndarray:
        mel = power @ jnp.asarray(self._mel_matrix)
        return self._logarithm(mel)

    def _normalize_feature(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Feature normalization (reference :81-93; axis=1 of [T, F] = mel axis)."""
        c = self.config
        if c.normalize_zscore:
            mean = jnp.mean(feats, axis=-1, keepdims=True)
            std = jnp.sqrt(jnp.var(feats, axis=-1, keepdims=True) + 1e-9)
            return (feats - mean) / std
        if c.normalize_min_max:
            if c.feature_type == "spectrogram":
                min_value = self._logarithm(jnp.asarray(c.output_floor, jnp.float32))
            else:
                min_value = jnp.min(feats, axis=-1, keepdims=True)
            return (feats - min_value) / (jnp.max(feats, axis=-1, keepdims=True) - min_value)
        return feats

    @partial(jax.jit, static_argnums=(0,))
    def __call__(
        self, signals: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Featurize a padded batch.

        Args:
          signals: ``[B, num_samples]`` float32 (zero-padded) or ``[num_samples]``.
          lengths: ``[B]`` int32 valid sample counts; defaults to full length.

        Returns:
          ``(features [B, T, F], feature_lengths [B])`` with frames at index >=
          feature_length zeroed (mimicking the reference's zero padding).
        """
        squeeze = signals.ndim == 1
        if squeeze:
            signals = signals[None, :]
        signals = _dequantize_pcm16(signals)
        batch = signals.shape[0]
        if lengths is None:
            lengths = jnp.full((batch,), signals.shape[-1], dtype=jnp.int32)
        lengths = lengths.astype(jnp.int32)

        c = self.config
        if c.padding > 0:
            pad = int(c.padding)
            signals = jnp.pad(signals, [(0, 0), (0, pad)])
            lengths = lengths + pad

        if c.feature_type == "waveform":
            feats = self._preprocess(signals)[..., None]
            feat_lengths = lengths
            mask = jnp.arange(feats.shape[1])[None, :] < feat_lengths[:, None]
            feats = jnp.where(mask[..., None], feats, 0.0)
            if squeeze:
                return feats[0], feat_lengths[0]
            return feats, feat_lengths

        # Zero out padded samples before preprocessing so per-utterance peak
        # normalization and preemphasis see only valid audio.
        sample_mask = jnp.arange(signals.shape[-1])[None, :] < lengths[:, None]
        signals = jnp.where(sample_mask, signals, 0.0)
        signals = self._preprocess(signals)
        signals = jnp.where(sample_mask, signals, 0.0)

        power = self._stft_power(signals)
        if c.feature_type == "spectrogram":
            feats = self._logarithm(power)[..., : c.num_feature_bins]
        elif c.feature_type == "log_mel_spectrogram":
            feats = self._log_mel(power)
        elif c.feature_type == "mfcc":
            feats = self._log_mel(power) @ jnp.asarray(self._dct_matrix)
        else:  # pragma: no cover
            raise AssertionError(c.feature_type)

        feats = self._normalize_feature(feats)

        if c.pad_end:
            feat_lengths = -(-lengths // c.frame_step)
        else:
            feat_lengths = 1 + (lengths - c.frame_length) // c.frame_step
        feat_lengths = jnp.maximum(feat_lengths, 0).astype(jnp.int32)
        frame_mask = jnp.arange(feats.shape[1])[None, :] < feat_lengths[:, None]
        feats = jnp.where(frame_mask[..., None], feats, 0.0)

        if squeeze:
            return feats[0], feat_lengths[0]
        return feats, feat_lengths

    # -- fused Pallas path ---------------------------------------------------
    @partial(jax.jit, static_argnums=(0,), static_argnames=("interpret",))
    def fused(
        self,
        signals: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        aug_params: Optional[jnp.ndarray] = None,
        interpret: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused Pallas log-mel (+ SpecAugment bands): same contract as
        ``__call__`` for ``feature_type='log_mel_spectrogram'``; ~2x the
        XLA path's throughput on TPU v5e (one HBM pass, two MXU matmuls).

        ``aug_params [B, 4]`` comes from
        :meth:`telugu_asr_tpu.audio.augment.Augmentation.sample_fused_params`.
        """
        from telugu_asr_tpu.ops.pallas.melspec import fused_log_mel

        c = self.config
        if c.feature_type != "log_mel_spectrogram":
            raise ValueError("fused path supports log_mel_spectrogram only")
        signals = _dequantize_pcm16(signals)
        batch = signals.shape[0]
        if lengths is None:
            lengths = jnp.full((batch,), signals.shape[-1], dtype=jnp.int32)
        lengths = lengths.astype(jnp.int32)
        sample_mask = jnp.arange(signals.shape[-1])[None, :] < lengths[:, None]
        signals = jnp.where(sample_mask, signals, 0.0)
        signals = jnp.where(sample_mask, self._preprocess(signals), 0.0)

        num_frames = max(int(self.get_nframes(signals.shape[-1])), 1)
        feat_lengths = jnp.maximum(
            1 + (lengths - c.frame_length) // c.frame_step, 0
        ).astype(jnp.int32)
        feats = fused_log_mel(
            signals,
            feat_lengths,
            frame_length=c.frame_length,
            frame_step=c.frame_step,
            fft_length=c.fft_length,
            num_mel_bins=c.num_feature_bins,
            sample_rate=c.sample_rate,
            lower_edge_hertz=c.lower_edge_hertz,
            upper_edge_hertz=c.upper_edge_hertz,
            output_floor=c.output_floor,
            num_frames=num_frames,
            aug_params=aug_params,
            interpret=interpret,
        )
        return feats[:, :num_frames], feat_lengths
