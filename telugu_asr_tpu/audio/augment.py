"""SpecAugment — pure functions of explicit PRNG keys, batch-vectorized.

Reference semantics (src/augmentations/specaugment.py:6-62, augmentation.py:5-79):

* ``FreqMasking(num_masks=1, mask_factor=27)``: width ``f ~ U[0, mask_factor)``
  clamped to F, offset ``f0 ~ U[0, F - f)``, zero the band multiplicatively.
* ``TimeMasking(num_masks=1, mask_factor=100, p_upperbound)``: width
  ``t ~ U[0, mask_factor)`` clamped to ``T * p_upperbound``, offset within the
  valid frames.
* The driver applies each configured augmenter independently with probability
  ``prob`` (default 0.5).

TPU-first design: masks are built with broadcasted index comparisons (static
shapes, no concat of dynamic-size pieces) and vmapped over the batch with
per-example PRNG keys, so the whole augmentation fuses into the featurizer's
elementwise epilogue under jit.  Time masks are drawn within each utterance's
*valid* frame count, matching the reference's per-utterance application before
padding.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["freq_masking", "time_masking", "Augmentation"]


def _band_mask(size: int, start: jnp.ndarray, width: jnp.ndarray) -> jnp.ndarray:
    idx = jnp.arange(size)
    return (idx >= start) & (idx < start + width)


def freq_masking(
    key: jax.Array,
    features: jnp.ndarray,
    num_masks: int = 1,
    mask_factor: int = 27,
) -> jnp.ndarray:
    """Zero ``num_masks`` random mel bands of one utterance ``[T, F]``."""
    num_bins = features.shape[-1]
    for _ in range(num_masks):
        key, kf, k0 = jax.random.split(key, 3)
        f = jax.random.randint(kf, (), 0, mask_factor)
        f = jnp.minimum(f, num_bins)
        f0 = jax.random.randint(k0, (), 0, jnp.maximum(num_bins - f, 1))
        features = jnp.where(_band_mask(num_bins, f0, f)[None, :], 0.0, features)
    return features


def time_masking(
    key: jax.Array,
    features: jnp.ndarray,
    length: Optional[jnp.ndarray] = None,
    num_masks: int = 1,
    mask_factor: int = 100,
    p_upperbound: float = 1.0,
) -> jnp.ndarray:
    """Zero ``num_masks`` random frame bands within the valid frames of ``[T, F]``."""
    max_frames = features.shape[0]
    valid = max_frames if length is None else length
    for _ in range(num_masks):
        key, kt, k0 = jax.random.split(key, 3)
        t = jax.random.randint(kt, (), 0, mask_factor)
        t = jnp.minimum(t, (valid * p_upperbound).astype(jnp.int32) if length is not None
                        else jnp.asarray(int(max_frames * p_upperbound), jnp.int32))
        t0 = jax.random.randint(k0, (), 0, jnp.maximum(valid - t, 1))
        features = jnp.where(_band_mask(max_frames, t0, t)[:, None], 0.0, features)
    return features


class Augmentation:
    """Config-driven augmentation driver (reference augmentation.py:5-79).

    ``config = {"prob": 0.5, "feature_augment": {"freq_masking": {...},
    "time_masking": {...}}, "signal_augment": {...}}``.  Each augmenter fires
    independently with probability ``prob``.
    """

    def __init__(self, config: Optional[dict] = None):
        config = dict(config or {})
        self.prob = float(config.get("prob", 0.5))
        self.feature_config = dict(config.get("feature_augment", {}) or {})
        self.signal_config = dict(config.get("signal_augment", {}) or {})
        known = {"freq_masking", "time_masking"}
        for cfg in (self.feature_config, self.signal_config):
            unknown = set(cfg) - known
            if unknown:
                raise KeyError(f"No augmentation named: {unknown}; available: {sorted(known)}")

    @property
    def enabled(self) -> bool:
        return bool(self.feature_config or self.signal_config)

    def _apply_one(self, key, feats, length, name, params):
        params = dict(params or {})
        if name == "freq_masking":
            return freq_masking(key, feats, **params)
        return time_masking(key, feats, length, **params)

    def supports_fused(self) -> bool:
        """One freq + one time mask (the reference defaults) can fuse into the
        Pallas featurizer kernel as band parameters."""
        ok = {"freq_masking", "time_masking"}
        if not set(self.feature_config) <= ok or self.signal_config:
            return False
        for params in self.feature_config.values():
            if int((params or {}).get("num_masks", 1)) != 1:
                return False
        return True

    def sample_fused_params(
        self, key: jax.Array, feat_lengths: jnp.ndarray, num_bins: int
    ) -> jnp.ndarray:
        """Sample ``[B, 4]`` (f0, f, t0, t) bands for the fused kernel.

        Zero widths encode "no mask" (gate lost or augmenter unconfigured);
        distribution laws match :func:`freq_masking` / :func:`time_masking`.
        """
        batch = feat_lengths.shape[0]
        out = jnp.zeros((batch, 4), jnp.int32)
        fkey, tkey = jax.random.split(key)
        if "freq_masking" in self.feature_config:
            p = dict(self.feature_config["freq_masking"] or {})
            mask_factor = int(p.get("mask_factor", 27))
            kg, kf, k0 = jax.random.split(fkey, 3)
            f = jax.random.randint(kf, (batch,), 0, mask_factor)
            f = jnp.minimum(f, num_bins)
            f0 = jax.random.randint(k0, (batch,), 0, 1 << 30) % jnp.maximum(num_bins - f, 1)
            gate = jax.random.uniform(kg, (batch,)) < self.prob
            out = out.at[:, 0].set(f0).at[:, 1].set(jnp.where(gate, f, 0))
        if "time_masking" in self.feature_config:
            p = dict(self.feature_config["time_masking"] or {})
            mask_factor = int(p.get("mask_factor", 100))
            p_up = float(p.get("p_upperbound", 1.0))
            kg, kt, k0 = jax.random.split(tkey, 3)
            t = jax.random.randint(kt, (batch,), 0, mask_factor)
            t = jnp.minimum(t, (feat_lengths * p_up).astype(jnp.int32))
            t0 = jax.random.randint(k0, (batch,), 0, 1 << 30) % jnp.maximum(feat_lengths - t, 1)
            gate = jax.random.uniform(kg, (batch,)) < self.prob
            out = out.at[:, 2].set(t0).at[:, 3].set(jnp.where(gate, t, 0))
        return out

    def feature_augment(
        self, key: jax.Array, features: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Apply configured feature augmenters to a batch ``[B, T, F]``."""
        if not self.feature_config:
            return features
        batch = features.shape[0]

        def per_example(key, feats, length):
            for name, params in self.feature_config.items():
                key, kgate, kaug = jax.random.split(key, 3)
                gate = jax.random.uniform(kgate, ()) < self.prob
                augmented = self._apply_one(kaug, feats, length, name, params)
                feats = jnp.where(gate, augmented, feats)
            return feats

        keys = jax.random.split(key, batch)
        if lengths is None:
            lengths = jnp.full((batch,), features.shape[1], dtype=jnp.int32)
        return jax.vmap(per_example)(keys, features, lengths)
