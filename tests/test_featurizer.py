"""Featurizer numerics vs TensorFlow golden vectors (BASELINE.md parity bar)."""
import os

import numpy as np
import pytest

from telugu_asr_tpu.audio import SpeechFeaturizer
from telugu_asr_tpu.audio.featurizer import FeaturizerConfig
from telugu_asr_tpu.audio.mel import linear_to_mel_weight_matrix

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "featurizer_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def featurizer():
    return SpeechFeaturizer(
        FeaturizerConfig(normalize_signal=True, preemphasis=0.97, nfft=512)
    )


def test_mel_matrix_matches_tf(golden):
    ours = linear_to_mel_weight_matrix(80, 257, 16000, 0.0, 8000.0)
    # 2e-5 headroom: TF's CPU kernels (oneDNN) round float32 slightly
    # differently; downstream log-mel agreement is asserted at 2e-4.
    np.testing.assert_allclose(ours, golden["mel_matrix_80_257"], atol=2e-5)


@pytest.mark.parametrize("case", ["short", "med", "odd"])
def test_log_mel_matches_tf(golden, featurizer, case):
    sig = golden[f"{case}_signal"]
    feats, length = featurizer(sig)
    ref = golden[f"{case}_logmel"]
    assert int(length) == ref.shape[0]
    # 5e-3 in log10 domain: float32 FFT implementations (pocketfft vs Eigen)
    # round differently; the error concentrates in near-floor mel bins where
    # log10 amplifies ~2e-4 relative power error.  Feature dynamic range is
    # ~[-9, 2], so this is ~0.05% of range.
    np.testing.assert_allclose(np.asarray(feats)[: ref.shape[0]], ref, atol=5e-3)


@pytest.mark.parametrize("case", ["short", "med"])
def test_mfcc_matches_tf(golden, case):
    f = SpeechFeaturizer(
        FeaturizerConfig(feature_type="mfcc", normalize_signal=True, preemphasis=0.97)
    )
    feats, length = f(golden[f"{case}_signal"])
    ref = golden[f"{case}_mfcc"]
    # DCT sums 80 log-mel bins, so per-bin 5e-3 tolerance accumulates.
    np.testing.assert_allclose(np.asarray(feats)[: ref.shape[0]], ref, atol=5e-2)


def test_batched_matches_per_utterance(golden, featurizer):
    """Padded-batch featurization must equal per-utterance featurization."""
    sigs = [golden["short_signal"], golden["med_signal"], golden["odd_signal"]]
    maxlen = max(len(s) for s in sigs)
    batch = np.zeros((3, maxlen), np.float32)
    lengths = np.zeros((3,), np.int32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
        lengths[i] = len(s)
    feats, feat_lengths = featurizer(batch, lengths)
    feats = np.asarray(feats)
    for i, s in enumerate(sigs):
        solo, solo_len = featurizer(s)
        n = int(solo_len)
        assert int(feat_lengths[i]) == n
        np.testing.assert_allclose(feats[i, :n], np.asarray(solo)[:n], atol=1e-5)
        # padded frames exactly zero (reference padded_batch contract)
        assert np.all(feats[i, n:] == 0.0)


def test_frame_count_law(featurizer):
    # reference speech_featurizer.py:163-166
    for n in [400, 401, 559, 560, 561, 16000]:
        assert featurizer.get_nframes(n) == 1 + (n - 400) // 160


def test_pad_end_matches_tf():
    golden = np.load(os.path.join(os.path.dirname(__file__), "golden", "featurizer_padend.npz"))
    f = SpeechFeaturizer(
        FeaturizerConfig(pad_end=True, normalize_signal=False, preemphasis=0.0)
    )
    sig = golden["padend_signal"]
    feats, length = f(sig)
    ref = golden["padend_logmel"]
    assert int(length) == ref.shape[0] == -(-len(sig) // 160)
    np.testing.assert_allclose(np.asarray(feats)[: ref.shape[0]], ref, atol=5e-3)


def test_zscore_and_minmax_normalization_laws():
    # normalize_zscore: per-frame over mel bins → mean 0, var ~1 (:81-85)
    f = SpeechFeaturizer(FeaturizerConfig(normalize_zscore=True, normalize_signal=True))
    sig = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
    feats, n = f(sig)
    valid = np.asarray(feats)[: int(n)]
    np.testing.assert_allclose(valid.mean(axis=-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(valid.std(axis=-1), 1.0, atol=1e-2)
    f2 = SpeechFeaturizer(FeaturizerConfig(normalize_min_max=True, normalize_signal=True))
    feats2, n2 = f2(sig)
    valid2 = np.asarray(feats2)[: int(n2)]
    assert valid2.min() >= -1e-5 and valid2.max() <= 1 + 1e-5
