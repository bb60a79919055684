import jax
import numpy as np

from telugu_asr_tpu.audio.augment import Augmentation, freq_masking, time_masking


def test_freq_masking_laws():
    key = jax.random.PRNGKey(0)
    feats = np.ones((50, 80), np.float32)
    out = np.asarray(freq_masking(key, feats, mask_factor=27))
    zero_cols = np.where((out == 0).all(axis=0))[0]
    assert len(zero_cols) < 27
    if len(zero_cols):  # contiguous band
        assert zero_cols[-1] - zero_cols[0] + 1 == len(zero_cols)
    # untouched columns unchanged
    keep = np.setdiff1d(np.arange(80), zero_cols)
    assert np.all(out[:, keep] == 1.0)


def test_time_masking_within_valid_length():
    key = jax.random.PRNGKey(1)
    feats = np.ones((100, 80), np.float32)
    out = np.asarray(time_masking(key, feats, length=np.int32(30), mask_factor=100))
    zero_rows = np.where((out == 0).all(axis=1))[0]
    assert np.all(zero_rows < 30)  # never masks padding region


def test_augmentation_driver_batch():
    aug = Augmentation(
        {
            "prob": 1.0,
            "feature_augment": {
                "freq_masking": {"num_masks": 1, "mask_factor": 10},
                "time_masking": {"num_masks": 1, "mask_factor": 20, "p_upperbound": 0.5},
            },
        }
    )
    assert aug.enabled
    key = jax.random.PRNGKey(2)
    feats = np.ones((4, 60, 80), np.float32)
    lengths = np.array([60, 40, 20, 10], np.int32)
    out = np.asarray(aug.feature_augment(key, feats, lengths))
    assert out.shape == feats.shape
    # each example got some masking (prob=1.0) unless sampled width was 0
    assert (out == 0).sum() >= 0


def test_augmentation_disabled_identity():
    aug = Augmentation(None)
    assert not aug.enabled
    feats = np.ones((2, 10, 80), np.float32)
    out = aug.feature_augment(jax.random.PRNGKey(0), feats)
    assert np.all(np.asarray(out) == feats)
