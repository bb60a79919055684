"""Fused Pallas featurizer kernel vs the jnp reference path (interpret mode
on CPU; the compiled TPU path is exercised by bench.py on hardware)."""
import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.audio.augment import Augmentation
from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer


def featurizer():
    return SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))


def test_fused_matches_reference_path():
    f = featurizer()
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 40000)) * 0.1).astype(np.float32)
    lengths = jnp.asarray([40000, 30000], jnp.int32)
    ref, ref_len = f(jnp.asarray(audio), lengths)
    out, out_len = f.fused(jnp.asarray(audio), lengths, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(ref_len))
    T = ref.shape[1]
    np.testing.assert_allclose(np.asarray(out)[:, :T], np.asarray(ref), atol=5e-4)
    # padded frames zero
    assert np.all(np.asarray(out)[1, int(out_len[1]):] == 0.0)


def test_fused_specaugment_bands():
    f = featurizer()
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((1, 40000)) * 0.1).astype(np.float32)
    lengths = jnp.asarray([40000], jnp.int32)
    aug = jnp.asarray([[10, 5, 20, 30]], jnp.int32)  # f0, f, t0, t
    out, out_len = f.fused(jnp.asarray(audio), lengths, aug_params=aug, interpret=True)
    arr = np.asarray(out)[0]
    n = int(out_len[0])
    assert np.all(arr[:n, 10:15] == 0.0)  # freq band
    assert np.all(arr[20:50, :] == 0.0)  # time band
    assert not np.all(arr[:20, :10] == 0.0)


def test_sample_fused_params_laws():
    aug = Augmentation(
        {
            "prob": 1.0,
            "feature_augment": {
                "freq_masking": {"num_masks": 1, "mask_factor": 27},
                "time_masking": {"num_masks": 1, "mask_factor": 100, "p_upperbound": 0.5},
            },
        }
    )
    assert aug.supports_fused()
    lengths = jnp.asarray([200, 50, 10], jnp.int32)
    params = np.asarray(aug.sample_fused_params(jax.random.PRNGKey(0), lengths, 80))
    f0, fw, t0, tw = params.T
    assert np.all(fw < 27) and np.all(f0 + fw <= 80)
    assert np.all(tw <= np.asarray(lengths) * 0.5 + 1)
    assert np.all(t0 + tw <= np.asarray(lengths))


def test_multi_mask_config_not_fused():
    aug = Augmentation(
        {"feature_augment": {"freq_masking": {"num_masks": 2, "mask_factor": 27}}}
    )
    assert not aug.supports_fused()
