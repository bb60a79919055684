"""Long-form transcription (decode/longform.py): segmentation laws + stitching."""
import numpy as np

from telugu_asr_tpu.decode.longform import recognize_long_form, segment_longform


def _wave_with_silences(total_s=40.0, silence_at=(12.0, 26.0), sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    wave = (rng.standard_normal(int(total_s * sr)) * 0.3).astype(np.float32)
    for t in silence_at:
        lo = int((t - 0.25) * sr)
        wave[lo : lo + int(0.5 * sr)] = 0.0
    return wave


def test_segments_partition_exactly():
    sr = 16000
    wave = _wave_with_silences()
    spans = segment_longform(wave, sr, max_seconds=15.0)
    assert spans[0][0] == 0 and spans[-1][1] == len(wave)
    for (a, b), (c, _) in zip(spans, spans[1:]):
        assert b == c and b > a
    assert all(e - s <= 15.0 * sr for s, e in spans)


def test_cuts_land_in_silence():
    """With silence regions inside the search windows, cuts must hit them."""
    sr = 16000
    wave = _wave_with_silences(total_s=40.0, silence_at=(14.0, 28.0))
    spans = segment_longform(wave, sr, max_seconds=15.0, search_seconds=2.0)
    cuts = [e for _, e in spans[:-1]]
    assert len(cuts) == 2
    for cut, silence_t in zip(cuts, (14.0, 28.0)):
        assert abs(cut / sr - silence_t) < 0.5, (cut / sr, silence_t)


def test_short_wave_single_segment():
    sr = 16000
    wave = np.zeros(3 * sr, np.float32)
    assert segment_longform(wave, sr, max_seconds=15.0) == [(0, 3 * sr)]


def test_sub_frame_search_window_degrades_to_boundary_cut():
    """search window shorter than one RMS frame must not crash the reshape."""
    sr = 16000
    wave = _wave_with_silences(total_s=20.0, silence_at=())
    spans = segment_longform(wave, sr, max_seconds=15.0, search_seconds=0.02)
    assert spans[0][0] == 0 and spans[-1][1] == len(wave)
    assert all(e - s <= 15.0 * sr for s, e in spans)


def test_recognize_long_form_stitches():
    """End-to-end on a tiny model: the long-form text must equal the
    concatenation of recognizing each segment separately (same windows,
    same decode laws — only the batching differs)."""
    import jax
    import jax.numpy as jnp

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode
    from telugu_asr_tpu.models.moonshine.model import ASRModel
    from telugu_asr_tpu.text import make_default_tokenizer
    from tests.test_moonshine import tiny_config

    sr = 16000
    cfg = tiny_config()
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params["classifier"]["kernel"] = params["classifier"]["kernel"] * 50.0
    params["classifier"]["bias"] = params["classifier"]["bias"] * 50.0
    featurizer = SpeechFeaturizer(
        FeaturizerConfig(num_feature_bins=cfg.encoder.in_channels,
                         normalize_signal=True)
    )
    tokenizer = make_default_tokenizer()
    wave = _wave_with_silences(total_s=7.0, silence_at=(3.0,))

    text = recognize_long_form(
        model, params, featurizer, tokenizer, wave, max_seconds=3.5,
        sample_rate=sr,
    )

    # per-segment reference: same window padding + decode cap as the batch
    spans = segment_longform(wave, sr, max_seconds=3.5)
    longest = max(e - s for s, e in spans)
    padded = -(-longest // sr) * sr
    parts = []
    for start, end in spans:
        seg = wave[start:end]
        audio = np.zeros((1, padded), np.float32)
        audio[0, : len(seg)] = seg
        feats, fl = featurizer(jnp.asarray(audio), jnp.asarray([len(seg)]))
        eo, em = model.encode(params, feats, fl)
        toks, _ = greedy_decode(
            model, params, eo, em,
            max_length=default_max_length(int(feats.shape[1])),
            bos_id=tokenizer.bos_token_id, eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id)
        parts.append(tokenizer.decode(np.asarray(toks)[0].tolist(),
                                      skip_special_tokens=True).strip())
    assert text == " ".join(p for p in parts if p)

    # bounded batching: a batch_size smaller than the span count must chunk
    # (padding short tails with inert zero-length rows) and produce the
    # exact same stitched text
    text_b2 = recognize_long_form(
        model, params, featurizer, tokenizer, wave, max_seconds=3.5,
        sample_rate=sr, batch_size=2,
    )
    assert text_b2 == text
