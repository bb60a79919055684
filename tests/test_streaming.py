"""Streaming recognizer: growing-window partials + exact finalize parity with
the offline recognize path (serving/streaming.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode
from telugu_asr_tpu.models.moonshine.model import ASRModel
from telugu_asr_tpu.serving import StreamingRecognizer
from tests.test_moonshine import tiny_config


class _IdTokenizer:
    """Maps ids to letters so transcripts are comparable strings."""

    bos_token_id, eos_token_id, pad_token_id = 0, 1, 2

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids if i > 2)


def _setup():
    cfg = tiny_config()
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params["classifier"]["kernel"] = params["classifier"]["kernel"] * 50.0
    feat = SpeechFeaturizer(
        FeaturizerConfig(num_feature_bins=8, normalize_signal=True)
    )
    return model, params, feat, _IdTokenizer()


def _offline(model, params, feat, tok, audio):
    signal = jnp.asarray(audio[None, :])
    feats, flen = feat(signal, jnp.asarray([audio.size], jnp.int32))
    max_length = default_max_length(int(feats.shape[1]))
    enc, mask = model.encode(params, feats, flen)
    tokens, lengths = greedy_decode(
        model, params, enc, mask, max_length=max_length,
        bos_id=tok.bos_token_id, eos_id=tok.eos_token_id, pad_id=tok.pad_token_id)
    ids = np.asarray(tokens)[0, : int(lengths[0])]
    return tok.decode([int(t) for t in ids])


def test_finalize_matches_offline():
    model, params, feat, tok = _setup()
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(1.3 * 16000)) * 0.1).astype(np.float32)
    sr = StreamingRecognizer(model, params, feat, tok, partial_interval=0.5)
    for off in range(0, audio.size, 3200):  # 200 ms chunks
        sr.accept(audio[off : off + 3200])
    got = sr.finalize()
    want = _offline(model, params, feat, tok, audio)
    assert got == want


def test_partial_ticks_and_reset():
    model, params, feat, tok = _setup()
    rng = np.random.default_rng(1)
    sr = StreamingRecognizer(model, params, feat, tok, partial_interval=0.5)
    ticks = 0
    for _ in range(6):  # 6 × 200 ms = 1.2 s → 2 ticks at 0.5 s interval
        out = sr.accept((rng.standard_normal(3200) * 0.1).astype(np.float32))
        if out is not None:
            ticks += 1
            assert isinstance(out, str)
    assert ticks == 2
    assert sr.partial() == out
    assert abs(sr.buffered_seconds - 1.2) < 1e-6
    sr.reset()
    assert sr.buffered_seconds == 0.0
    assert sr.finalize() == ""


def test_bucket_ladder():
    model, params, feat, tok = _setup()
    sr = StreamingRecognizer(
        model, params, feat, tok, buckets_seconds=(1.0, 2.0), sample_rate=16000
    )
    assert sr._bucket(100) == 16000
    assert sr._bucket(16000) == 16000
    assert sr._bucket(16001) == 32000
    # beyond the ladder: round up by the top bucket
    assert sr._bucket(70000) == 96000


def test_two_utterances_same_compiled_shapes():
    model, params, feat, tok = _setup()
    rng = np.random.default_rng(2)
    sr = StreamingRecognizer(model, params, feat, tok, partial_interval=10.0)
    outs = []
    for seed in range(2):
        sr.reset()
        a = (rng.standard_normal(int(0.7 * 16000)) * 0.1).astype(np.float32)
        sr.accept(a)
        outs.append(sr.finalize())
    assert all(isinstance(o, str) for o in outs)
