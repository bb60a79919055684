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


def test_decoder_prefill_matches_stepped_prefix():
    """Batched decoder_prefill writes the same KV cache (and continued decode)
    as feeding the prefix through sequential decoder_step calls."""
    from telugu_asr_tpu.models.moonshine.decoder import (
        decoder_init_cache,
        decoder_prefill,
        decoder_step,
    )

    model, params, feat, tok = _setup()
    cfg = model.cfg.decoder
    rng = np.random.default_rng(3)
    b, t_enc, max_len, p = 2, 9, 12, 5
    enc = jnp.asarray(rng.standard_normal((b, t_enc, cfg.d_model)), jnp.float32)
    enc_mask = jnp.asarray(rng.integers(0, 2, (b, t_enc)).astype(bool) | True)
    prefix = jnp.asarray(rng.integers(3, model.cfg.vocab_size, (b, p)), jnp.int32)
    key_valid = jnp.ones((b, max_len + 1), bool)

    cache_a = decoder_init_cache(params["decoder"], cfg, enc, max_len + 1)
    emb = model.embed(params, prefix)
    _, cache_a = decoder_prefill(
        params["decoder"], cfg, emb, cache_a,
        key_valid_mask=key_valid, encoder_mask=enc_mask,
    )

    cache_b = decoder_init_cache(params["decoder"], cfg, enc, max_len + 1)
    for i in range(p):
        step_emb = model.embed(params, prefix[:, i])[:, None, :]
        _, cache_b = decoder_step(
            params["decoder"], cfg, step_emb, cache_b, jnp.int32(i),
            key_valid_mask=key_valid, encoder_mask=enc_mask,
        )

    for blk_a, blk_b in zip(cache_a["blocks"], cache_b["blocks"]):
        np.testing.assert_allclose(
            np.asarray(blk_a["self"]["k"][..., :p]),
            np.asarray(blk_b["self"]["k"][..., :p]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(blk_a["self"]["v"][..., :p]),
            np.asarray(blk_b["self"]["v"][..., :p]), atol=1e-5)


def test_forced_prefix_decode_matches_unforced():
    """Forcing the tokens an unforced decode emits reproduces its
    continuation exactly (same argmax stream)."""
    model, params, feat, tok = _setup()
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(int(0.9 * 16000)) * 0.1).astype(np.float32)
    signal = jnp.asarray(audio[None, :])
    feats, flen = feat(signal, jnp.asarray([audio.size], jnp.int32))
    enc, mask = model.encode(params, feats, flen)
    max_length = default_max_length(int(feats.shape[1]))

    free, free_len = greedy_decode(
        model, params, enc, mask, max_length=max_length,
        bos_id=tok.bos_token_id, eos_id=tok.eos_token_id,
        pad_id=tok.pad_token_id, attention_impl="xla",
    )
    free = np.asarray(free)
    n = int(free_len[0])
    p = max(1, n // 2)
    # PAD-padded forced prefix wider than the true length (streaming layout)
    p_pad = min(max_length, p + 3)
    forced = np.full((1, p_pad), tok.pad_token_id, np.int32)
    forced[0, :p] = free[0, :p]
    got, got_len = greedy_decode(
        model, params, enc, mask, max_length=max_length,
        bos_id=tok.bos_token_id, eos_id=tok.eos_token_id,
        pad_id=tok.pad_token_id,
        forced_prefix=jnp.asarray(forced), forced_length=jnp.int32(p),
    )
    np.testing.assert_array_equal(np.asarray(got), free)
    assert int(got_len[0]) == n


def test_forced_prefix_max_new_budget():
    """max_new_tokens bounds the continuation; emitted tokens match the
    unforced stream up to the budget."""
    model, params, feat, tok = _setup()
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(int(0.9 * 16000)) * 0.1).astype(np.float32)
    signal = jnp.asarray(audio[None, :])
    feats, flen = feat(signal, jnp.asarray([audio.size], jnp.int32))
    enc, mask = model.encode(params, feats, flen)
    max_length = default_max_length(int(feats.shape[1]))

    free, _ = greedy_decode(
        model, params, enc, mask, max_length=max_length,
        bos_id=tok.bos_token_id, eos_id=tok.eos_token_id,
        pad_id=tok.pad_token_id, attention_impl="xla",
    )
    free = np.asarray(free)
    p, budget = 2, 3
    forced = jnp.asarray(free[:, :p])
    got, _ = greedy_decode(
        model, params, enc, mask, max_length=max_length,
        bos_id=tok.bos_token_id, eos_id=tok.eos_token_id,
        pad_id=tok.pad_token_id,
        forced_prefix=forced, forced_length=jnp.int32(p),
        max_new_tokens=budget,
    )
    got = np.asarray(got)
    np.testing.assert_array_equal(got[:, : p + budget], free[:, : p + budget])
    # beyond the budget nothing was emitted
    assert (got[:, p + budget:] == tok.pad_token_id).all()


def test_streaming_partials_use_prefix_and_finalize_exact():
    """End-to-end: partial ticks (forced-prefix fast path) produce strings
    and finalize stays EXACTLY equal to the offline recognize."""
    model, params, feat, tok = _setup()
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(int(2.1 * 16000)) * 0.1).astype(np.float32)
    sr = StreamingRecognizer(
        model, params, feat, tok, partial_interval=0.5,
        prefix_trim=2, partial_max_new=16,
    )
    partials = []
    for off in range(0, audio.size, 3200):
        out = sr.accept(audio[off : off + 3200])
        if out is not None:
            partials.append(out)
    assert len(partials) >= 3
    assert all(isinstance(s, str) for s in partials)
    got = sr.finalize()
    want = _offline(model, params, feat, tok, audio)
    assert got == want


def test_partial_wer_trajectory_helper():
    from telugu_asr_tpu.serving.streaming import partial_wer_trajectory

    final = "a b c d"
    traj = partial_wer_trajectory(["x", "a b", "a b c", "a b c d"], final)
    assert traj[-1] == 0.0                      # last partial == final
    assert traj == sorted(traj, reverse=True)   # improves monotonically here
    assert traj[0] > traj[1] > 0.0
    # empty-final edge: no reference words -> den clamps, no ZeroDivision
    assert partial_wer_trajectory([""], "") == [0.0]


def test_partials_lock_prefix_and_converge_to_final():
    """The teacher-forced prefix law, observed end-to-end: each partial's
    locked prefix (its ids minus the revisable tail) survives verbatim into
    every later partial, and the partial-vs-final WER trajectory ends at a
    value consistent with only the revisable tail differing."""
    from telugu_asr_tpu.serving.streaming import partial_wer_trajectory

    model, params, feat, tok = _setup()
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(int(2.6 * 16000)) * 0.1).astype(np.float32)
    sr = StreamingRecognizer(model, params, feat, tok, partial_interval=0.5)
    partial_ids, partials = [], []
    for off in range(0, audio.size, 3200):
        text = sr.accept(audio[off : off + 3200])
        if text is not None:
            partials.append(text)
            partial_ids.append(list(sr._last_ids))
    final = sr.finalize()
    assert len(partials) >= 3
    trim = sr.prefix_trim
    specials = {tok.bos_token_id, tok.eos_token_id, tok.pad_token_id}
    for earlier, later in zip(partial_ids, partial_ids[1:]):
        locked = [t for t in earlier if t not in specials]
        locked = locked[: max(0, len(locked) - trim)]
        later_clean = [t for t in later if t not in specials]
        assert later_clean[: len(locked)] == locked, (
            f"locked prefix revised: {locked} vs {later_clean}")
    # Trajectory contract on real partials: finite, non-negative, and zero
    # against the transcript it is measured against.  (Convergence TO THE
    # FINAL is a property of trained weights — an untrained model's final
    # full-cap decode legitimately diverges from its partials — so that
    # measurement lives in tools/bench_streaming.py's --checkpoint quality
    # lane, not here.)
    traj = partial_wer_trajectory(partials, final)
    assert all(t >= 0.0 for t in traj) and len(traj) == len(partials)
    assert partial_wer_trajectory(partials, partials[-1])[-1] == 0.0
