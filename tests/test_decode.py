"""Greedy decode: KV-cached batched while_loop vs a literal reference-style
full-prefix re-decode (the parity bar is identical decoded transcripts)."""
import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode
from telugu_asr_tpu.models.moonshine.decoder import decoder_apply
from telugu_asr_tpu.models.moonshine.model import ASRModel
from tests.test_moonshine import tiny_config

BOS, EOS, PAD = 0, 1, 2


def reference_style_greedy(model, params, enc_out, enc_mask, max_length):
    """Eager transcription of moonshine/model.py:165-229: re-run the full
    decoder on the whole prefix each step, no KV cache, per-utterance."""
    cfg = model.cfg.decoder
    batch = enc_out.shape[0]
    results = []
    for b in range(batch):
        eb = enc_out[b : b + 1]
        mb = enc_mask[b : b + 1]
        prefix = [BOS]
        generated = []
        for _ in range(max_length):
            toks = jnp.asarray([prefix])
            embedded = model.embed(params, toks)
            out = decoder_apply(
                params["decoder"], cfg, embedded, eb,
                text_mask=(toks != PAD), encoder_mask=mb, use_causal_mask=True,
            )
            logits = model.classify(params, out)
            nxt = int(jnp.argmax(logits[0, -1]))
            generated.append(nxt)
            if nxt == EOS:
                break
            prefix.append(nxt)
        results.append(generated)
    width = max_length
    out = np.full((batch, width), PAD, np.int32)
    for b, g in enumerate(results):
        out[b, : len(g)] = g
    return out


def test_greedy_matches_reference_style():
    cfg = tiny_config()
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, 90, 8))
    lengths = jnp.asarray([90, 70, 60])
    enc_out, enc_mask = model.encode(params, feats, lengths)

    max_len = 12
    ref = reference_style_greedy(model, params, enc_out, enc_mask, max_len)
    ours, lens = greedy_decode(
        model, params, enc_out, enc_mask,
        max_length=max_len, bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    np.testing.assert_array_equal(np.asarray(ours), ref)
    arr = np.asarray(ours)
    for b in range(3):
        n = int(lens[b])
        if EOS in arr[b]:
            assert arr[b, n - 1] == EOS  # length counts through first EOS
            assert np.all(arr[b, n:] == PAD)
        else:
            assert n == max_len


def test_greedy_early_exit_on_eos():
    """All-finished batches stop before max_length (while_loop cond)."""
    cfg = tiny_config()
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(5))
    feats = jax.random.normal(jax.random.PRNGKey(6), (2, 70, 8))
    enc_out, enc_mask = model.encode(params, feats, jnp.asarray([70, 70]))
    tokens, lens = greedy_decode(
        model, params, enc_out, enc_mask, max_length=200,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    assert tokens.shape == (2, 200)
    # decoded rows are PAD after their length
    arr = np.asarray(tokens)
    for b in range(2):
        assert np.all(arr[b, int(lens[b]):] == PAD)


def test_default_max_length_law():
    # moonshine/model.py:233-234: duration*24 with duration from frame count
    assert default_max_length(998) == int((((998 - 1) * 160) + 400) / 16000 * 24)


def test_greedy_matches_reference_style_parity_mode():
    """Parity mode (unmasked cross-attention, the reference's greedy quirk)
    against an eager reference-style decode with mask=None."""
    cfg = tiny_config()
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(11))
    feats = jax.random.normal(jax.random.PRNGKey(12), (2, 90, 8))
    lengths = jnp.asarray([90, 64])
    enc_out, enc_mask = model.encode(params, feats, lengths)

    max_len = 10
    # eager reference-style with NO cross mask
    cfgd = model.cfg.decoder
    ref = []
    for b in range(2):
        prefix, generated = [BOS], []
        for _ in range(max_len):
            toks = jnp.asarray([prefix])
            out = decoder_apply(
                params["decoder"], cfgd, model.embed(params, toks),
                enc_out[b : b + 1], text_mask=(toks != PAD),
                encoder_mask=None, use_causal_mask=True,
            )
            nxt = int(jnp.argmax(model.classify(params, out)[0, -1]))
            generated.append(nxt)
            if nxt == EOS:
                break
            prefix.append(nxt)
        ref.append(generated)
    ours, _ = greedy_decode(
        model, params, enc_out, enc_mask, max_length=max_len,
        bos_id=BOS, eos_id=EOS, pad_id=PAD, parity_unmasked_cross=True,
    )
    arr = np.asarray(ours)
    for b, g in enumerate(ref):
        np.testing.assert_array_equal(arr[b, : len(g)], g)


def test_greedy_parity_across_seeds():
    """Token-identical decode across several random models (max_len small)."""
    for seed in [3, 4]:
        cfg = tiny_config()
        model = ASRModel(cfg)
        params = model.init(jax.random.PRNGKey(seed))
        feats = jax.random.normal(jax.random.PRNGKey(seed + 100), (2, 70, 8))
        enc_out, enc_mask = model.encode(params, feats, jnp.asarray([70, 60]))
        ref = reference_style_greedy(model, params, enc_out, enc_mask, 8)
        ours, _ = greedy_decode(
            model, params, enc_out, enc_mask, max_length=8,
            bos_id=BOS, eos_id=EOS, pad_id=PAD,
        )
        np.testing.assert_array_equal(np.asarray(ours), ref)


def test_staged_decode_matches_plain():
    from telugu_asr_tpu.decode.greedy import greedy_decode_staged

    cfg = tiny_config()
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(21))
    feats = jax.random.normal(jax.random.PRNGKey(22), (3, 80, 8))
    enc_out, enc_mask = model.encode(params, feats, jnp.asarray([80, 70, 60]))
    plain, _ = greedy_decode(
        model, params, enc_out, enc_mask, max_length=20,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    # stage cap below max: either all-finish-early (pad path) or re-decode
    staged, _ = greedy_decode_staged(
        model, params, enc_out, enc_mask, max_length=20, first_stage_cap=6,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    assert staged.shape == plain.shape
    # identical where the plain decode is within both caps
    p, s = np.asarray(plain), np.asarray(staged)
    np.testing.assert_array_equal(p, s)


def test_fast_segments_requires_fused():
    """fast_segments is a fused-kernel mode; the portable paths refuse it
    loudly instead of silently decoding at a different precision."""
    import pytest

    from telugu_asr_tpu.decode.greedy import greedy_decode
    from telugu_asr_tpu.models.moonshine.model import ASRModel
    from tests.test_moonshine import tiny_config

    model = ASRModel(tiny_config())
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 8))
    enc, mask = model.encode(params, feats, jnp.asarray([40, 30]))
    with pytest.raises(ValueError, match="fused"):
        greedy_decode(model, params, enc, mask, max_length=8,
                      attention_impl="xla", fast_segments=True)


def test_greedy_repetition_penalty():
    """Penalty off = untouched path; extreme penalty = no token twice;
    fused-impl request with a penalty is refused loudly."""
    import pytest

    from telugu_asr_tpu.decode.greedy import greedy_decode
    from telugu_asr_tpu.models.moonshine.model import ASRModel
    from tests.test_moonshine import tiny_config

    model = ASRModel(tiny_config())
    params = model.init(jax.random.PRNGKey(3))
    feats = jax.random.normal(jax.random.PRNGKey(4), (3, 60, 8))
    enc, mask = model.encode(params, feats, jnp.asarray([60, 45, 30]))
    base, _ = greedy_decode(model, params, enc, mask, max_length=12)
    same, _ = greedy_decode(model, params, enc, mask, max_length=12,
                            repetition_penalty=1.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    toks, lens = greedy_decode(model, params, enc, mask, max_length=12,
                               repetition_penalty=1e4)
    for row, n in zip(np.asarray(toks), np.asarray(lens)):
        emitted = [t for t in row[:n] if t not in (1, 2)]
        assert len(emitted) == len(set(emitted)), emitted
    with pytest.raises(ValueError, match="fused"):
        greedy_decode(model, params, enc, mask, max_length=8,
                      attention_impl="fused", repetition_penalty=1.3)
