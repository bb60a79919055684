"""Moonshine model: shapes, parameter budget, masking, KV-cache equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telugu_asr_tpu.models.moonshine.decoder import (
    decoder_apply,
    decoder_init_cache,
    decoder_step,
)
from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig, create_masks
from telugu_asr_tpu.text import make_default_tokenizer


def tiny_config(vocab=32):
    from telugu_asr_tpu.models.moonshine.decoder import DecoderConfig
    from telugu_asr_tpu.models.moonshine.encoder import EncoderConfig

    return MoonshineConfig(
        vocab_size=vocab,
        d_model=16,
        encoder=EncoderConfig(d_model=16, num_blocks=2, num_heads=2, head_dim=8, in_channels=8),
        decoder=DecoderConfig(d_model=16, num_blocks=2, num_heads=2, head_dim=8),
    )


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_config()
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_forward_shapes(tiny):
    model, params = tiny
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 100, 8))
    lengths = jnp.asarray([100, 60])
    tokens = jnp.asarray([[0, 5, 6, 7], [0, 5, 2, 2]])
    logits = model.apply(params, feats, lengths, tokens)
    assert logits.shape == (2, 4, 32)


def test_flagship_param_budget():
    """Flagship config lands at the reference's 3.26M params (README.md:5)."""
    tok = make_default_tokenizer()
    cfg = MoonshineConfig.from_model_config(
        {
            "d_model": 192,
            "subsampling_config": {
                "kernel_size": [9, 9, 9],
                "strides": [2, 2, 2],
                "padding": ["valid", "valid", "valid"],
                "activations": ["tanh", "gelu", "gelu"],
            },
            "encoder_config": {"num_blocks": 4, "num_heads": 6, "head_dim": 32, "activation": "gelu"},
            "decoder_config": {"num_blocks": 6, "num_heads": 6, "head_dim": 32, "activation": "swiglu"},
        },
        vocab_size=tok.vocab_size,
    )
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    n = model.num_params(params)
    assert 3.2e6 < n < 3.35e6, n


def test_padding_invariance(tiny):
    """Changing padded audio frames must not change valid-token logits."""
    model, params = tiny
    # length must exceed the 3-conv receptive field (~57 frames) so the
    # subsampled length is >= 1.
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 96, 8))
    lengths = jnp.asarray([64])
    mask = (jnp.arange(96) < 64)[None, :, None]
    feats = jnp.where(mask, feats, 0.0)
    tokens = jnp.asarray([[0, 5, 6]])
    out1 = model.apply(params, feats, lengths, tokens)
    feats2 = jnp.where(mask, feats, 123.0)
    out2 = model.apply(params, feats2, lengths, tokens)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_decoder_causality(tiny):
    model, params = tiny
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, 60, 8))
    lengths = jnp.asarray([60])
    t1 = jnp.asarray([[0, 5, 6, 7]])
    t2 = jnp.asarray([[0, 5, 9, 9]])  # differs only at positions >= 2
    o1 = model.apply(params, feats, lengths, t1)
    o2 = model.apply(params, feats, lengths, t2)
    np.testing.assert_allclose(np.asarray(o1[:, :2]), np.asarray(o2[:, :2]), atol=1e-4)
    assert not np.allclose(np.asarray(o1[:, 2]), np.asarray(o2[:, 2]))


def test_create_masks_reference_law():
    feats = jnp.zeros((1, 4, 3))
    feats = feats.at[0, :2].set(1.0)
    tokens = jnp.asarray([[0, 5, 2, 2]])
    am, tm = create_masks(feats, tokens)
    np.testing.assert_array_equal(np.asarray(am[0]), [True, True, False, False])
    np.testing.assert_array_equal(np.asarray(tm[0]), [True, True, False, False])


def test_kv_cache_matches_full_decoder(tiny):
    """Cached step-by-step decode must reproduce the full-sequence decoder."""
    model, params = tiny
    cfg = model.cfg
    feats = jax.random.normal(jax.random.PRNGKey(4), (2, 70, 8))
    lengths = jnp.asarray([70, 50])
    enc_out, enc_mask = model.encode(params, feats, lengths)

    tokens = jnp.asarray([[0, 5, 6, 7, 8], [0, 9, 10, 11, 12]])
    embedded = model.embed(params, tokens)
    full = decoder_apply(
        params["decoder"], cfg.decoder, embedded, enc_out,
        text_mask=jnp.ones_like(tokens, bool), encoder_mask=enc_mask,
    )

    cache = decoder_init_cache(params["decoder"], cfg.decoder, enc_out, max_len=5)
    valid = jnp.zeros((2, 5), bool)
    outs = []
    for i in range(5):
        valid = valid.at[:, i].set(True)
        step_out, cache = decoder_step(
            params["decoder"], cfg.decoder,
            embedded[:, i : i + 1], cache, jnp.int32(i),
            key_valid_mask=valid, encoder_mask=enc_mask,
        )
        outs.append(step_out)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped), atol=2e-4)


def test_jit_forward(tiny):
    model, params = tiny

    @jax.jit
    def fwd(p, f, l, t):
        return model.apply(p, f, l, t)

    feats = jax.random.normal(jax.random.PRNGKey(5), (2, 50, 8))
    out = fwd(params, feats, jnp.asarray([50, 30]), jnp.asarray([[0, 5], [0, 6]]))
    assert out.shape == (2, 2, 32)
