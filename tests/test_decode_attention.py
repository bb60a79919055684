"""Tiled-cache decode attention: Pallas kernel (interpret mode) vs the jnp
reference, and token-level parity of ``attention_impl="tiled"`` greedy decode
against the default XLA path — including the zero-length-encoding rows where
the Keras additive-mask law makes cross attention exactly uniform
(decode/greedy.py, ops/pallas/decode_attention.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telugu_asr_tpu.decode.greedy import greedy_decode
from telugu_asr_tpu.models.moonshine.model import ASRModel
from telugu_asr_tpu.ops.pallas.decode_attention import (
    TILE,
    decode_attention,
    decode_attention_reference,
    tile_cache,
    untile_cache,
)
from tests.test_moonshine import tiny_config

BOS, EOS, PAD = 0, 1, 2


def test_tile_cache_roundtrip():
    kv = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 8, 2 * TILE))
    tiled = tile_cache(kv)
    assert tiled.shape == (3, 2, 4, 8, TILE)
    np.testing.assert_array_equal(untile_cache(tiled), kv)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_interpret_matches_reference(dtype):
    rng = np.random.default_rng(0)
    b, h, dh, l = 4, 2, 8, 2 * TILE
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, dh, l)), dtype)
    v = jnp.asarray(rng.normal(size=(b, h, dh, l)), dtype)
    kt, vt = tile_cache(k), tile_cache(v)
    # prefixes spanning one and both tiles
    n_valid = jnp.asarray([1, TILE - 1, TILE + 5, l], jnp.int32)
    key_valid = jnp.asarray(rng.integers(0, 2, size=(b, l)), jnp.int32)
    key_valid = key_valid.at[:, 0].set(1)  # ≥1 live key per row
    out = decode_attention(q, kt, vt, n_valid, key_valid, use_pallas=True, interpret=True)
    ref = decode_attention_reference(q, kt, vt, n_valid, key_valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def _tiny_setup(zero_row: bool):
    cfg = tiny_config()
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, 90, 8))
    lengths = jnp.asarray([90, 40, 60, 25])
    enc_out, enc_mask = model.encode(params, feats, lengths)
    if zero_row:
        # a fully-masked encoding row (the uniform-softmax law)
        enc_mask = enc_mask.at[3, :].set(False)
    return model, params, enc_out, enc_mask


@pytest.mark.parametrize("zero_row", [False, True])
@pytest.mark.parametrize("parity_unmasked_cross", [False, True])
def test_tiled_greedy_token_parity(zero_row, parity_unmasked_cross):
    if zero_row and parity_unmasked_cross:
        pytest.skip("mask ignored in parity mode")
    model, params, enc_out, enc_mask = _tiny_setup(zero_row)
    kwargs = dict(
        max_length=12, bos_id=BOS, eos_id=EOS, pad_id=PAD,
        parity_unmasked_cross=parity_unmasked_cross,
    )
    tok_x, len_x = greedy_decode(model, params, enc_out, enc_mask,
                                 attention_impl="xla", **kwargs)
    tok_t, len_t = greedy_decode(model, params, enc_out, enc_mask,
                                 attention_impl="tiled", **kwargs)
    np.testing.assert_array_equal(np.asarray(tok_x), np.asarray(tok_t))
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_t))
