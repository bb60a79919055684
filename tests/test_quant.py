"""Int8 weight quantization: scale laws, rounding, pytree transforms, and
end-to-end decode fidelity on the flagship model."""
import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.ops.quant import (
    dequantize_array,
    dequantize_pytree,
    is_quantized_leaf,
    pytree_num_bytes,
    quantize_array,
    quantize_pytree,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 48)) * 3.0, jnp.float32)
    q, scale = quantize_array(x)
    assert q.dtype == jnp.int8 and scale.shape == (48,)
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127
    err = jnp.abs(dequantize_array(q, scale) - x)
    # round-to-nearest: error <= scale/2 per channel
    assert bool(jnp.all(err <= scale[None, :] * 0.5 + 1e-7))


def test_quantize_zero_channel_safe():
    x = jnp.zeros((16, 4), jnp.float32).at[:, 0].set(1.0)
    q, scale = quantize_array(x)
    assert bool(jnp.all(jnp.isfinite(scale)))
    assert bool(jnp.all(q[:, 1:] == 0))
    np.testing.assert_allclose(dequantize_array(q, scale)[:, 0], 1.0, rtol=1e-6)


def test_stochastic_rounding_unbiased():
    # pin absmax to 127 so scale == 1; a half-integer value then rounds up or
    # down with equal probability — the mean over keys must recover it
    x = jnp.full((8, 8), 10.0, jnp.float32).at[0, 0].set(127.0).at[1, 1].set(10.5)
    n = 200
    acc = np.zeros((8, 8), np.float64)
    for i in range(n):
        q, scale = quantize_array(x, stochastic=True, key=jax.random.PRNGKey(i),
                                  use_pallas=False)
        acc += np.asarray(dequantize_array(q, scale))
    mean = acc / n
    assert abs(mean[1, 1] - 10.5) < 0.15  # unbiased within sampling noise
    np.testing.assert_allclose(mean, np.asarray(x), atol=0.6)


def test_pytree_quantize_selects_matmul_weights():
    params = {
        "blocks": [
            {
                "mha": {
                    "query_kernel": jnp.ones((64, 64)),
                    "rope_inv_freq": jnp.ones((16,)),
                },
                "ln": {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))},
            }
        ],
        "embedding": jnp.ones((243, 64)),
        "tiny_kernel": jnp.ones((2, 2)),  # below min_size: kept float
    }
    q = quantize_pytree(params)
    assert is_quantized_leaf(q["blocks"][0]["mha"]["query_kernel"])
    assert not is_quantized_leaf(q["blocks"][0]["ln"])
    assert q["blocks"][0]["mha"]["rope_inv_freq"].dtype == jnp.float32
    assert is_quantized_leaf(q["embedding"])
    assert q["tiny_kernel"].dtype == jnp.float32
    assert pytree_num_bytes(q) < pytree_num_bytes(params) / 2

    back = dequantize_pytree(q)
    assert back["blocks"][0]["mha"]["query_kernel"].shape == (64, 64)
    np.testing.assert_allclose(np.asarray(back["embedding"]), 1.0, rtol=1e-2)


def test_int8_decode_fidelity_flagship():
    """Int8 weights keep the flagship model's logits close and (for random
    weights) the greedy argmax stable on most steps."""
    from telugu_asr_tpu.models.moonshine.decoder import DecoderConfig
    from telugu_asr_tpu.models.moonshine.encoder import EncoderConfig
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig

    cfg = MoonshineConfig(
        vocab_size=59,
        d_model=64,
        encoder=EncoderConfig(d_model=64, num_blocks=2, num_heads=2, head_dim=32),
        decoder=DecoderConfig(d_model=64, num_blocks=2, num_heads=2, head_dim=32),
    )
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    qparams = dequantize_pytree(quantize_pytree(params))

    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 80, 80)), jnp.float32)
    fl = jnp.asarray([80, 60], jnp.int32)
    text = jnp.asarray([[0, 5, 7, 9], [0, 4, 4, 1]], jnp.int32)

    logits = model.apply(params, feats, fl, text)
    qlogits = model.apply(qparams, feats, fl, text)
    assert logits.shape == qlogits.shape
    # per-position softmax argmax agreement
    agree = float(jnp.mean(jnp.argmax(logits, -1) == jnp.argmax(qlogits, -1)))
    assert agree >= 0.75, agree
    # logits error small relative to their spread
    rel = float(jnp.max(jnp.abs(logits - qlogits)) / (jnp.std(logits) + 1e-9))
    assert rel < 0.5, rel


def test_real_model_embedding_table_quantized():
    """The flagship param tree's embedding lives at text_embedding/table —
    path-joined matching must quantize it (ADVICE r1: leaf-key matching
    missed it and --int8 silently skipped the largest vocab weight)."""
    from telugu_asr_tpu.models.moonshine.decoder import DecoderConfig
    from telugu_asr_tpu.models.moonshine.encoder import EncoderConfig
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig

    cfg = MoonshineConfig(
        vocab_size=242,
        d_model=64,
        encoder=EncoderConfig(d_model=64, num_blocks=1, num_heads=2, head_dim=32),
        decoder=DecoderConfig(d_model=64, num_blocks=1, num_heads=2, head_dim=32),
    )
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    q = quantize_pytree(params)
    assert is_quantized_leaf(q["text_embedding"]["table"])
    assert is_quantized_leaf(q["classifier"]["kernel"])
    # 1-D and RoPE leaves stay float
    assert q["classifier"]["bias"].dtype == jnp.float32
