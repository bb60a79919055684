"""Fused whole-loop BEAM kernel vs the XLA beam reference (interpret mode).

The kernel must reproduce decode/beam.py's semantics exactly: same surviving
beams, same token histories, near-identical scores — across padded batches,
group padding, early-EOS exit and both K=2/K=4 widths.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from telugu_asr_tpu.decode.beam import beam_search_decode
from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
from telugu_asr_tpu.ops.pallas.decode_fused_beam import (
    fused_beam_fits,
    fused_beam_search_decode,
    fused_beam_supported,
)

BOS, EOS, PAD = 0, 1, 2


def tiny_model(vocab=96, d_model=64, dec_blocks=2):
    cfg = MoonshineConfig.from_model_config(
        {
            "d_model": d_model,
            "subsampling_config": {"kernel_size": [9, 9, 9], "strides": [2, 2, 2],
                                   "padding": ["valid"] * 3},
            "encoder_config": {"num_blocks": 1, "num_heads": 2, "head_dim": d_model // 2},
            "decoder_config": {"num_blocks": dec_blocks, "num_heads": 2,
                               "head_dim": d_model // 2, "activation": "swiglu"},
        },
        vocab_size=vocab,
    )
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(3))
    return model, params


def encodings(model, params, batch=3, t_enc=11, seed=7):
    rng = np.random.default_rng(seed)
    enc = jnp.asarray(rng.standard_normal((batch, t_enc, model.cfg.d_model)) * 0.3,
                      jnp.float32)
    lengths = np.linspace(max(3, t_enc // 2), t_enc, batch).astype(np.int32)
    mask = jnp.arange(t_enc)[None, :] < jnp.asarray(lengths)[:, None]
    return enc, mask


def run_fused(model, params, enc, mask, k, max_length, **kw):
    return fused_beam_search_decode(
        params["decoder"], model.cfg.decoder, enc, mask,
        params["text_embedding"]["table"],
        params["classifier"]["kernel"], params["classifier"]["bias"],
        max_length, beam_size=k, bos_id=BOS, eos_id=EOS, pad_id=PAD,
        interpret=True, **kw,
    )


def xla_all_beams(model, params, enc, mask, k, max_length):
    """XLA beam internals exposed: run the public API per final-beam law but
    ALSO reconstruct all-beam outputs by calling with length_penalty=0 —
    the public API returns only the best beam, so the fused comparison uses
    the same final law on the kernel's (tokens, scores)."""
    return beam_search_decode(
        model, params, enc, mask, max_length=max_length, beam_size=k,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )


def best_of(generated, scores):
    best = jnp.argmax(scores, axis=-1)
    idx = jnp.arange(generated.shape[0])
    return generated[idx, best], scores[idx, best]


@pytest.mark.parametrize("k", [2, 4])
def test_fused_beam_matches_xla(k):
    model, params = tiny_model()
    enc, mask = encodings(model, params)
    max_length = 9
    gen, scores = run_fused(model, params, enc, mask, k, max_length)
    assert gen.shape == (3, k, max_length)
    t_f, s_f = best_of(gen, scores)
    t_x, s_x = xla_all_beams(model, params, enc, mask, k, max_length)
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_x))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x), rtol=2e-5, atol=2e-5)


def test_fused_beam_group_padding():
    """true_batch not a multiple of the group tile: pad groups are stripped
    and real rows unchanged."""
    model, params = tiny_model()
    enc, mask = encodings(model, params, batch=3)
    g3, s3 = run_fused(model, params, enc, mask, 4, 8, rows_per_cell=8)
    g1, s1 = run_fused(model, params, enc[:1], mask[:1], 4, 8, rows_per_cell=8)
    np.testing.assert_array_equal(np.asarray(g3[:1]), np.asarray(g1))
    np.testing.assert_allclose(np.asarray(s3[:1]), np.asarray(s1), rtol=1e-5)


def test_fused_beam_bf16_cache_close():
    model, params = tiny_model()
    enc, mask = encodings(model, params)
    g32, s32 = run_fused(model, params, enc, mask, 4, 8)
    gbf, sbf = run_fused(model, params, enc, mask, 4, 8, cache_dtype="bfloat16")
    assert gbf.shape == g32.shape
    # bf16 rounding may flip near-tie argmaxes on random weights; scores of
    # the BEST beam must stay close
    _, sb32 = best_of(g32, s32)
    _, sbbf = best_of(gbf, sbf)
    np.testing.assert_allclose(np.asarray(sbbf), np.asarray(sb32), rtol=0.05, atol=0.05)


def test_supported_and_fits_laws():
    model, _ = tiny_model()
    cfg = model.cfg.decoder
    assert fused_beam_supported(cfg, 4)
    assert fused_beam_supported(cfg, 3)   # non-pow2 runs on the pow2 layout
    assert not fused_beam_supported(cfg, 1)
    assert not fused_beam_supported(cfg, 17)
    assert fused_beam_fits(cfg, 4, 4, 16, 16, vocab=96)
    assert not fused_beam_fits(cfg, 4096, 16, 4096, 4096, vocab=96)
    # int8 weights fit strictly more: the quantized law never fits less
    assert fused_beam_fits(cfg, 4, 4, 16, 16, vocab=96, quantized=True)


@pytest.mark.parametrize("k", [3, 5])
def test_fused_beam_non_pow2_matches_xla(k):
    """Non-power-of-two widths: the pow2 row layout with per-step-killed
    dead slots must reproduce the XLA width-k beams exactly."""
    model, params = tiny_model()
    enc, mask = encodings(model, params)
    max_length = 9
    gen, scores = run_fused(model, params, enc, mask, k, max_length)
    assert gen.shape == (3, k, max_length)
    t_f, s_f = best_of(gen, scores)
    t_x, s_x = xla_all_beams(model, params, enc, mask, k, max_length)
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_x))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x), rtol=2e-5, atol=2e-5)


def test_fused_beam_int8_resident_matches_xla_dequant():
    """A fully int8-quantized tree served VMEM-resident must produce the
    exact XLA dequantize-then-matmul beams (same use-site dequant law as the
    greedy kernel)."""
    from telugu_asr_tpu.ops.quant import quantize_pytree

    model, params = tiny_model()
    enc, mask = encodings(model, params)
    qparams = quantize_pytree(params, min_size=0)
    max_length = 8
    gen_q, s_q = run_fused(model, qparams, enc, mask, 4, max_length)
    # XLA reference on the dequantized tree (beam_search_decode dequantizes
    # quantized trees on the xla path itself)
    t_x, s_x = beam_search_decode(
        model, qparams, enc, mask, max_length=max_length, beam_size=4,
        bos_id=BOS, eos_id=EOS, pad_id=PAD, attention_impl="xla",
    )
    t_q, s_qb = best_of(gen_q, s_q)
    np.testing.assert_array_equal(np.asarray(t_q), np.asarray(t_x))
    np.testing.assert_allclose(np.asarray(s_qb), np.asarray(s_x), rtol=2e-5, atol=2e-5)


def test_fused_beam_dedup_cross_matches_dup():
    """Deduped cross layout (Gc>=8 whole-cell) == duplicated layout == XLA:
    the beam-invariant cross K/V stored once per utterance and tiled
    in-kernel must not change any beam."""
    model, params = tiny_model()
    enc, mask = encodings(model, params, batch=8, t_enc=9, seed=11)
    k, L = 4, 8
    g_dd, s_dd = run_fused(model, params, enc, mask, k, L, rows_per_cell=32)
    g_dp, s_dp = run_fused(model, params, enc, mask, k, L, rows_per_cell=8)
    np.testing.assert_array_equal(np.asarray(g_dd), np.asarray(g_dp))
    np.testing.assert_allclose(np.asarray(s_dd), np.asarray(s_dp), rtol=1e-5, atol=1e-5)
    t_f, s_f = best_of(g_dd, s_dd)
    t_x, s_x = xla_all_beams(model, params, enc, mask, k, L)
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_x))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x), rtol=2e-5, atol=2e-5)
