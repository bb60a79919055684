"""Unit tests for core ops: RoPE law, attention masking, FFN, convs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telugu_asr_tpu.ops import attention as A
from telugu_asr_tpu.ops import conv as C
from telugu_asr_tpu.ops import mlp as M
from telugu_asr_tpu.ops.norm import layer_norm, layer_norm_init
from telugu_asr_tpu.ops.rope import apply_rope, rope_inv_freq, rope_rot_dim


def reference_rope(x, rot_dim, base=10000.0):
    """Literal numpy transcription of positional_encoding.py:45-86 laws."""
    b, t, h, d = x.shape
    index = np.arange(0, rot_dim, 2, dtype=np.float32)
    inv_freq = 1.0 / np.power(base, index / np.float32(rot_dim))
    pos = np.arange(t, dtype=np.float32)[:, None]
    freq = pos * inv_freq[None, :]  # [T, r/2]
    freq = np.stack([freq, freq], -1).reshape(t, rot_dim)
    cos, sin = np.cos(freq), np.sin(freq)
    head, tail = x[..., :rot_dim], x[..., rot_dim:]
    hr = head.reshape(b, t, h, rot_dim // 2, 2)
    rotated_half = np.stack([-hr[..., 1], hr[..., 0]], -1).reshape(b, t, h, rot_dim)
    rotated = head * cos[None, :, None, :] + rotated_half * sin[None, :, None, :]
    return np.concatenate([tail, rotated], -1)


@pytest.mark.parametrize("head_dim", [32, 48, 64, 96])
def test_rope_matches_reference_law(head_dim):
    rot_dim = rope_rot_dim(head_dim)
    assert rot_dim == max(head_dim // 2, 32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 3, head_dim)).astype(np.float32)
    ours = np.asarray(apply_rope(jnp.asarray(x), jnp.arange(7), jnp.asarray(rope_inv_freq(head_dim)), rot_dim))
    ref = reference_rope(x, rot_dim)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rope_absolute_positions():
    """RoPE with explicit offset positions == slicing a longer sequence."""
    head_dim = 32
    inv_freq = jnp.asarray(rope_inv_freq(head_dim))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 2, head_dim))
    full = apply_rope(x, jnp.arange(10), inv_freq)
    tail = apply_rope(x[:, 7:], jnp.arange(7, 10), inv_freq)
    np.testing.assert_allclose(np.asarray(full[:, 7:]), np.asarray(tail), atol=1e-6)


def test_mha_padding_invariance():
    """Valid positions' outputs must not depend on padded key content."""
    key = jax.random.PRNGKey(1)
    p = A.mha_init(key, 16, 2, 8)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16))
    pad_mask = jnp.array([[True] * 4 + [False] * 2])
    mask = pad_mask[:, None, :, None] & pad_mask[:, None, None, :]
    out1, _ = A.mha_apply(p, x, x, 2, mask=mask)
    x2 = x.at[:, 4:].set(99.0)
    out2, _ = A.mha_apply(p, x2, x2, 2, mask=mask)
    np.testing.assert_allclose(np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), atol=1e-5)


def test_mha_causal():
    """Causal output at position i is unaffected by future tokens."""
    p = A.mha_init(jax.random.PRNGKey(1), 16, 2, 8)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 16))
    cm = A.causal_mask(5, 5)[None, None]
    out1, _ = A.mha_apply(p, x, x, 2, mask=cm)
    x2 = x.at[:, 3:].set(-7.0)
    out2, _ = A.mha_apply(p, x2, x2, 2, mask=cm)
    np.testing.assert_allclose(np.asarray(out1[:, :3]), np.asarray(out2[:, :3]), atol=1e-5)


def test_layer_norm_keras_epsilon():
    p = layer_norm_init(4)
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    out = np.asarray(layer_norm(p, x))
    mean, var = 2.5, 1.25
    expected = (np.array([1, 2, 3, 4]) - mean) / np.sqrt(var + 1e-3)
    np.testing.assert_allclose(out[0], expected, atol=1e-6)


def test_swiglu_halves_width():
    x = jnp.ones((2, 8))
    assert M.swiglu(x).shape == (2, 4)
    p = M.ffn_module_init(jax.random.PRNGKey(0), 16, fc_factor=1, activation="swiglu")
    assert p["dense1"]["kernel"].shape == (16, 16)
    assert p["dense2"]["kernel"].shape == (8, 16)
    out = M.ffn_module_apply(p, jnp.ones((1, 3, 16)), "swiglu")
    assert out.shape == (1, 3, 16)


def test_gelu_exact_not_approximate():
    # Keras default gelu is the exact erf form.
    from scipy.stats import norm as scipy_norm

    x = jnp.asarray([0.5, -1.0, 2.0])
    expected = np.asarray(x) * scipy_norm.cdf(np.asarray(x))
    np.testing.assert_allclose(np.asarray(M.get_activation("gelu")(x)), expected, atol=1e-6)


def test_conv_length_law():
    # math_util.py:20-32
    assert C.get_conv_length(100, 9, "valid", 2) == 46
    assert C.get_conv_length(100, 9, "same", 2) == 50
    lengths = jnp.asarray([100, 50])
    np.testing.assert_array_equal(np.asarray(C.get_conv_length(lengths, 9, "valid", 2)), [46, 21])


def test_conv1d_subsampling_shapes_and_lengths():
    key = jax.random.PRNGKey(0)
    p = C.conv1d_subsampling_init(key, model_dim=32, in_channels=80)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 100, 80))
    lengths = jnp.asarray([100, 60])
    out, out_len = C.conv1d_subsampling_apply(p, x, lengths)
    # valid: 100 -> 46 -> 19 -> 6;  60 -> 26 -> 9 -> 1
    assert out.shape == (2, 6, 32)
    np.testing.assert_array_equal(np.asarray(out_len), [6, 1])


def test_conv1d_subsampling_matches_torch_separable():
    """Cross-check depthwise+pointwise against torch.nn.Conv1d groups=C."""
    import torch

    key = jax.random.PRNGKey(7)
    p = C.conv1d_subsampling_init(key, model_dim=8, in_channels=4, kernel_size=(3,))
    x = np.random.default_rng(0).standard_normal((1, 20, 4)).astype(np.float32)
    out, _ = C.conv1d_subsampling_apply(
        p, jnp.asarray(x), None, kernel_size=(3,), strides=(2,), padding=("valid",), activations=("linear",)
    )
    dw = np.asarray(p["layers"][0]["depthwise"])  # [k, C]
    pw = np.asarray(p["layers"][0]["pointwise"])  # [C, F]
    b = np.asarray(p["layers"][0]["bias"])
    tdw = torch.nn.Conv1d(4, 4, 3, stride=2, groups=4, bias=False)
    tdw.weight.data = torch.from_numpy(dw.T[:, None, :])  # [C,1,k]
    tpw = torch.nn.Conv1d(4, 8, 1, bias=True)
    tpw.weight.data = torch.from_numpy(pw.T[:, :, None])
    tpw.bias.data = torch.from_numpy(b)
    with torch.no_grad():
        ref = tpw(tdw(torch.from_numpy(x.transpose(0, 2, 1)))).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_relmha_shapes():
    p = A.relmha_init(jax.random.PRNGKey(0), 16, 2, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    pos = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    out = A.relmha_apply(p, x, pos, 2)
    assert out.shape == (2, 5, 16)


def test_relative_shift():
    # relative_shift moves element [b,h,i,j] to [b,h,i,j-?] per XL trick:
    # after shift, row i column j holds original column (j + T - 1 - i)? The
    # operational contract we rely on: output[..., i, 0] == input[..., i, T-1-i]
    x = jnp.arange(1 * 1 * 3 * 3, dtype=jnp.float32).reshape(1, 1, 3, 3)
    out = np.asarray(A._relative_shift(x))
    xin = np.asarray(x)
    for i in range(3):
        assert out[0, 0, i, 0] == xin[0, 0, i, 2 - i]


def test_relative_shift_sliced_matches_padded():
    # The restride fast path must be bit-identical to pad→reshape→slice on
    # the Conformer's P = 2T-1 sinusoid stream (and fall back exactly when
    # P is too short for the restride law).
    rng = np.random.default_rng(0)
    for tq, p in [(7, 13), (16, 31), (5, 5), (4, 9)]:
        x = jnp.asarray(rng.standard_normal((2, 3, tq, p)), jnp.float32)
        for tk in (tq, min(tq, p) - 1, 1):
            ref = np.asarray(A._relative_shift(x)[..., :tk])
            got = np.asarray(A._relative_shift_sliced(x, tk))
            np.testing.assert_array_equal(ref, got)


def test_relmha_pos_stream_lengths():
    # relmha must agree between the fast shift (P = 2T-1) law and brute
    # force: logits_v_shifted[n, m] = qv[n]·p[m - n + T - 1].
    d, h, hd, t = 16, 2, 8, 6
    params = A.relmha_init(jax.random.PRNGKey(0), d, h, hd)
    params = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.PRNGKey(a.size), a.shape), params
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, d))
    pos = jax.random.normal(jax.random.PRNGKey(2), (1, 2 * t - 1, d))
    out = A.relmha_apply(params, x, pos, h)

    q = jnp.einsum("bni,hio->bnho", x, params["query_kernel"])
    k = jnp.einsum("bmi,hio->bmho", x, params["key_kernel"])
    v = jnp.einsum("bmi,hio->bmho", x, params["value_kernel"])
    p = jnp.einsum("bmi,hio->bmho", pos, params["pos_kernel"])
    qu = q + params["pos_bias_u"]
    qv = q + params["pos_bias_v"]
    lu = jnp.einsum("bnho,bmho->bhnm", qu, k)
    lv = np.zeros_like(np.asarray(lu))
    for n in range(t):
        for m in range(t):
            lv[:, :, n, m] = np.asarray(
                jnp.einsum("bho,bho->bh", qv[:, n], p[:, m - n + t - 1])
            )
    logits = (np.asarray(lu) + lv) / np.sqrt(hd)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    ref = jnp.einsum("bhnm,bmho->bnho", probs, v)
    ref = jnp.einsum("bnhd,hdo->bno", ref, params["projection_kernel"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5)
