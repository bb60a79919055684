"""Reference .h5 → pytree converter: round-trip on a synthetic Keras-style h5."""
import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_reference_checkpoint import classify, convert  # noqa: E402

from telugu_asr_tpu.models.moonshine.model import ASRModel  # noqa: E402
from tests.test_moonshine import tiny_config  # noqa: E402

h5py = pytest.importorskip("h5py")


def build_synthetic_h5(path, params):
    """Write an h5 whose names follow the reference's Keras layer hierarchy
    and whose values are perturbed copies of ``params``."""
    rng = np.random.default_rng(0)

    def noisy(x):
        return np.asarray(x) + rng.standard_normal(np.shape(x)).astype(np.float32) * 0.01

    with h5py.File(path, "w") as f:
        f["asrmodel/text_embedding/embeddings:0"] = noisy(params["text_embedding"]["table"])
        f["asrmodel/classifier/kernel:0"] = noisy(params["classifier"]["kernel"])
        f["asrmodel/classifier/bias:0"] = noisy(params["classifier"]["bias"])
        for i, layer in enumerate(params["encoder"]["subsampling"]["layers"]):
            base = f"asr_encoder/asr_encoder_conv_subsampling/conv_{i+1}"
            f[f"{base}/depthwise_kernel:0"] = noisy(layer["depthwise"])[..., None]
            f[f"{base}/pointwise_kernel:0"] = noisy(layer["pointwise"])[None]
            f[f"{base}/bias:0"] = noisy(layer["bias"])
        for i, block in enumerate(params["encoder"]["blocks"]):
            base = f"asr_encoder/asr_encoder_block_{i+1}"
            mhsa = f"{base}_mhsa_module"
            for key in ("query_kernel", "key_kernel", "value_kernel", "projection_kernel"):
                f[f"{mhsa}/multi_head_attention/{key}:0"] = noisy(block["mhsa"]["mha"][key])
            f[f"{mhsa}/mhsa_module_ln/gamma:0"] = noisy(block["mhsa"]["ln"]["gamma"])
            f[f"{mhsa}/mhsa_module_ln/beta:0"] = noisy(block["mhsa"]["ln"]["beta"])
            ffn = f"{base}_ffn"
            f[f"{ffn}/{os.path.basename(ffn)}_dense1/kernel:0"] = noisy(block["ffn"]["dense1"]["kernel"])
            f[f"{ffn}/{os.path.basename(ffn)}_dense1/bias:0"] = noisy(block["ffn"]["dense1"]["bias"])
            f[f"{ffn}/{os.path.basename(ffn)}_dense2/kernel:0"] = noisy(block["ffn"]["dense2"]["kernel"])
            f[f"{ffn}/{os.path.basename(ffn)}_dense2/bias:0"] = noisy(block["ffn"]["dense2"]["bias"])
            f[f"{ffn}/{os.path.basename(ffn)}_ln/gamma:0"] = noisy(block["ffn"]["ln"]["gamma"])
            f[f"{ffn}/{os.path.basename(ffn)}_ln/beta:0"] = noisy(block["ffn"]["ln"]["beta"])
        for i, block in enumerate(params["decoder"]["blocks"]):
            base = f"asr_decoder/asr_decoder_block_{i+1}"
            m = f"{base}_masked_mhsa"
            for key in ("query_kernel", "key_kernel", "value_kernel", "projection_kernel"):
                f[f"{m}/mha/{key}:0"] = noisy(block["masked_mhsa"]["mha"][key])
            f[f"{m}/ln/gamma:0"] = noisy(block["masked_mhsa"]["ln"]["gamma"])
            f[f"{m}/ln/beta:0"] = noisy(block["masked_mhsa"]["ln"]["beta"])
            c = f"{base}_cross_attention"
            for key in ("query_kernel", "key_kernel", "value_kernel", "projection_kernel"):
                f[f"{c}/mha/{key}:0"] = noisy(block["cross_attention"]["mha"][key])
            f[f"{c}/ln/gamma:0"] = noisy(block["cross_attention"]["ln"]["gamma"])
            f[f"{c}/ln/beta:0"] = noisy(block["cross_attention"]["ln"]["beta"])
            ffn = f"{base}_ffn"
            f[f"{ffn}/dense1/kernel:0"] = noisy(block["ffn"]["dense1"]["kernel"])
            f[f"{ffn}/dense1/bias:0"] = noisy(block["ffn"]["dense1"]["bias"])
            f[f"{ffn}/dense2/kernel:0"] = noisy(block["ffn"]["dense2"]["kernel"])
            f[f"{ffn}/dense2/bias:0"] = noisy(block["ffn"]["dense2"]["bias"])
            f[f"{ffn}/ln/gamma:0"] = noisy(block["ffn"]["ln"]["gamma"])
            f[f"{ffn}/ln/beta:0"] = noisy(block["ffn"]["ln"]["beta"])


def test_classify_paths():
    assert classify("asrmodel/text_embedding/embeddings:0") == ("text_embedding", "table")
    assert classify(
        "asr_encoder/asr_encoder_conv_subsampling/conv_2/pointwise_kernel:0"
    ) == ("encoder", "subsampling", "layers", 1, "pointwise")
    assert classify(
        "asr_decoder/asr_decoder_block_3_cross_attention/mha/query_kernel:0"
    ) == ("decoder", "blocks", 2, "cross_attention", "mha", "query_kernel")
    assert classify("something/unrelated:0") is None


def test_convert_roundtrip(tmp_path):
    model = ASRModel(tiny_config())
    params = model.init(jax.random.PRNGKey(0))
    h5_path = str(tmp_path / "ref.h5")
    build_synthetic_h5(h5_path, params)

    new_params, converted, skipped = convert(h5_path, params)
    assert len(converted) > 40
    # every converted leaf actually changed (noise was added)
    assert not np.allclose(
        np.asarray(new_params["classifier"]["kernel"]),
        np.asarray(params["classifier"]["kernel"]),
    )
    # shapes all match the model — forward runs
    import jax.numpy as jnp

    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 80, 8))
    logits = model.apply(
        jax.tree_util.tree_map(jnp.asarray, new_params),
        feats, jnp.asarray([80]), jnp.asarray([[0, 5, 6]]),
    )
    assert logits.shape == (1, 3, 32)


def test_shape_mismatch_raises(tmp_path):
    model = ASRModel(tiny_config())
    params = model.init(jax.random.PRNGKey(0))
    h5_path = str(tmp_path / "bad.h5")
    with h5py.File(h5_path, "w") as f:
        f["asrmodel/classifier/kernel:0"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert(h5_path, params)
