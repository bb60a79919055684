"""End-to-end conversion parity against the reference's OWN code (VERDICT r1 #2).

``tools/make_reference_h5.py`` instantiates the canonical reference Keras
Moonshine model by importing ``/root/reference`` verbatim (repairing the
SURVEY §8 snapshot breakages), saves a genuine weights-only ``.h5`` under
legacy Keras 2 (the reference's TF 2.15 ``ModelCheckpoint`` layout,
reference train.py:89), and emits golden forward-logits + greedy-decode
artifacts computed by the reference's own ``ASRModel.call`` /
``recognize`` (reference src/models/moonshine/model.py:84-98, 231-250).

These tests round-trip that h5 through ``tools/convert_reference_checkpoint.py``
into our param pytree and assert:

* every h5 weight maps (strict mode, zero skipped) — de-risks the converter's
  name hierarchy against the real Keras layout;
* softmax outputs match the reference forward to float32 tolerance on a
  padded batch (mask laws exercised);
* greedy decode is TOKEN-IDENTICAL to the reference's ``tf.while_loop``
  decode for (a) a single utterance under the duration-derived cap
  (model.py:233-234), (b) an explicit short cap, and (c) the full padded
  batch through ``_perform_greedy_batch`` (model.py:120-163).

Heavy (builds a TF model in a subprocess): marked ``slow``.
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "src")),
        reason="reference tree not available",
    ),
    pytest.mark.skipif(
        importlib.util.find_spec("tensorflow") is None
        or importlib.util.find_spec("tf_keras") is None,
        reason="tensorflow/tf_keras not available",
    ),
]


@pytest.fixture(scope="module")
def ref_artifacts(tmp_path_factory):
    """Build the reference h5 + goldens once (subprocess: legacy-Keras env)."""
    out_dir = tmp_path_factory.mktemp("ref_artifacts")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the tool never imports jax; keep TF clean
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_reference_h5.py"), "--out-dir", str(out_dir)],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert result.returncode == 0, f"make_reference_h5 failed:\n{result.stdout}\n{result.stderr}"
    return out_dir


@pytest.fixture(scope="module")
def converted(ref_artifacts):
    import jax

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from convert_reference_checkpoint import convert

    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.text import make_default_tokenizer

    config = load_config(os.path.join(REPO, "config", "model.yaml"))
    tokenizer = make_default_tokenizer()
    model = ASRModel(MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size))
    params = model.init(jax.random.PRNGKey(0))
    params, names, skipped = convert(str(ref_artifacts / "reference.h5"), params, strict=True)
    golden = np.load(ref_artifacts / "reference_golden.npz")
    return model, params, names, skipped, golden


def test_every_weight_maps_strict(converted):
    _, _, names, skipped, _ = converted
    assert skipped == []
    # 4 enc blocks x (5 mhsa + 2 ln + 6 ffn) + 6 dec blocks x (13 + 7 cross)
    # + 9 subsampling + 2 classifier + 1 embedding = 184
    assert len(names) == 184


def test_forward_probs_match_reference(converted):
    model, params, _, _, g = converted
    features = g["features"][..., 0]
    probs = np.asarray(
        model.apply(params, features, g["feat_lengths"].astype(np.int32), g["text"], probs=True)
    )
    np.testing.assert_allclose(probs, g["logits"], atol=2e-5)
    assert (probs.argmax(-1) == g["logits"].argmax(-1)).all()


def test_greedy_decode_token_identical(converted):
    from telugu_asr_tpu.decode.greedy import recognize

    model, params, _, _, g = converted
    features = g["features"][..., 0]
    feat_lengths = g["feat_lengths"].astype(np.int32)

    # (a) single utterance, duration-derived cap (reference model.py:233-234)
    single, sl = features[-1:], feat_lengths[-1:]
    tokens = np.asarray(recognize(model, params, single, sl, parity_unmasked_cross=True))
    np.testing.assert_array_equal(tokens, g["decoded_single"])

    # (b) explicit short cap — max_length stop semantics
    tokens = np.asarray(
        recognize(model, params, single, sl, model_max_length=6, parity_unmasked_cross=True)
    )
    np.testing.assert_array_equal(tokens, g["decoded_cap"])

    # (c) padded batch through the reference's batched while_loop path
    tokens = np.asarray(recognize(model, params, features, feat_lengths, parity_unmasked_cross=True))
    np.testing.assert_array_equal(tokens, g["decoded_batch"])


def test_converter_cli_orbax_roundtrip(converted, ref_artifacts, tmp_path):
    """The CLI writes an Orbax checkpoint that restores to the same pytree."""
    import jax

    model, params, _, _, _ = converted
    out = tmp_path / "orbax"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "convert_reference_checkpoint.py"),
            "--h5", str(ref_artifacts / "reference.h5"),
            "--config", os.path.join(REPO, "config", "model.yaml"),
            "--output", str(out),
            "--strict",
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert result.returncode == 0, f"converter CLI failed:\n{result.stdout}\n{result.stderr}"

    from telugu_asr_tpu.train.checkpoint import CheckpointManager

    restored_params = CheckpointManager(str(out)).restore_params()
    flat_a = jax.tree_util.tree_leaves(restored_params)
    flat_b = jax.tree_util.tree_leaves(params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
