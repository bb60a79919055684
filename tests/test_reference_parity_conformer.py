"""Conformer RNN-T conversion parity against the reference's OWN code
(VERDICT r2 missing #2 — the transducer twin of test_reference_parity.py).

``tools/make_reference_h5.py --family conformer`` instantiates the canonical
reference Keras Conformer transducer by importing ``/root/reference``
verbatim (repairing the SURVEY §8 snapshot breakages: the
``decoder_inference`` tflite kwarg mismatch, the missing
``math_util.get_reduced_length``, and ``recognize``'s unset
``time_reduction_factor`` / ``text_featurizer`` attributes —
reference src/models/conformer/model.py:104-141), saves a genuine
weights-only legacy-Keras ``.h5`` (the reference's ``ModelCheckpoint``
layout, reference src/models/conformer/base_model.py:84-123), and emits
golden forward-logits + per-stage + greedy-transducer-decode artifacts
computed by the reference's own ``Conformer.call`` / ``recognize``
(model.py:80-116, 126-248).

These tests round-trip that h5 through
``tools/convert_reference_checkpoint.convert_conformer`` into our
params + BatchNorm-state pytrees and assert:

* every h5 weight maps (strict mode, zero skipped);
* encoder outputs, prediction-net outputs, and joint logits match the
  reference forward to float32 tolerance;
* greedy transducer decode is TOKEN-IDENTICAL to the reference's nested
  ``tf.while_loop`` decode (model.py:144-248) — both for the padded batch
  and for a shorter single utterance (length law exercised).

Heavy (builds a TF model in a subprocess): marked ``slow``.  The quick lane
covers the same law on every run from a COMMITTED golden —
see test_reference_conversion.py::test_committed_conformer_h5_parity.
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
    """Build the reference conformer h5 + goldens once (TF subprocess)."""
    out_dir = tmp_path_factory.mktemp("ref_conformer")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "make_reference_h5.py"),
            "--family", "conformer",
            "--config", os.path.join(REPO, "config", "conformer.yaml"),
            "--tiny", "--frames", "40",
            "--out-dir", str(out_dir), "--stem", "conf",
        ],
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
    import json

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from convert_reference_checkpoint import convert_conformer

    from telugu_asr_tpu.models.conformer.model import Conformer, ConformerConfig

    golden = np.load(ref_artifacts / "conf_golden.npz")
    model_config = json.loads(str(golden["model_config"]))
    model = Conformer(ConformerConfig.from_model_config(model_config, 240))
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, names, skipped = convert_conformer(
        str(ref_artifacts / "conf.h5"), params, state, strict=True
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    return model, params, state, names, skipped, golden


def test_every_weight_maps_strict(converted):
    _, _, _, names, skipped, _ = converted
    assert skipped == []
    # 2 enc blocks x (10 conv+bn-stats + 9 relmha+ln + 6+6 ff + 2 block-ln)
    # + 6 subsampling + 2 enc linear + 1 embedding + 5 prediction
    # + 8 joint = 90 mapped datasets
    assert len(names) == 90


def test_stage_outputs_match_reference(converted):
    model, params, state, _, _, g = converted
    import jax.numpy as jnp

    from telugu_asr_tpu.models.conformer.decoder import prediction_apply

    enc_out, enc_lengths, _ = model.encode(
        params, state, jnp.asarray(g["features"][..., 0]), jnp.asarray(g["feat_lengths"])
    )
    np.testing.assert_allclose(np.asarray(enc_out), g["encoded"], atol=2e-5)

    pred = prediction_apply(
        params["prediction"], model.cfg.prediction,
        jnp.asarray(g["prediction"]), jnp.asarray(g["pred_lengths"]),
    )
    np.testing.assert_allclose(np.asarray(pred), g["pred_out"], atol=2e-5)


def test_forward_logits_match_reference(converted):
    model, params, state, _, _, g = converted
    import jax.numpy as jnp

    out, _ = model.apply(
        params, state,
        jnp.asarray(g["features"][..., 0]), jnp.asarray(g["feat_lengths"]),
        jnp.asarray(g["prediction"]), jnp.asarray(g["pred_lengths"]),
    )
    logits = np.asarray(out["logits"])
    np.testing.assert_allclose(logits, g["logits"], atol=2e-5)
    assert (logits.argmax(-1) == g["logits"].argmax(-1)).all()


def _assert_transducer_decode_matches(model, params, state, golden_tokens, features, lengths):
    """Reference rows are per-frame tokens padded with blanks to max_len+1
    (math_util.pad_prediction_tfarray, model.py:186); ours are per-frame
    tokens [B, T'].  Compare the valid frames; the reference tail must be
    all-blank."""
    import jax.numpy as jnp

    tokens, enc_lengths = model.recognize(
        params, state, jnp.asarray(features), jnp.asarray(lengths)
    )
    tokens, enc_lengths = np.asarray(tokens), np.asarray(enc_lengths)
    blank = model.cfg.blank_id
    for i, n in enumerate(enc_lengths):
        np.testing.assert_array_equal(tokens[i, :n], golden_tokens[i, :n])
        assert (golden_tokens[i, n:] == blank).all()


def test_greedy_transducer_decode_token_identical(converted):
    model, params, state, _, _, g = converted
    features = g["features"][..., 0]
    lengths = g["feat_lengths"].astype(np.int32)

    # padded batch through the reference's per-utterance while_loop ladder
    _assert_transducer_decode_matches(
        model, params, state, g["decoded_batch"], features, lengths
    )
    # single shorter utterance — exercises the ceil(len/4) length law
    # (reference model.py:141 get_reduced_length == two chained
    # stride-2 get_conv_lengths)
    short = features.shape[1] - 7
    _assert_transducer_decode_matches(
        model, params, state, g["decoded_single"],
        features[-1:, :short], np.array([short], np.int32),
    )


def test_converter_cli_orbax_roundtrip_conformer(ref_artifacts, tmp_path):
    """--family conformer CLI path: h5 → Orbax → restore, exact values.

    The CLI builds the model from the yaml config (flagship shape), so this
    regenerates a FULL-SIZE reference h5 rather than reusing the tiny one.
    """
    import jax

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "make_reference_h5.py"),
            "--family", "conformer",
            "--config", os.path.join(REPO, "config", "conformer.yaml"),
            "--frames", "40",
            "--out-dir", str(tmp_path), "--stem", "conf_full",
        ],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert result.returncode == 0, f"make_reference_h5 failed:\n{result.stderr[-2000:]}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    out = tmp_path / "orbax"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "convert_reference_checkpoint.py"),
            "--family", "conformer",
            "--h5", str(tmp_path / "conf_full.h5"),
            "--config", os.path.join(REPO, "config", "conformer.yaml"),
            "--output", str(out),
            "--strict",
        ],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert result.returncode == 0, f"converter CLI failed:\n{result.stdout}\n{result.stderr}"

    from telugu_asr_tpu.train.checkpoint import CheckpointManager

    restored = CheckpointManager(str(out)).restore_params()
    assert restored is not None
    n_leaves = len(jax.tree_util.tree_leaves(restored))
    assert n_leaves > 50  # full tree restored, not a stub
