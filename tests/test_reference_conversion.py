"""QUICK-lane converter parity against a COMMITTED genuine reference-Keras h5.

tests/test_reference_parity.py proves conversion parity by rebuilding the
reference's own TF/Keras model live (slow lane, needs TensorFlow).  This file
covers the same law on every suite run without TF: the committed
``tests/golden/reference_tiny.h5`` is a real legacy-Keras ``save_weights``
artifact (the reference's ``ModelCheckpoint`` format, reference train.py:89)
minted by ``tools/make_reference_h5.py --tiny --stem reference_tiny``, and
``reference_tiny_golden.npz`` holds the softmax outputs + greedy decodes the
reference's own code produced on the committed inputs.

Asserts: zero-skip strict conversion, forward softmax parity, and
token-identical greedy decode through all three reference decode paths
(duration cap / explicit cap / padded batch — reference model.py:120-250).
Regenerate with:
    python tools/make_reference_h5.py --out-dir tests/golden --tiny \
        --stem reference_tiny
"""
from __future__ import annotations

import json
import os

import numpy as np

import jax

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_committed_reference_h5_zero_skip_and_token_identical():
    from telugu_asr_tpu.decode.greedy import recognize
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.text import make_default_tokenizer
    from tools.convert_reference_checkpoint import convert

    g = np.load(os.path.join(GOLDEN, "reference_tiny_golden.npz"))
    model_config = json.loads(str(g["model_config"]))
    tokenizer = make_default_tokenizer()

    model = ASRModel(MoonshineConfig.from_model_config(model_config, tokenizer.vocab_size))
    params = model.init(jax.random.PRNGKey(0))
    params, converted, skipped = convert(
        os.path.join(GOLDEN, "reference_tiny.h5"), params, strict=True
    )
    assert skipped == []
    # 2 enc blocks x 13 + 2 dec blocks x 20 + 9 subsampling + 2 classifier
    # + 1 embedding = 78 mapped datasets (80 h5 weights incl. 2 shared rope
    # tables deduplicated by name classification)
    assert len(converted) == 78

    features = g["features"][..., 0]
    feat_lengths = g["feat_lengths"].astype(np.int32)

    probs = np.asarray(
        model.apply(params, features, feat_lengths, g["text"], probs=True)
    )
    np.testing.assert_allclose(probs, g["logits"], atol=2e-5)

    single, sl = features[-1:], feat_lengths[-1:]
    tokens = np.asarray(recognize(model, params, single, sl, parity_unmasked_cross=True))
    np.testing.assert_array_equal(tokens, g["decoded_single"])

    tokens = np.asarray(
        recognize(model, params, single, sl, model_max_length=6, parity_unmasked_cross=True)
    )
    np.testing.assert_array_equal(tokens, g["decoded_cap"])

    tokens = np.asarray(
        recognize(model, params, features, feat_lengths, parity_unmasked_cross=True)
    )
    np.testing.assert_array_equal(tokens, g["decoded_batch"])


def test_committed_conformer_h5_parity():
    """Conformer RNN-T twin: the committed
    ``tests/golden/reference_conformer_tiny.h5`` is a real legacy-Keras
    artifact of the canonical reference Conformer transducer
    (reference src/models/conformer/base_model.py:84-123 save layout), with
    goldens from the reference's own forward + nested-while-loop greedy
    decode (model.py:80-116, 126-248).  Regenerate with:
        python tools/make_reference_h5.py --family conformer \
            --config config/conformer.yaml --tiny --frames 40 \
            --out-dir tests/golden --stem reference_conformer_tiny
    """
    import jax.numpy as jnp

    from telugu_asr_tpu.models.conformer.decoder import prediction_apply
    from telugu_asr_tpu.models.conformer.model import Conformer, ConformerConfig
    from tools.convert_reference_checkpoint import convert_conformer

    g = np.load(os.path.join(GOLDEN, "reference_conformer_tiny_golden.npz"))
    model_config = json.loads(str(g["model_config"]))

    model = Conformer(ConformerConfig.from_model_config(model_config, 240))
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, converted, skipped = convert_conformer(
        os.path.join(GOLDEN, "reference_conformer_tiny.h5"), params, state, strict=True
    )
    assert skipped == []
    # 2 enc blocks x (10 conv+bn + 9 relmha+ln + 12 ff + 2 ln) + 6 subsampling
    # + 2 linear + 1 embedding + 5 prediction + 8 joint = 90
    assert len(converted) == 90
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)

    features = g["features"][..., 0]
    lengths = g["feat_lengths"].astype(np.int32)

    # stage parity: encoder, prediction net, then full joint logits
    enc_out, _, _ = model.encode(params, state, jnp.asarray(features), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(enc_out), g["encoded"], atol=2e-5)
    pred = prediction_apply(
        params["prediction"], model.cfg.prediction,
        jnp.asarray(g["prediction"]), jnp.asarray(g["pred_lengths"]),
    )
    np.testing.assert_allclose(np.asarray(pred), g["pred_out"], atol=2e-5)
    out, _ = model.apply(
        params, state, jnp.asarray(features), jnp.asarray(lengths),
        jnp.asarray(g["prediction"]), jnp.asarray(g["pred_lengths"]),
    )
    logits = np.asarray(out["logits"])
    np.testing.assert_allclose(logits, g["logits"], atol=2e-5)
    assert (logits.argmax(-1) == g["logits"].argmax(-1)).all()

    # token-identical greedy transducer decode (reference rows are per-frame
    # tokens blank-padded to max_len+1 by pad_prediction_tfarray)
    def check(golden_tokens, feats, lens):
        tokens, enc_lengths = model.recognize(
            params, state, jnp.asarray(feats), jnp.asarray(lens)
        )
        tokens, enc_lengths = np.asarray(tokens), np.asarray(enc_lengths)
        for i, n in enumerate(enc_lengths):
            np.testing.assert_array_equal(tokens[i, :n], golden_tokens[i, :n])
            assert (golden_tokens[i, n:] == model.cfg.blank_id).all()

    check(g["decoded_batch"], features, lengths)
    short = features.shape[1] - 7
    check(g["decoded_single"], features[-1:, :short], np.array([short], np.int32))
